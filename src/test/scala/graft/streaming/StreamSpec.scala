package graft.streaming

import graft.pipeline.TokenTable
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Streaming-equals-batch contract for incremental sketch maintenance. */
class StreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("foreachBatch incremental OR-merge reproduces one-shot batch sketches exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("streamspec")
    val in = tmp.resolve("in").toString
    TokenTable.load(spark, "/root/testdata/sf0.001")
      .repartition(8).write.mode("overwrite").parquet(in)
    val streamed = SketchStream.runIncremental(spark, in, tmp.resolve("cp").toString)
    val cmp = SketchStream.compareToBatch(spark, in, streamed).collect()
    assert(cmp.length == 20, "one row per source")
    cmp.foreach { r =>
      assert(r.getLong(1) > 1, "must have processed multiple micro-batches")
      assert(r.getBoolean(2), s"row count mismatch for ${r.getString(0)}")
      assert(r.getBoolean(3), s"bloom estimate mismatch for ${r.getString(0)}")
      assert(r.getBoolean(4), s"hll estimate mismatch for ${r.getString(0)}")
    }
  }
}
