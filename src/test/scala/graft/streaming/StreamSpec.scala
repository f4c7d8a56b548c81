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

  test("changelog sink is idempotent per batch id (foreachBatch retry cannot duplicate rows)") {
    import spark.implicits._
    val sink = java.nio.file.Files.createTempDirectory("sinkidem").resolve("out").toString
    val b0 = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    StreamSinks.seed(spark, b0.schema, sink)
    StreamSinks.appendBatch(b0, 0L, sink)
    StreamSinks.appendBatch(b0, 0L, sink) // the retry: same id, rewritten
    StreamSinks.appendBatch(Seq(("c", 3L)).toDF("k", "v"), 1L, sink)
    val rows = StreamSinks.readAppend(spark, sink).collect()
    assert(rows.length == 3, s"retried batch must not duplicate: ${rows.mkString(",")}")
    // update-mode compaction: the same key re-emitted in a later batch wins
    StreamSinks.appendBatch(Seq(("a", 9L)).toDF("k", "v"), 2L, sink)
    val latest = StreamSinks.readLatestByKey(spark, sink, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(latest == Map("a" -> 9L, "b" -> 2L, "c" -> 3L))
  }

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
