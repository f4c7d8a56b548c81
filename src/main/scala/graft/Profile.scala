package graft

import graft.pipeline.Ann
import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/sf$sf/embeddings.parquet")
      val out = Ann.ivfTopK(emb, 10, 10, recallFloor = 0.0).collect()
      println(s"[prof] sf$sf ivf recall_ok(floor=0): ${out.count(_.getBoolean(1))}/${out.length}")
      // measure actual recall by lowering floor progressively
      for (floor <- Seq(0.1, 0.3, 0.5)) {
        val o = Ann.ivfTopK(emb, 10, 10, recallFloor = floor).collect()
        println(s"[prof] sf$sf floor=$floor ok=${o.count(_.getBoolean(1))}/${o.length}")
      }
    }
    spark.stop()
  }
}
