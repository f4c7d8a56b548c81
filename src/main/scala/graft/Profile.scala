package graft

import graft.agg.GraftFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract).
  * `runMain graft.Profile check` dissects the bench check phase. */
object Profile {

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.headOption.getOrElse("check") match {
      case "check" => profileCheck(spark)
      case other => println(s"unknown mode $other")
    }
    spark.stop()
  }

  private def profileCheck(spark: SparkSession): Unit = {
    val n = 4000000L
    def keyDf(parts: Int) = spark.range(0, n, 1, parts)
      .select(concat(lit("key"), col("id")).as("k"))

    // the bench's grown SBF: 4M keys into init-cap 100k ladder
    val bigBlob = keyDf(256).agg(sbf_agg(col("k"), 100000L, 1e-4, 4, 0.9).as("s"))
      .head().getAs[Array[Byte]]("s")
    println(s"[prof] grown SBF blob: ${bigBlob.length / 1024 / 1024} MiB, " +
      s"layers=${graft.sketch.ScalableBloom.deserialize(bigBlob).numLayers}")
    // a right-sized SBF (cap = n): single layer, same key count
    val rightBlob = keyDf(256).agg(sbf_agg(col("k"), n, 1e-4, 4, 0.9).as("s"))
      .head().getAs[Array[Byte]]("s")
    println(s"[prof] right-sized blob: ${rightBlob.length / 1024 / 1024} MiB, " +
      s"layers=${graft.sketch.ScalableBloom.deserialize(rightBlob).numLayers}")

    def probe(blob: Array[Byte], parts: Int): Unit = keyDf(parts)
      .select(sbf_contains(lit(blob), col("k")).as("hit"))
      .write.format("noop").mode("overwrite").save()

    // single-thread structure ceiling (no Spark): contains() per key
    val sk = graft.sketch.ScalableBloom.deserialize(bigBlob)
    val m = 1000000
    val tLocal = timed {
      var i = 0
      while (i < m) {
        sk.contains(s"key$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        i += 1
      }
    }
    println(f"[prof] single-thread contains: ${m / tLocal / 1e6}%.2f M keys/s")

    for ((label, blob, parts) <- Seq(
        ("grown/256parts", bigBlob, 256),
        ("grown/32parts", bigBlob, 32),
        ("right-sized/256parts", rightBlob, 256),
        ("right-sized/32parts", rightBlob, 32))) {
      probe(blob, parts) // warm
      val t = (1 to 3).map(_ => timed(probe(blob, parts))).min
      println(f"[prof] $label%-22s ${t}%.2f s  ${n / t / 1e6}%.2f M keys/s")
    }

    // key generation cost alone (scan + concat, no probe)
    val tGen = (1 to 3).map(_ => timed {
      keyDf(256).select(length(col("k")).as("l"))
        .write.format("noop").mode("overwrite").save()
    }).min
    println(f"[prof] keygen only: ${tGen}%.2f s  ${n / tGen / 1e6}%.2f M keys/s")
  }
}
