package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Operator-level plan capture for the round-6 optimization evidence
  * (gate-level plans truncate at eager stage checkpoints, so the
  * interesting expression trees live in the OPERATOR frames):
  * `runMain graft.PlanDump <outDir>` writes one formatted plan per
  * entry below. Not part of the driver contract. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get(args.headOption.getOrElse("/tmp/plandump"))
    java.nio.file.Files.createDirectories(out)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val frames: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "op_lm_rare_bigram_score" -> (() =>
        graft.pipeline.LmFilter.rareBigramScore(docs, "src0")),
      "op_ngram_jaccard_capped" -> (() =>
        graft.pipeline.Dedup.ngramJaccardPairs(docs, 3, 0.5, maxShingleDocs = 20)),
      "op_minhash_lsh_pairs" -> (() =>
        graft.pipeline.Dedup.minhashLshPairs(docs, 128, 32, 0.5)),
      "op_bm25" -> (() => graft.pipeline.Retrieval.bm25(docs,
        docs.filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("q_id"),
            slice(graft.pipeline.TextFunctions.words(col("text")), 1, 8).as("terms")),
        k = 10)),
      "op_quality" -> (() => graft.pipeline.TextOps.quality(docs)))
    frames.foreach { case (name, f) =>
      val plan = f().queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(out.resolve(s"$name.txt"), plan)
      println(s"[plandump] $name")
    }
    spark.stop()
  }
}
