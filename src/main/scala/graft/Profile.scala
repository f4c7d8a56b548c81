package graft

import graft.pipeline.{Dedup, TextFunctions}
import graft.pipeline.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val fp = docs.select(col("doc_id").cast("long").as("id"),
      simhash64(shingles(words(col("text")), 3)).as("f"))
    // true near-dup pairs (exact jaccard >= 0.5)
    val truth = Dedup.ngramJaccardPairs(docs, 3, 0.5)
    val withF = truth
      .join(fp.select(col("id").as("id_a"), col("f").as("fa")), Seq("id_a"))
      .join(fp.select(col("id").as("id_b"), col("f").as("fb")), Seq("id_b"))
      .select(expr("bit_count(fa ^ fb)").as("h"))
    println("[prof] planted-pair hamming histogram:")
    withF.groupBy("h").count().orderBy("h").collect().foreach(r => println(s"[prof]   h=${r.get(0)} n=${r.get(1)}"))
    // global random-pair hamming quantiles (sample)
    val s1 = fp.filter(col("id") % 37 === 0).select(col("id").as("id_a"), col("f").as("fa"))
    val s2 = fp.filter(col("id") % 41 === 0).select(col("id").as("id_b"), col("f").as("fb"))
    val rand = s1.crossJoin(s2).filter(col("id_a") < col("id_b"))
      .select(expr("bit_count(fa ^ fb)").as("h"))
    println("[prof] random-pair hamming quantiles (1,5,10,25,50%):")
    println("[prof]   " + rand.stat.approxQuantile("h", Array(0.01,0.05,0.10,0.25,0.5), 0.001).mkString(", "))
    spark.stop()
  }
}
