package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Streaming exact deduplication — the always-on form of
 * [[graft.pipeline.Dedup.exactDedup]]: a file stream of documents,
 * `dropDuplicates` on the content digest, append-mode output of the
 * FIRST-ARRIVED row of each clique. Replaying the corpus in doc_id
 * order makes first-arrived == lowest doc_id, i.e. the batch
 * operator's keep rule — asserted by the gate query.
 *
 * State is one row per DISTINCT digest (bounded by unique content,
 * not rows). At 10^12 sequences the state store would be a keyed
 * external table (the same seam as SketchStream's foreachBatch
 * merge); watermarked `dropDuplicatesWithinWatermark` bounds state
 * when near-time duplicates are the target.
 */
object StreamDedup {

  /** Drain `inDir` as a stream, dedup by md5(text); returns
    * (fp, doc_id, n_batches) of kept rows. */
  def dedupExact(spark: SparkSession, inDir: String, checkpointDir: String,
                 maxFilesPerTrigger: Int = 2): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(inDir).schema
    val kept = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)

    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inDir)
      .select(md5(col("text")).as("fp"), col("doc_id").cast("long").as("doc_id"))
      .dropDuplicates("fp")

    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batches.incrementAndGet()
        batch.collect().foreach(r => kept.add((r.getString(0), r.getLong(1))))
      }
      .start()
    q.awaitTermination()

    import scala.jdk.CollectionConverters._
    kept.asScala.toSeq.toDF("fp", "doc_id")
      .withColumn("n_batches", lit(batches.get()))
  }
}
