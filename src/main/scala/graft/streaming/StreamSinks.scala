package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed result sinks for the always-on streaming operators.
 *
 * The reference daemon runs forever and serves its state in place
 * (`csrc/bloomd/background.c` keeps filters current on disk); the
 * Spark-native analog is a streaming query whose foreachBatch APPENDS
 * each micro-batch to a parquet changelog directory — executors write
 * their own partitions, nothing is collected to the driver — and whose
 * result is a READ of that directory. For update-mode streams (upsert
 * per key per batch) the changelog is compacted on read with a
 * last-writer-wins window over the recorded batch id: exactly the
 * changelog-table + compaction-view pattern a lakehouse MERGE would
 * give us (parquet stands in for the table format here, same seam as
 * [[graft.catalog.SketchTableIO]]).
 */
object StreamSinks {

  /** foreachBatch body: write the micro-batch into its OWN partition
    * directory (`batch_id=N`), mode overwrite — a distributed write,
    * never a driver collect, and IDEMPOTENT per batch id: Structured
    * Streaming's exactly-once contract for foreachBatch requires the
    * sink write to be idempotent on (batchId) because a failed batch
    * is re-run with the same id — a plain append would duplicate the
    * retried batch's rows, an overwrite of the batch's directory
    * cannot. `batch_id` resurfaces on read as the inferred partition
    * column. */
  def appendBatch(batch: DataFrame, batchId: Long, sinkDir: String): Unit =
    batch.write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")

  /** Seed the changelog with a zero-row file carrying the schema, so
    * reading the sink is well-defined even when every batch is empty. */
  def seed(spark: SparkSession, schema: org.apache.spark.sql.types.StructType,
           sinkDir: String): Unit =
    spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
      .coalesce(1).write.mode("overwrite").parquet(s"$sinkDir/batch_id=-1")

  /** Append-mode result: each row was emitted exactly once. */
  def readAppend(spark: SparkSession, sinkDir: String): DataFrame =
    spark.read.parquet(sinkDir).drop("batch_id")

  /** Update-mode result: compact the changelog to the LAST emission
    * per key (upsert semantics). Within one batch a key appears at
    * most once (it's a groupBy/state output), so batch_id is a total
    * order per key. */
  def readLatestByKey(spark: SparkSession, sinkDir: String, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("batch_id").desc)
    spark.read.parquet(sinkDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "batch_id")
  }
}
