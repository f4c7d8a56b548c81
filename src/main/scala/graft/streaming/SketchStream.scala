package graft.streaming

import graft.agg.GraftFunctions._
import graft.sketch.{BloomFilter, Hll}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Incremental sketch maintenance with Structured Streaming — the
 * Spark analog of the reference daemon's always-on updater with
 * periodic flush (`csrc/bloomd/background.c:100-139`): each
 * micro-batch builds PARTIAL per-group sketches with the same
 * Catalyst aggregates the batch path uses, and foreachBatch
 * OR-merges them into the running sketch state (bloomd's
 * flush-interval write-back). Because the sketches are mergeable and
 * commutative, the streaming result is IDENTICAL to a one-shot batch
 * aggregation over the same rows — asserted by compareToBatch.
 *
 * State is catalog-sized (one sketch row per group), never
 * row-sized: at 10^12 sequences the merge target is a sketch table
 * (Delta/Iceberg MERGE in production; an in-memory map here), not
 * per-key state, so checkpoint size is independent of data volume.
 */
object SketchStream {

  /** Running state: source -> (bloom bytes, hll bytes, rows seen). */
  final class SketchState {
    val groups = new java.util.concurrent.ConcurrentHashMap[String, (Array[Byte], Array[Byte], Long)]()
    var batches: Long = 0L

    def mergeBatch(rows: Seq[(String, Array[Byte], Array[Byte], Long)]): Unit = synchronized {
      batches += 1
      rows.foreach { case (src, bloomBytes, hllBytes, n) =>
        groups.compute(src, (_, prev) =>
          if (prev == null) (bloomBytes, hllBytes, n)
          else {
            val bloom = BloomFilter.deserialize(prev._1)
              .orInPlace(BloomFilter.deserialize(bloomBytes))
            val hll = Hll.deserialize(prev._2).merge(Hll.deserialize(hllBytes))
            (bloom.serialize(), hll.serialize(), prev._3 + n)
          })
      }
    }
  }

  /**
   * Streams the parquet files under `inDir` (schema`d file source,
   * `maxFilesPerTrigger` files per micro-batch, AvailableNow so the
   * run drains and terminates), building per-source token sketches
   * incrementally. Returns the final merged state as a DataFrame
   * (source, bloom, hll, n_rows, n_batches).
   */
  /** shared scaffolding: token-exploded file stream drained with
    * AvailableNow through the given per-batch body */
  private def drainTokenStream(spark: SparkSession, inDir: String,
                               checkpointDir: String, maxFilesPerTrigger: Int)(
      body: (DataFrame, Long) => Unit): Unit = {
    val schema = spark.read.parquet(inDir).schema
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inDir)
      .select(col("source"), explode(col("tokens")).as("token"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) => body(batch, id) }
      .start()
    q.awaitTermination()
  }

  /** Like [[drainTokenStream]] but at document granularity
    * (doc_id, n_tok, source) — for per-doc scored aggregates. */
  private def drainDocStream(spark: SparkSession, inDir: String,
                             checkpointDir: String, maxFilesPerTrigger: Int)(
      body: (DataFrame, Long) => Unit): Unit = {
    val schema = spark.read.parquet(inDir).schema
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inDir)
      .select(col("doc_id"), col("n_tok"), col("source"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) => body(batch, id) }
      .start()
    q.awaitTermination()
  }

  /**
   * Always-on exact top-k over the stream: per micro-batch TopK
   * partials (k rows per source per batch reach the driver) merged
   * into k-row running state. TopK's merge is EXACT under any batch
   * boundaries, so unlike the heavy-hitter CONTRACT gate the drained
   * state must equal the one-shot batch answer row for row — the
   * gate emits the ranked rows themselves and DuckDB replays them
   * with a row_number() window.
   */
  def runIncrementalTopK(spark: SparkSession, inDir: String, checkpointDir: String,
                         k: Int = 3, maxFilesPerTrigger: Int = 2): DataFrame = {
    import spark.implicits._
    val state = new java.util.concurrent.ConcurrentHashMap[String, graft.sketch.TopK]()
    var batches = 0L
    drainDocStream(spark, inDir, checkpointDir, maxFilesPerTrigger) { (batch, _) =>
      val partials = batch.groupBy("source")
        .agg(topk_agg(col("n_tok"), col("doc_id"), k).as("tk"))
        .collect()
        .map(r => (r.getString(0), r.getAs[Array[Byte]](1)))
      state.synchronized {
        batches += 1
        partials.foreach { case (src, bytes) =>
          val part = graft.sketch.TopK.deserialize(bytes)
          state.compute(src, (_, prev) => if (prev == null) part else prev.merge(part))
        }
      }
    }
    import scala.jdk.CollectionConverters._
    val rows = state.asScala.toSeq.flatMap { case (src, tk) =>
      tk.result.zipWithIndex.map { case ((score, item), i) => (src, i + 1, score, item) }
    }
    rows.toDF("source", "rank", "n_tok", "doc_id")
      .withColumn("multi_batch_ok", lit(batches > 1))
  }

  def runIncremental(spark: SparkSession, inDir: String, checkpointDir: String,
                     capacity: Long = 100000L, fpProb: Double = 1e-4,
                     maxFilesPerTrigger: Int = 2): DataFrame = {
    import spark.implicits._
    val state = new SketchState
    drainTokenStream(spark, inDir, checkpointDir, maxFilesPerTrigger) { (batch, _) =>
      val partials = batch.groupBy("source")
        .agg(
          bloom_agg(col("token").cast("string"), capacity, fpProb).as("bloom"),
          hll_agg(col("token").cast("string"), 14).as("hll"),
          count(lit(1)).as("n"))
        .collect() // one small row per group: the sketch "flush"
        .map(r => (r.getString(0), r.getAs[Array[Byte]](1), r.getAs[Array[Byte]](2), r.getLong(3)))
        .toSeq
      state.mergeBatch(partials)
    }
    import scala.jdk.CollectionConverters._
    val rows = state.groups.asScala.toSeq.map { case (src, (b, h, n)) => (src, b, h, n) }
    rows.toDF("source", "bloom", "hll", "n_rows")
      .withColumn("n_batches", lit(state.batches))
  }

  /**
   * The PRODUCTION shape of the always-on updater: every micro-batch
   * builds partial sketches, merges them with the current snapshot of
   * a versioned sketch table ENTIRELY as a distributed job (union ->
   * merge aggregates — no driver collect anywhere), and commits the
   * result as a new immutable version. The table is the durable state
   * (the daemon's data_dir with time travel): each commit is a
   * consistent point-in-time view, and the lineage of `batch_id`
   * metrics makes retried micro-batches idempotent — a batch whose id
   * is already recorded in the latest manifest is skipped, which is
   * the foreachBatch exactly-once contract over a versioned table
   * (Iceberg/Delta MERGE in production, [[graft.catalog.SketchTableIO]]
   * here).
   *
   * Returns the FINAL snapshot (source, bloom, hll, n_rows,
   * n_batches); history stays queryable via `io.read(version)`.
   */
  def runIncrementalToTable(spark: SparkSession, inDir: String, checkpointDir: String,
                            io: graft.catalog.SketchTableIO,
                            capacity: Long = 100000L, fpProb: Double = 1e-4,
                            maxFilesPerTrigger: Int = 2): DataFrame = {
    drainTokenStream(spark, inDir, checkpointDir, maxFilesPerTrigger) { (batch, batchId) =>
      val already = io.currentVersion > 0 &&
        """"batch_id":(\d+)""".r
          .findFirstMatchIn(io.manifest(io.currentVersion))
          .exists(_.group(1).toLong == batchId)
      if (!already) {
        val partial = batch.groupBy("source").agg(
          bloom_agg(col("token").cast("string"), capacity, fpProb).as("bloom"),
          hll_agg(col("token").cast("string"), 14).as("hll"),
          count(lit(1)).as("n_rows"))
        val merged =
          if (io.currentVersion == 0) partial
          else io.read()
            .unionByName(partial)
            .groupBy("source").agg(
              bloom_merge_agg(col("bloom")).as("bloom"),
              hll_merge_agg(col("hll")).as("hll"),
              sum(col("n_rows")).as("n_rows"))
        io.commit(merged, Map("batch_id" -> batchId))
      }
    }
    io.read().withColumn("n_batches", lit(io.currentVersion))
  }

  /**
   * Always-on heavy hitters: per micro-batch Misra–Gries partials
   * (freq_agg) merged into catalog-sized running state — the
   * mergeable-summaries combine keeps the published guarantee under
   * the stream's arbitrary batch boundaries exactly as it does under
   * batch partial aggregation. Returns (source, freq, n_batches).
   */
  def runIncrementalFreq(spark: SparkSession, inDir: String, checkpointDir: String,
                         k: Int = 32, maxFilesPerTrigger: Int = 2): DataFrame = {
    import spark.implicits._
    val state = new java.util.concurrent.ConcurrentHashMap[String, graft.sketch.FrequentItems]()
    var batches = 0L
    drainTokenStream(spark, inDir, checkpointDir, maxFilesPerTrigger) { (batch, _) =>
      val partials = batch.groupBy("source")
        .agg(freq_agg(col("token").cast("string"), k).as("freq"))
        .collect() // one summary row per group — the sketch "flush"
        .map(r => (r.getString(0), r.getAs[Array[Byte]](1)))
      state.synchronized {
        batches += 1
        partials.foreach { case (src, bytes) =>
          val part = graft.sketch.FrequentItems.deserialize(bytes)
          state.compute(src, (_, prev) => if (prev == null) part else prev.merge(part))
        }
      }
    }
    import scala.jdk.CollectionConverters._
    state.asScala.toSeq.map { case (src, s) => (src, s.serialize()) }
      .toDF("source", "freq")
      .withColumn("n_batches", lit(batches))
  }

  /**
   * Streaming heavy-hitter contract vs exact per-token truth: for
   * every (source, token) the summary must satisfy the merge-order-
   * invariant guarantee — lower estimate <= true <= estimate + error,
   * error*(k+1) <= n, weight conserved, any token with true > error
   * tracked — regardless of how the stream was batched.
   */
  def compareFreqToBatch(spark: SparkSession, inDir: String, streamed: DataFrame,
                         k: Int = 32): DataFrame =
    compareFreq(streamed, batchFreqTruth(spark, inDir), k)

  /** Exact (source, token) truth + per-source totals — split out so
    * gate callers can materialize it CONCURRENTLY with the drain. */
  def batchFreqTruth(spark: SparkSession, inDir: String): DataFrame = {
    val tokens = spark.read.parquet(inDir)
      .select(col("source"), explode(col("tokens")).as("tok"))
      .select(col("source"), col("tok").cast("string").as("token"))
    val truth = tokens.groupBy("source", "token").agg(count(lit(1)).as("m_true"))
    val totals = tokens.groupBy("source").agg(count(lit(1)).as("n"))
    truth.join(totals, Seq("source"))
  }

  def compareFreq(streamed: DataFrame, truthWithTotals: DataFrame,
                  k: Int = 32): DataFrame = {
    val est = freq_estimate(col("freq"), col("token"))
    truthWithTotals.join(broadcast(streamed), Seq("source"))
      .select(col("source"), col("n_batches"), col("n"), col("freq"),
        (est <= col("m_true") && col("m_true") <= est + freq_error(col("freq"))).as("g_ok"),
        (col("m_true") <= freq_error(col("freq")) || est > 0L).as("h_ok"))
      .groupBy("source")
      .agg(
        (min(col("n_batches")) > 1L).as("multi_batch_ok"),
        (first(freq_total(col("freq"))) === first(col("n"))).as("rows_ok"),
        min(col("g_ok")).as("guarantee_ok"),
        min(col("h_ok")).as("heavy_tracked_ok"),
        (first(freq_error(col("freq"))) * (k + 1) <= first(col("n"))).as("err_bound_ok"))
      .orderBy("source")
  }

  /**
   * The streaming-equals-batch contract: bloom membership bits, bloom
   * estimate, and HLL estimate of the incrementally-merged sketches
   * must equal a one-shot batch aggregation over the same input.
   */
  def compareToBatch(spark: SparkSession, inDir: String, streamed: DataFrame,
                     capacity: Long = 100000L, fpProb: Double = 1e-4): DataFrame =
    compareSketches(streamed, batchSketches(spark, inDir, capacity, fpProb))

  /** One-shot batch sketches — split out so gate callers can
    * materialize them CONCURRENTLY with the drain. */
  def batchSketches(spark: SparkSession, inDir: String,
                    capacity: Long = 100000L, fpProb: Double = 1e-4): DataFrame =
    spark.read.parquet(inDir)
      .select(col("source"), explode(col("tokens")).as("token"))
      .groupBy("source").agg(
        bloom_agg(col("token").cast("string"), capacity, fpProb).as("bloom_b"),
        hll_agg(col("token").cast("string"), 14).as("hll_b"),
        count(lit(1)).as("n_b"))

  def compareSketches(streamed: DataFrame, batch: DataFrame): DataFrame = {
    streamed.join(batch, Seq("source"))
      .select(col("source"), col("n_batches"),
        (col("n_rows") === col("n_b")).as("rows_ok"),
        (bloom_estimate(col("bloom")) === bloom_estimate(col("bloom_b"))).as("bloom_ok"),
        (hll_estimate(col("hll")) === hll_estimate(col("hll_b"))).as("hll_ok"))
      .orderBy("source")
  }
}
