package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-shaping operators for the training-data pipeline: the steps
 * that come AFTER curation — choosing how much of each source to keep
 * and how the surviving sequences batch into token budgets. Both are
 * pure relational shapes (hash projections and window aggregates), so
 * they scale as scans + one bounded exchange and replay exactly in
 * SQL (the oracle contract).
 */
object DataShaping {

  /**
   * Deterministic stratified sampling: keep a document iff the first
   * hex nibble of md5(doc_id) < its source's rate (in sixteenths).
   * Reproducible across runs/engines (content-independent coin: the
   * same doc keeps or drops under resampling of OTHER sources),
   * row-local (no shuffle — the sample is a scan-level filter the
   * optimizer pushes down), and exactly SQL-replayable.
   *
   * `rates16`: source -> sixteenths to keep (0..16); sources absent
   * from the map use `defaultRate16`.
   */
  def stratifiedSample(docs: DataFrame, rates16: Map[String, Int],
                       defaultRate16: Int): DataFrame = {
    require((defaultRate16 +: rates16.values.toSeq).forall(r => r >= 0 && r <= 16))
    // SQL-form locate: the DataFrame helper only takes a literal
    // substring, but the needle here is a computed column
    val nib = expr(
      "locate(substring(md5(cast(doc_id AS string)), 1, 1), '0123456789abcdef') - 1")
    val rate = rates16.foldLeft(lit(defaultRate16)) { case (acc, (src, r)) =>
      when(col("source") === src, r).otherwise(acc)
    }
    docs
      .withColumn("nibble", nib.cast("int"))
      .withColumn("rate16", rate.cast("int"))
      .filter(col("nibble") < col("rate16"))
  }

  /**
   * Token-budget sequence packing: per source, documents in doc_id
   * order accumulate token counts, and each document joins the bin
   * its STARTING offset falls in (`bin = floor((cumsum - n_tok) /
   * budget)`). Bins therefore average `budget` tokens (the straddling
   * document lands in the bin where it starts). The greedy first-fit
   * alternative is inherently sequential; offset packing is the
   * order-preserving variant that stays relational at 10^12 sequences.
   *
   * The per-source running sum is a DISTRIBUTED two-phase prefix sum,
   * not a `Window.partitionBy(source)` cumsum — that window hashes
   * every row of a source into ONE task, so a corpus with a handful
   * of sources would serialize on a handful of executors:
   *
   *   1. rows bucket by deterministic doc_id RANGE (`bucket =
   *      (doc_id - min) div width`, width sized for ~`targetBuckets`
   *      buckets) — a pure function of the data, so both phases
   *      compute identical buckets with no need to persist an
   *      exchange (range-partition ids would be sampling-dependent);
   *   2. phase 1 aggregates per-(source, bucket) token totals — a
   *      map-side-combined agg whose output is S×B tiny rows — and
   *      the driver prefix-sums them into each bucket's starting
   *      offset (the one driver round-trip, S×B offsets, NOT row
   *      data; keep S×B ≲ 10^6);
   *   3. phase 2 broadcast-joins the offsets back and runs the cumsum
   *      window per (source, bucket) — parallelism S×B instead of S,
   *      each task sorting one bucket's rows.
   *
   * The result is bitwise identical to the single-window formula:
   * `cum_tok = bucket_start + within-bucket cumsum` over the same
   * total (source, doc_id) order, all in exact integer arithmetic.
   *
   * `targetBuckets` picks the parallelism/driver trade: each bucket
   * should hold roughly one task's worth of rows (10-100M at full
   * scale), while sources × buckets stays a small driver collect.
   */
  def packSequences(tokenTable: DataFrame, budget: Long,
                    targetBuckets: Int = 1024): DataFrame = {
    require(budget > 0 && targetBuckets > 0)
    val spark = tokenTable.sparkSession
    val base = tokenTable
      .select(col("source"), col("doc_id").cast("long").as("doc_id"),
        col("n_tok").cast("long").as("n_tok"))
    val mm = base.agg(min("doc_id").as("lo"), max("doc_id").as("hi")).head()
    if (mm.isNullAt(0)) // empty input: just the output schema
      return base.withColumn("cum_tok", col("n_tok"))
        .withColumn("bin_id", lit(0L)).where(lit(false))
    val lo = mm.getLong(0)
    val width = math.max(1L, (mm.getLong(1) - lo) / targetBuckets + 1)
    val withB = base.withColumn("bucket", expr(s"(doc_id - ${lo}L) div ${width}L"))
    // phase 1: per-(source, bucket) totals -> driver prefix sum
    val totals = withB.groupBy("source", "bucket")
      .agg(sum("n_tok").as("btot")).collect()
    val offsets: Seq[(String, Long, Long)] = totals
      .groupBy(_.getString(0)).toSeq.flatMap { case (src, rows) =>
        var acc = 0L
        rows.sortBy(_.getLong(1)).map { r =>
          val start = acc; acc += r.getLong(2); (src, r.getLong(1), start)
        }
      }
    import spark.implicits._
    val offsDf = offsets.toDF("source", "bucket", "bucket_start")
    // phase 2: row-local offset + within-bucket cumsum
    val w = Window.partitionBy("source", "bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(broadcast(offsDf), Seq("source", "bucket"))
      .withColumn("cum_tok", col("bucket_start") + sum(col("n_tok")).over(w))
      .withColumn("bin_id", floor((col("cum_tok") - col("n_tok")) / budget))
      .select("source", "doc_id", "n_tok", "cum_tok", "bin_id")
  }
}
