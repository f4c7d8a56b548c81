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
   * document lands in the bin where it starts) and the assignment is
   * a single window aggregate — one exchange on source, sorted within
   * partitions, no iteration. The greedy first-fit alternative is
   * inherently sequential; offset packing is the order-preserving
   * variant that stays a relational window at 10^12 sequences.
   */
  def packSequences(tokenTable: DataFrame, budget: Long): DataFrame = {
    require(budget > 0)
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tokenTable
      .select(col("source"), col("doc_id").cast("long").as("doc_id"),
        col("n_tok").cast("long").as("n_tok"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .withColumn("bin_id", floor((col("cum_tok") - col("n_tok")) / budget))
  }
}
