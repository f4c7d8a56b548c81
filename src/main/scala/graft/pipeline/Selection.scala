package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.TextFunctions.{shingles, words}

/**
 * Target-domain data selection — the classifier-style "pick raw-pool
 * documents that look like the target domain" step of a training-data
 * pipeline (the shape of DSIR, Xie et al. 2023, "Data Selection for
 * Language Models via Importance Resampling": hashed n-gram features,
 * a target model and a raw model over the SAME feature buckets, and a
 * per-document importance score that compares the two).
 *
 * This implementation keeps the whole computation in exact integer
 * arithmetic so the result is engine-reproducible (the DuckDB oracle
 * replays it byte-for-byte):
 *
 *   - features = the document's DISTINCT word n-gram shingles
 *     ([[TextFunctions.shingles]] — binary per-doc features, like DSIR's
 *     hashed n-grams), bucketed by the engine's standard md5 hex
 *     prefix into `16^hexChars` buckets;
 *   - the model is one pass over the corpus: per bucket, how many
 *     (doc, gram) observations come from the target source (`t_b`)
 *     vs the raw pool (`s_b`);
 *   - a feature's VOTE is the sign of the DSIR log-importance ratio
 *     `log((t_b/NT) / (s_b/NS))`, computed without logs or floats as
 *     `sign(t_b·NS − s_b·NT)` (cross-multiplication; NT/NS are the
 *     model totals). A bucket seen only in the target votes +1, only
 *     in the pool −1, proportionally represented ~0;
 *   - a pool document's score is the sum of its feature votes, and
 *     `keep = score > 0` — more target-affine features than not.
 *
 * Scale shape (the 100 TB posture): pass 1 builds the model with a
 * map-side-combined aggregation whose exchange is BUCKET-grained
 * (≤ 16^hexChars partial rows per task, 4096 by default — never data-
 * sized); the model and its totals then ride a BROADCAST join (model-
 * sized, like the tokenizer literal in BPE encode), so pass 2 scores
 * every pool document scan-locally, and the only row-grained exchange
 * is the per-doc partial-agg row of the final groupBy (a document's
 * grams explode from one row, so partial aggregation collapses them
 * map-side to ONE row per doc). No self-joins, nothing all-pairs.
 *
 * Cross-multiplication bounds: t_b, s_b, NT, NS are (doc, gram)
 * observation counts — ≤ ~10^15 at 10^12 sequences — so the products
 * fit decimal(38,0) on the Spark side and HUGEINT in the oracle.
 *
 * Documents with fewer than `n` words carry no n-gram feature and are
 * NOT scored (WordShingles would emit the whole text as one short
 * shingle; selection drops those rows instead — a quality gate
 * handles degenerate documents, see [[Curation]]).
 *
 * Reference tie-in: like `bloomd`'s filters, the model is a compact
 * build-once summary probed row-locally; unlike a bloom probe the
 * answer here is a vote, not membership — the sketch-catalog
 * discipline (bounded summary, broadcast, scan-local probe) is the
 * same (`csrc/bloomd/filter_manager.c:335-357` is the probe analog).
 */
object Selection {

  /**
   * Score every non-target document's affinity to `targetSource`.
   *
   * Output: (doc_id: long, source, n_feat: long, score: long,
   * keep: boolean) — one row per pool document with ≥ 1 n-gram
   * feature; `n_feat` = distinct grams scored, `score` = vote sum.
   */
  def targetAffinity(docs: DataFrame, targetSource: String,
                     n: Int = 2, hexChars: Int = 3): DataFrame = {
    require(n >= 1, s"gram width $n must be >= 1")
    require(hexChars >= 1 && hexChars <= 7,
      s"hexChars $hexChars out of range 1..7 (16^7 buckets already exceed any useful model)")

    // (doc, distinct-gram) observations, bucketed. Computed once as a
    // view; Spark re-derives it for each pass (two corpus scans — the
    // model pass and the scoring pass), which beats materializing a
    // corpus-sized gram table.
    val grams = docs
      .filter(size(words(col("text"))) >= n)
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        explode(shingles(words(col("text")), n)).as("gram"))
      .select(col("doc_id"), col("source"),
        expr(s"cast(conv(substring(md5(gram), 1, $hexChars), 16, 10) as int)").as("b"))

    val isTgt = col("source") === lit(targetSource)

    // pass 1 — the model: bucket-grained exchange, bounded rows
    val model = grams.groupBy("b").agg(
      sum(when(isTgt, 1L).otherwise(0L)).as("t_b"),
      sum(when(isTgt, 0L).otherwise(1L)).as("s_b"))
    val totals = model.agg(
      sum("t_b").cast("decimal(19,0)").as("nt"),
      sum("s_b").cast("decimal(19,0)").as("ns"))

    // pass 2 — scan-local scoring against the broadcast model
    val lhs = col("t_b").cast("decimal(19,0)") * col("ns")
    val rhs = col("s_b").cast("decimal(19,0)") * col("nt")
    grams.filter(!isTgt)
      .join(broadcast(model), Seq("b"))
      .crossJoin(broadcast(totals))
      .withColumn("vote", when(lhs > rhs, 1L).when(lhs < rhs, -1L).otherwise(0L))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_feat"), sum("vote").as("score"))
      .withColumn("keep", col("score") > 0)
  }
}
