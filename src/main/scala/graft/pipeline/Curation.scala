package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * End-to-end training-data curation — the composed user story the
 * individual operators exist for, as one declarative pipeline:
 *
 *   1. quality gate   (TextOps.quality: length / diversity / word-len)
 *   2. exact dedup    (Dedup.exactDedup: keep the lowest doc_id per
 *                      content digest)
 *   3. near-dup dedup (Dedup.nearDupClusters over trigram Jaccard:
 *                      keep each cluster's representative)
 *   4. metadata       (TextOps.langId + word counts on the survivors)
 *
 * Every stage is the library operator itself, so the whole pipeline
 * stays a DAG of scans, row-local projections, digest/shingle
 * equality joins, and bounded label-propagation rounds — no stage
 * collects row-scale data to the driver, and the same plan shapes
 * hold at 10^12 documents (PLANS.md).
 */
object Curation {

  /** Returns the kept documents as (doc_id, lang_pred, n_words). */
  def curate(docs: DataFrame, minJ: Double = 0.5): DataFrame = {
    val base = docs.select(col("doc_id").cast("long").as("doc_id"),
      col("text"), col("lang"))
    // 1. quality gate
    val quality = TextOps.quality(docs)
    val survivors = base.join(
      quality.filter(col("quality_keep")).select("doc_id"), Seq("doc_id"))
    // 2. exact dedup: keep the lowest doc_id of each content clique
    val keepers = Dedup.exactDedup(survivors)
      .select(col("kept_doc_id").as("doc_id"))
    val deduped = survivors.join(keepers, Seq("doc_id"))
    // 3. near-dup clustering: drop non-representatives
    val dropped = Dedup.nearDupClusters(deduped, minJ)
      .filter(!col("keep")).select("doc_id")
    val kept = deduped.join(dropped, Seq("doc_id"), "left_anti")
    // 4. metadata on the survivors
    TextOps.langId(kept).select(col("doc_id"), col("lang_pred"))
      .join(quality.select(col("doc_id"), col("n_words")), Seq("doc_id"))
  }
}
