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
 *
 * The near-dup stage is parameterized by its candidate-pair source
 * ([[PairSource]]), because that is where the scale mode lives:
 *   - [[PairSource.Exact]]  — the uncapped trigram inverted-index
 *     self-join. The oracle anchor; its hot-shingle df² term makes it
 *     the wrong default at extreme corpus sizes.
 *   - [[PairSource.Capped]] — same join with shingles above a
 *     document-frequency cap dropped (`Dedup.ngramJaccardPairs`
 *     maxShingleDocs), bounding every posting list.
 *   - [[PairSource.Lsh]]    — MinHash banding (`Dedup.minhashLshPairs`):
 *     candidate volume O(rows·bands), never a df² term — the 100 TB
 *     composition. At production thresholds banded recall ≈ 1, so
 *     survivors match the exact pipeline's (gated by
 *     `pipeline_curation_lsh` against the exact-replay oracle).
 */
object Curation {

  /** Candidate-pair generator for the near-dup stage: docs(doc_id,
    * text) => pairs(id_a, id_b, ...). */
  sealed trait PairSource { def pairs(docs: DataFrame): DataFrame }
  object PairSource {
    /** Exact trigram-Jaccard self-join (oracle anchor). */
    case class Exact(n: Int = 3, minJ: Double = 0.5) extends PairSource {
      def pairs(docs: DataFrame): DataFrame = Dedup.ngramJaccardPairs(docs, n, minJ)
    }
    /** Document-frequency-capped shingle join: posting lists bounded
      * by `maxShingleDocs`. */
    case class Capped(n: Int = 3, minJ: Double = 0.5, maxShingleDocs: Long = 64)
        extends PairSource {
      def pairs(docs: DataFrame): DataFrame =
        Dedup.ngramJaccardPairs(docs, n, minJ, maxShingleDocs)
    }
    /** MinHash+LSH banding — the 100 TB mode. */
    case class Lsh(minJ: Double = 0.5, numPerms: Int = 128, bands: Int = 32)
        extends PairSource {
      def pairs(docs: DataFrame): DataFrame =
        Dedup.minhashLshPairs(docs, numPerms, bands, minJ)
    }
  }

  /** Returns the kept documents as (doc_id, lang_pred, n_words),
    * with the near-dup stage on the exact pair source (oracle
    * parity); the overload below picks the scale mode. */
  def curate(docs: DataFrame, minJ: Double = 0.5): DataFrame =
    curate(docs, minJ, PairSource.Exact(3, minJ))

  /** As above with an explicit near-dup candidate generator — pass
    * [[PairSource.Lsh]] (or Capped) for the 100 TB mode. */
  def curate(docs: DataFrame, minJ: Double,
             pairSource: PairSource): DataFrame = {
    val base = docs.select(col("doc_id").cast("long").as("doc_id"),
      col("text"), col("lang"))
    // 1. quality gate — materialized once: the keep flags feed the
    //    survivor filter AND n_words joins the final output, and the
    //    metric projection (array aggregates per doc) is the kind of
    //    row-local work that must not replay per reference
    val quality = TextOps.quality(docs)
      .select("doc_id", "n_words", "quality_keep")
      .localCheckpoint(true)
    val survivors = base.join(
      quality.filter(col("quality_keep")).select("doc_id"), Seq("doc_id"))
    // 2. exact dedup: keep the lowest doc_id of each content clique
    val keepers = Dedup.exactDedup(survivors)
      .select(col("kept_doc_id").as("doc_id"))
    // the near-dup pair source, the survivor anti-join, and the
    // metadata stage all read `deduped` — one stage-boundary
    // materialization instead of replaying the scan->quality->exact-
    // dedup chain per reference (in LSH mode the pair source alone
    // held three such replays). Same discipline as the corpus_prep /
    // lm_filter gates' stage checkpoints.
    val deduped = survivors.join(keepers, Seq("doc_id"))
      .localCheckpoint(true)
    // 3. near-dup clustering over the chosen pair source: drop
    //    non-representatives
    val dropped = Dedup.clustersFromPairs(pairSource.pairs(deduped))
      .filter(!col("keep")).select("doc_id")
    val kept = deduped.join(dropped, Seq("doc_id"), "left_anti")
    // 4. metadata on the survivors
    TextOps.langId(kept).select(col("doc_id"), col("lang_pred"))
      .join(quality.select(col("doc_id"), col("n_words")), Seq("doc_id"))
  }
}
