package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * SemDeDup — semantic deduplication (Abbas et al. 2023,
 * arXiv:2303.09540): k-means-cluster the embedding space, then prune
 * near-identical documents WITHIN each cluster, keeping one
 * representative per semantic-duplicate group. The web-scale recipe:
 * the O(N²) cosine search collapses to per-cluster all-pairs, and the
 * clusters are the partition layout — each cell's pairs compute
 * where its vectors live.
 *
 * Spark shape: the deterministic Lloyd quantizer ([[Ann]]) assigns
 * cells in one native matrix pass; within-cell pairs come from a
 * cell-equality self-join (salted: the b-side keys by
 * hash(id) % saltParts and the a-side replicates over salts, so one
 * hot cell spreads across saltParts shuffle partitions instead of
 * serializing); duplicate groups are connected components over the
 * pair graph ([[Dedup.clustersFromPairs]]); keep = the smallest
 * vec_id of each group (deterministic; SemDeDup's
 * farthest-from-centroid choice is a one-line ORDER BY swap).
 *
 * Approximation contract (the published one): drops are SOUND — every
 * dropped vector has an exact cosine ≥ minCos to another vector in
 * its cell — and cell-COMPLETE: no two kept vectors in one cell are
 * ≥ minCos. Cross-cell duplicates are the accepted miss; recall vs
 * the exact pair set rises with nCells ∝ corpus (the paper's k ≈
 * √N regime). [[semDedupGate]] turns both halves into in-plan
 * assertions against the EXACT pair set.
 */
object Semantic {

  /** Per-vector verdict: (vec_id, cell, rep, keep). `rep` is the kept
    * representative of the vector's semantic group (itself when
    * kept). */
  def semDedup(emb: DataFrame, minCos: Double, nCells: Int = 16,
               lloydIters: Int = 4, saltParts: Int = 8): DataFrame = {
    val e = emb.select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(VecFunctions.vec_dot(col("v"), col("v"))))
    val cents = Ann.trainCentroids(e.select(col("vec_id"), col("v")), nCells, lloydIters)
    val assigned = e.withColumn("cell", Ann.cellCol(cents)).persist()
    val a = assigned.select(col("cell"), col("vec_id").as("id_a"),
      col("v").as("va"), col("nrm").as("na"))
      .withColumn("salt", explode(sequence(lit(0), lit(saltParts - 1))))
    val b = assigned.select(col("cell"), col("vec_id").as("id_b"),
      col("v").as("vb"), col("nrm").as("nb"))
      .withColumn("salt", pmod(hash(col("id_b")), lit(saltParts)))
    val pairs = a.join(b, Seq("cell", "salt"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        VecFunctions.vec_dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= minCos)
      .select("id_a", "id_b")
    val groups = Dedup.clustersFromPairs(pairs)
      .select(col("doc_id").as("vec_id"), col("cluster_rep"), col("keep"))
    val out = assigned.select(col("vec_id"), col("cell"))
      .join(groups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("cluster_rep"), col("vec_id")).as("rep"),
        coalesce(col("keep"), lit(true)).as("keep"))
      .localCheckpoint(true)
    assigned.unpersist()
    out
  }

  /**
   * Contract gate: one row —
   * (n_emb, n_exact_pairs, sound_ok, complete_ok).
   * `n_exact_pairs` is the full exact-cosine pair count (the
   * oracle-computable half); `sound_ok` = every dropped vector has an
   * exact-pair partner in ITS cell; `complete_ok` = no exact pair
   * with both sides kept AND co-located in one cell survives. The
   * kept COUNT is not oracle-derivable (it depends on the learned
   * cells) — the two booleans bound it from both sides instead.
   */
  def semDedupGate(emb: DataFrame, minCos: Double, nCells: Int = 16,
                   lloydIters: Int = 4): DataFrame = {
    // the exact pair set and the verdict are INDEPENDENT subtrees (the
    // gate joins them only afterwards); semDedup is a chain of small
    // sequential jobs (Lloyd round trips, label-propagation rounds)
    // that leaves most cores idle, so the all-pairs exact verify runs
    // concurrently on a second driver thread and back-fills them
    // (actions are only serial because driver code calls them serially)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val exactF = Future {
      val e = Dedup.cosinePairs(emb, minCos).select("id_a", "id_b")
        .localCheckpoint(true)
      e
    }
    val verdict = semDedup(emb, minCos, nCells, lloydIters).persist()
    val exact = Await.result(exactF, Duration.Inf)
    val cellOf = verdict.select(col("vec_id"), col("cell"), col("keep"))
    val pairsWithCells = exact
      .join(cellOf.select(col("vec_id").as("id_a"), col("cell").as("cell_a"),
        col("keep").as("keep_a")), Seq("id_a"))
      .join(cellOf.select(col("vec_id").as("id_b"), col("cell").as("cell_b"),
        col("keep").as("keep_b")), Seq("id_b"))
    // ONE aggregation job over the pair set yields the exact-pair
    // count and the completeness violations (previously two separate
    // count() actions over the same join)
    val pairAgg = pairsWithCells.agg(
      count(lit(1)).as("n_exact"),
      sum(when(col("cell_a") === col("cell_b") && col("keep_a") && col("keep_b"), 1L)
        .otherwise(0L)).as("n_incomplete")).head()
    val nExact = pairAgg.getLong(0)
    val nIncomplete = pairAgg.getLong(1)
    // soundness: every dropped id touches >=1 co-located exact pair —
    // one aggregation job over verdict (+ left join on the distinct
    // partnered-dropped ids) replaces three count() actions
    val droppedWithPartner = pairsWithCells
      .filter(col("cell_a") === col("cell_b"))
      .select(explode(array(
        when(!col("keep_a"), col("id_a")), when(!col("keep_b"), col("id_b"))))
        .as("vec_id"))
      .filter(col("vec_id").isNotNull).distinct()
      .withColumn("has_partner", lit(true))
    val vAgg = verdict.join(droppedWithPartner, Seq("vec_id"), "left").agg(
      count(lit(1)).as("n_emb"),
      sum(when(!col("keep"), 1L).otherwise(0L)).as("n_dropped"),
      sum(when(!col("keep") && col("has_partner"), 1L).otherwise(0L)).as("n_sound")).head()
    val nEmb = vAgg.getLong(0)
    val nDropped = vAgg.getLong(1)
    val nSoundDropped = vAgg.getLong(2)
    verdict.unpersist(); exact.unpersist()
    val spark = emb.sparkSession
    import spark.implicits._
    Seq((nEmb, nExact, nSoundDropped == nDropped, nIncomplete == 0L))
      .toDF("n_emb", "n_exact_pairs", "sound_ok", "complete_ok")
  }
}
