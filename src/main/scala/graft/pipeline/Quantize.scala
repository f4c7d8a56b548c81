package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scalar int8 embedding quantization — the memory-scale path for
 * embedding stores. At 100 TB the embedding column dominates the
 * table's bytes (64 float32 dims = 256 B/row); symmetric per-vector
 * int8 cuts the candidate scan's IO and cache footprint 4x (the
 * standard first step of FAISS-style `SQ8` storage) while keeping
 * ranking quality measurable against the exact float answer with the
 * same recall harness the LSH/IVF tiers use ([[Ann]]).
 *
 * Everything here is ENGINE-REPRODUCIBLE so a DuckDB oracle replays
 * it byte-for-byte:
 *
 *   - `amax = max_i |v_i|` (exact — max has no rounding),
 *     `q_i = floor(v_i * 127.0 / amax + 0.5)` (one IEEE multiply,
 *     divide, add, floor — all correctly-rounded ops, identical in
 *     any IEEE-754 engine), so `q_i` is an exact integer in
 *     [-127, 127] and `|q_i - v_i*127/amax| <= 0.5` BY CONSTRUCTION
 *     (the gate asserts it per component);
 *   - quantized dot products are EXACT integer arithmetic
 *     (|dot| <= 127^2 * dims — fits a long with 2^40 dims of slack);
 *   - quantized cosine `dq / (sqrt(daa) * sqrt(dbb))` divides an
 *     exact integer by square roots of exact integers — sqrt is an
 *     IEEE-required correctly-rounded op, so the doubles (and hence
 *     the ranking) are identical across engines.
 *
 * Scale shape: quantization is a row-local projection (scan-width
 * work inside WholeStageCodegen — the only shape that may read all
 * 100 TB); the quantized top-k ranks with the same broadcast-queries /
 * streaming-corpus plan as [[Ann.bruteTopK]], but the corpus side
 * carries 64 longs + one double instead of 64 doubles, and at
 * production scale the int8 column is what you STORE, paying the
 * decode-free integer dot at scan time. The per-query top-k is
 * map-side-capped by WindowGroupLimit (rank shuffle = queries x k).
 *
 * Reference tie-in: like bloomd's filters, the quantized corpus is a
 * compact lossy summary probed row-locally, with the loss bound (here
 * the 0.5-ulp-of-scale reconstruction bound and the measured
 * recall@k) stated and checked rather than assumed
 * (`csrc/libbloom/bloom.c:105-150` is the analogous
 * bounded-false-positive discipline).
 */
object Quantize {

  private def vecs(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** exact integer dot of two long arrays (native tight loop —
    * bit-identical to the aggregate(zip_with) fold it replaces;
    * integer adds are order-free anyway) */
  private def qdot(a: Column, b: Column): Column =
    VecFunctions.vec_dot_long(a, b)

  /**
   * Per-vector symmetric int8: adds `amax` (the per-vector scale
   * numerator) and `qv` (array<long> of values in [-127, 127]).
   * All-zero vectors quantize to all-zero with amax = 0 (no NaN path).
   */
  def int8(emb: DataFrame): DataFrame =
    vecs(emb)
      .withColumn("q8", VecFunctions.quantize_int8(col("v")))
      .withColumn("amax", col("q8").getField("amax"))
      .withColumn("qv", col("q8").getField("qv"))
      .drop("q8")

  /**
   * Vector-grain quantization audit: the full quantized vector (as its
   * canonical CSV rendering so the gate can hash it), its exact
   * integer moments, and the per-component reconstruction bound
   * `|q_i - v_i*127/amax| <= 0.5` asserted over every component.
   */
  def int8Audit(emb: DataFrame): DataFrame =
    int8(emb).select(
      col("vec_id"),
      array_join(col("qv").cast("array<string>"), ",").as("q_csv"),
      round(col("amax"), 6).as("amax_r"),
      aggregate(col("qv"), lit(0L), (acc, x) => acc + x).as("q_sum"),
      qdot(col("qv"), col("qv")).as("q_nrm2"),
      coalesce(
        forall(zip_with(col("qv"), col("v"), (q, x) =>
          when(col("amax") === 0.0, q === 0L)
            .otherwise(abs(q.cast("double") - x * lit(127.0) / col("amax")) <= 0.5)),
          identity[Column]),
        lit(true)).as("recon_ok"))
      .orderBy("vec_id")

  /**
   * IVF-SQ8 — the production composition for embedding search at
   * 100 TB: the Lloyd quantizer's posting lists bound WHICH vectors a
   * query touches (cluster-prune instead of scan, cells ~ sqrt(N)),
   * and the postings STORE int8 codes instead of floats, so the
   * candidate scan moves 4x fewer bytes and re-ranks with exact
   * integer dots (FAISS's `IVF,SQ8` index shape). Gated on MEAN
   * recall@k against the exact float answer like the float IVF tier
   * ([[Ann.ivfTopK]] — same harness, same falsifiable floor).
   */
  def ivfTopKQuantized(emb: DataFrame, nQueries: Int, k: Int,
                       nCells: Int = 16, lloydIters: Int = 3, nProbe: Int = 8,
                       recallFloor: Double = 0.9): DataFrame = {
    val e = vecs(emb)
    val centroids = Ann.trainCentroids(e, nCells, lloydIters)
    // the posting layout carries ONLY the cell key + int8 codes +
    // integer norm — the float vectors never ride the search
    val posting = int8(emb)
      .withColumn("cell", Ann.cellCol(centroids))
      .withColumn("qnrm2", qdot(col("qv"), col("qv")))
      .select("vec_id", "cell", "qv", "qnrm2")
    val probe = Ann.probeCellsFor(e, centroids, nQueries, nProbe)
    val queries = int8(emb).filter(col("vec_id") < nQueries)
      .withColumn("qqnrm2", qdot(col("qv"), col("qv")))
      .select(col("vec_id").as("q_id"), col("qv").as("qqv"), col("qqnrm2"))
    val w = Window.partitionBy("q_id").orderBy(col("qcos").desc, col("n_id").asc)
    val top = posting.join(broadcast(probe), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .join(broadcast(queries), Seq("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        (qdot(col("qqv"), col("qv")).cast("double") /
          (sqrt(col("qqnrm2").cast("double")) * sqrt(col("qnrm2").cast("double")))).as("qcos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id")
    val exact = Ann.exactTopPairs(emb, nQueries, k)
    val totals = top.intersect(exact).agg(count(lit(1)).as("n_hit"))
      .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
      .select((col("n_hit") >= lit(recallFloor) * col("n_exact")).as("mean_recall_ok"))
    exact.select("q_id").distinct()
      .crossJoin(totals)
      .orderBy("q_id")
  }

  /**
   * Quantized brute top-k: rank the corpus per query by QUANTIZED
   * cosine (exact-integer dots, sqrt-of-integer norms), excluding
   * self, ties by neighbor id. `n_hit` is the per-query overlap with
   * the exact float top-k — the measured recall numerator, an exact
   * integer the oracle replays (not an asserted floor), with
   * `recall_ok` gating on `recallFloor`.
   */
  def topKQuantized(emb: DataFrame, nQueries: Int, k: Int,
                    recallFloor: Double = 0.8): DataFrame = {
    // the recall harness reads `top` twice (hit counting + the output
    // join); checkpoint the queries x k result rows so the int8
    // corpus scan runs once
    val top = topKQuantizedRaw(emb, nQueries, k).localCheckpoint()
    val exact = Ann.exactTopPairs(emb, nQueries, k)
    val hits = top.select(col("q_id"), col("n_id"))
      .intersect(exact)
      .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
    top.join(hits, Seq("q_id"), "left")
      .select(col("q_id"), col("rank"), col("n_id"), col("dq"),
        round(col("qcos"), 6).as("qcos"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)) >= lit(recallFloor * k)).as("recall_ok"))
      .orderBy("q_id", "rank")
  }

  /** the raw quantized search a user runs (broadcast queries, one
    * int8 corpus scan, WindowGroupLimit-capped rank) — the recall
    * harness above is the quality gate on top of it. */
  def topKQuantizedRaw(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val q8 = int8(emb)
      .withColumn("qnrm2", qdot(col("qv"), col("qv")))
      .select(col("vec_id"), col("qv"), col("qnrm2"))
    val queries = q8.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("qv").as("qqv"), col("qnrm2").as("qqnrm2"))
    val w = Window.partitionBy("q_id").orderBy(col("qcos").desc, col("n_id").asc)
    q8.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        qdot(col("qqv"), col("qv")).as("dq"),
        col("qqnrm2"), col("qnrm2"))
      .withColumn("qcos",
        col("dq").cast("double") /
          (sqrt(col("qqnrm2").cast("double")) * sqrt(col("qnrm2").cast("double"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
