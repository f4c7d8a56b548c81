package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import TextFunctions._

/**
 * Deduplication operators for training-data curation, each a
 * different point on the exactness/cost curve. Scale posture (the
 * part that must survive 100 TB):
 *
 *  - NOTHING here cross-joins the corpus. Candidate pairs come from
 *    equality joins on derived keys (content hash, shared shingle,
 *    LSH band bucket, SimHash band), so the shuffle volume is
 *    O(documents x small-constant), and AQE handles residual skew.
 *  - Signatures (MinHash/SimHash) are row-local scan projections —
 *    computed once, no state, deterministic across reruns.
 *  - Verification (exact Jaccard on candidates) touches only the
 *    candidate pairs, which for a sane threshold is a vanishing
 *    fraction of n^2.
 */
object Dedup {

  /** doc_id(long) + words + distinct word-trigram shingles. */
  private def shingled(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(
      col("doc_id").cast("long").as("id"),
      shingles(words(col("text")), n).as("sh"))
      .withColumn("nsh", size(col("sh")))

  /**
   * Exact dedup by content hash: groupBy(md5(text)), keep the lowest
   * doc_id of each clique. The groupBy key is the 128-bit digest, so
   * group sizes are duplicate-clique sizes (bounded), and the shuffle
   * carries (digest, id) pairs only — not the text.
   */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.select(md5(col("text")).as("fp"), col("doc_id").cast("long").as("id"))
      .groupBy("fp")
      .agg(min("id").as("kept_doc_id"), count(lit(1)).as("n_copies"))

  /**
   * Exact word n-gram Jaccard via a shingle inverted index:
   * explode(shingles) -> self-equality-join on the shingle ->
   * count shared shingles per pair -> J = inter / (|A|+|B|-inter).
   * Only pairs sharing >= 1 shingle are ever materialized. At scale,
   * stop-shingles (appearing in more than `maxShingleDocs` docs) can
   * be dropped before the join — a pair at J >= 0.5 shares far more
   * than one shingle, so recall at the threshold is unaffected;
   * pass 0 to disable (exact mode, used for oracle parity).
   */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, minJ: Double = 0.5,
                        maxShingleDocs: Long = 0): DataFrame = {
    val sh = shingled(docs, n)
    val inv0 = sh.select(col("id"), col("nsh"), explode(col("sh")).as("g"))
    val inv =
      if (maxShingleDocs > 0) {
        val hot = inv0.groupBy("g").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxShingleDocs).select("g")
        inv0.join(broadcast(hot), Seq("g"), "left_anti")
      } else inv0
    inv.as("a").join(inv.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.nsh").as("na"), col("b.nsh").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= minJ)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /**
   * MinHash + LSH near-dup: `numPerms` MinHash values per doc (scalar
   * projection), banded into `bands` groups of r = numPerms/bands;
   * docs colliding on any whole band become candidates; candidates
   * are then verified with exact Jaccard. With 128 perms in 32 bands
   * of 4, a pair at J=0.9 is missed with probability
   * (1 - 0.9^4)^32 ~ 5e-7 — and this corpus's near-dup pairs sit at
   * J >= 0.95, so recall is 1 in practice (asserted by the spec).
   */
  def minhashLshPairs(docs: DataFrame, numPerms: Int = 128, bands: Int = 32,
                      minJ: Double = 0.5): DataFrame = {
    require(numPerms % bands == 0, "bands must divide numPerms")
    val r = numPerms / bands
    val sh = shingled(docs)
    val sig = sh.withColumn("sig", minhash_sig(col("sh"), numPerms))
    val buckets = sig.select(col("id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"), hash(slice(col("sig"), b * r + 1, lit(r))).as("bh")))).as("e"))
      .select(col("id"), col("e.band").as("band"), col("e.bh").as("bh"))
    val cand = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    verifyJaccard(cand, sh, minJ)
  }

  /**
   * SimHash near-dup: 64-bit fingerprint over the doc's word-trigram
   * shingles (trigram features separate near-dups from the background
   * far better than unigrams on a small-vocab corpus: planted pairs
   * land at Hamming <= ~13 while random pairs center at ~32).
   * Candidates collide on at least one of 8 disjoint 8-bit bands
   * (pigeonhole guarantees recall for Hamming <= 7; the 8..maxHamming
   * range is caught with high probability — SimHash recall is
   * inherently probabilistic above the band bound, the price of a
   * 64-bit fingerprint vs MinHash's 1KB signature); candidates pass a
   * bit_count Hamming gate and exact-Jaccard verification.
   */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 16, minJ: Double = 0.5): DataFrame = {
    val sh = shingled(docs)
    val fp = docs.select(col("doc_id").cast("long").as("id"),
      simhash64(shingles(words(col("text")), 3)).as("f"))
    val buckets = fp.select(col("id"), col("f"),
        explode(sequence(lit(0), lit(7))).as("band"))
      .withColumn("bv", expr("shiftright(f, cast(band * 8 as int)) & 255"))
    val cand = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.id") < col("b.id"))
      .filter(expr("bit_count(a.f ^ b.f)") <= maxHamming)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    verifyJaccard(cand, sh, minJ)
  }

  /**
   * Embedding-cosine near-dup over (vec_id, embedding float[64]).
   * Exact double-precision cosine so the oracle can replay it
   * bit-for-bit; the quadratic pair join is acceptable here because
   * the verify corpus is small — the 100 TB path is the LSH-bucketed
   * plan in Ann.lshTopK, which this shares its cosine kernel with.
   */
  def cosinePairs(emb: DataFrame, minCos: Double): DataFrame = {
    // norms hoisted out of the O(n^2) pair loop: sqrt(dot(v,v)) once
    // per row, so each pair costs ONE native dot + a multiply/divide.
    // Identical IEEE result to computing norms per pair.
    val e = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(VecFunctions.vec_dot(col("v"), col("v"))))
    val a = e.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("nrm_a"))
    val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nrm_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", VecFunctions.vec_dot(col("va"), col("vb")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))), left-fold order. */
  def cosine(va: org.apache.spark.sql.Column, vb: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      VecFunctions.vec_dot(x, y)
    dot(va, vb) / (sqrt(dot(va, va)) * sqrt(dot(vb, vb)))
  }

  /**
   * Dedup completion: connected components over the near-dup pair
   * graph, keeping the lowest doc_id of each component as the
   * representative — the final keep/drop decision of a dedup
   * pipeline. Implemented as DataFrame min-label propagation to a
   * fixpoint (each iteration: label = min(own, neighbors' labels));
   * near-dup graphs have tiny diameter, so this converges in a few
   * shuffles even at corpus scale (GraphX offers the same algorithm
   * RDD-side; we stay in DataFrames per the engine contract).
   */
  def nearDupClusters(docs: DataFrame, minJ: Double = 0.5): DataFrame = {
    val pairs = ngramJaccardPairs(docs, 3, minJ).select("id_a", "id_b")
    val edges = pairs
      .union(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .distinct()
      .cache()
    var labels = edges.select(col("id_a").as("id")).distinct()
      .withColumn("label", col("id"))
    var converged = false
    while (!converged) {
      val next = edges
        .join(labels.select(col("id").as("id_b"), col("label").as("nl")), Seq("id_b"))
        .groupBy(col("id_a").as("id")).agg(min(col("nl")).as("minN"))
        .join(labels, Seq("id"))
        .select(col("id"), least(col("label"), col("minN")).as("label"))
        .cache()
      converged = next.join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .filter(col("label") =!= col("old")).isEmpty
      labels = next
    }
    edges.unpersist()
    labels.select(col("id").as("doc_id"), col("label").as("cluster_rep"),
      (col("id") === col("label")).as("keep"))
  }

  /** Exact-Jaccard verification of candidate pairs against shingle sets. */
  private def verifyJaccard(cand: DataFrame, sh: DataFrame, minJ: Double): DataFrame =
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= minJ)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
}
