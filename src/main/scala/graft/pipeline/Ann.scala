package graft.pipeline

import graft.hash.Murmur3x64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (array<float>), two
 * tiers:
 *
 *  - bruteTopK: exact cosine top-k. The QUERY side is broadcast (a
 *    handful of vectors); the corpus side streams through a scan +
 *    projection, so the plan is one broadcast-nested-loop +
 *    per-query top-k — at 100 TB this is the "small query batch vs
 *    huge corpus" shape, which is exactly the scalable direction
 *    (never the reverse).
 *  - lshTopK: random-hyperplane (sign) LSH — L hash tables of k
 *    sign-bits each; candidates collide with the query in >= 1
 *    table; candidates are re-ranked by exact cosine. Bucket keys
 *    are row-local projections, the candidate join is an equality
 *    join on (table, bucket) — the 100 TB path, probing a vanishing
 *    fraction of the corpus.
 *
 * Hyperplanes are DETERMINISTIC: component d of plane p is +1/-1 by a
 * Murmur3 x64 bit of (p, d) — reproducible across JVMs and reruns
 * (no RNG state to checkpoint).
 */
object Ann {

  /** +-1 hyperplane components, deterministic from Murmur3 x64_128. */
  def planeComponent(plane: Int, dim: Int): Double = {
    val key = Array[Byte](
      (plane >> 24).toByte, (plane >> 16).toByte, (plane >> 8).toByte, plane.toByte,
      (dim >> 24).toByte, (dim >> 16).toByte, (dim >> 8).toByte, dim.toByte)
    val out = new Array[Long](2)
    Murmur3x64.hash128(key, 0, key.length, 0L, out)
    if ((out(0) & 1L) == 1L) 1.0 else -1.0
  }

  private def planeCol(plane: Int, nDims: Int): Column =
    array((0 until nDims).map(d => lit(planeComponent(plane, d))): _*)

  /** Sign bit of v . plane_p, as 0/1 long. */
  private def signBit(v: Column, plane: Int, nDims: Int): Column =
    when(aggregate(zip_with(v, planeCol(plane, nDims), (x, s) => x * s),
      lit(0.0), (a, x) => a + x) > 0.0, 1L).otherwise(0L)

  /** Bucket key of table `t` (k sign-bits packed into a long). */
  private def bucketKey(v: Column, table: Int, k: Int, nDims: Int): Column =
    (0 until k).map(b => signBit(v, table * k + b, nDims) * (1L << b))
      .reduce(_ + _)

  private def vectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /**
   * Exact top-k neighbors (cosine, excluding self) for query vectors
   * `vec_id < nQueries`; ties broken by neighbor id.
   */
  def bruteTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val e = vectors(emb)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        Dedup.cosine(col("qv"), col("v")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 6).as("cos"))
  }

  /**
   * LSH-bucketed ANN with exact re-ranking, reported as per-query
   * recall@k against the exact answer (computed on the same input):
   * the standard ANN quality harness. `recallFloor` is asserted as a
   * boolean so small-scale oracles stay exact while the recall value
   * itself is environment-independent (deterministic hyperplanes).
   */
  def lshTopK(emb: DataFrame, nQueries: Int, k: Int,
              tables: Int = 8, bitsPerTable: Int = 6,
              recallFloor: Double = 0.05): DataFrame = {
    val nDims = 64
    val e = vectors(emb)
    val buckets = e.select(col("vec_id"), col("v"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("t"), bucketKey(col("v"), t, bitsPerTable, nDims).as("bk"))): _*)).as("e"))
      .select(col("vec_id"), col("v"), col("e.t").as("t"), col("e.bk").as("bk"))
    val qb = buckets.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("t"), col("bk"))
    val candIds = buckets.select(col("vec_id"), col("t"), col("bk"))
      .join(broadcast(qb), Seq("t", "bk"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"))
      .distinct()
    val cand = candIds
      .join(e.select(col("vec_id").as("n_id"), col("v")), Seq("n_id"))
      .join(broadcast(e.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))), Seq("q_id"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    val lshTop = cand
      .select(col("q_id"), col("n_id"), Dedup.cosine(col("qv"), col("v")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"))
    val exactTop = bruteTopK(emb, nQueries, k).select(col("q_id"), col("n_id"))
    recallCheck(lshTop, exactTop, recallFloor)
  }

  /**
   * IVF (inverted-file) ANN: a deterministic coarse quantizer —
   * centroids seeded from the first `nCells` vectors, refined by
   * `lloydIters` Lloyd iterations run as DataFrame jobs (assign =
   * row-local argmin over vec_dot distances; update = per-(cell, dim)
   * average) — partitions the corpus into posting lists; a query
   * probes its `nProbe` nearest cells and exactly re-ranks their
   * members. At 100 TB the posting lists are the partition layout
   * (cluster-prune instead of scan), which is why IVF is the
   * standard scale path for embedding search.
   */
  def ivfTopK(emb: DataFrame, nQueries: Int, k: Int, nCells: Int = 16,
              lloydIters: Int = 3, nProbe: Int = 4,
              recallFloor: Double = 0.05): DataFrame = {
    val nDims = 64
    val e = vectors(emb)

    def sqNorm(c: Array[Double]): Double = c.foldLeft(0.0)((a, x) => a + x * x)
    def centroidLit(c: Array[Double]): Column = typedlit(c.toSeq)
    // nearest centroid by L2: argmin(-2 v.c + |c|^2) (|v|^2 constant per row)
    def cellCol(cents: Seq[Array[Double]]): Column = {
      val dists = array(cents.map(c =>
        VecFunctions.vec_dot(col("v"), centroidLit(c)) * -2.0 + sqNorm(c)): _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }

    var centroids: Seq[Array[Double]] = e.filter(col("vec_id") < nCells)
      .orderBy("vec_id").collect()
      .map(_.getSeq[Double](1).toArray).toSeq
    for (_ <- 1 to lloydIters) {
      val means = e.withColumn("cell", cellCol(centroids))
        .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cell", "dim").agg(avg(col("x")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          val c = new Array[Double](nDims)
          rows.foreach(r => c(r.getInt(1)) = r.getDouble(2))
          cell -> c
        }
      centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i)))
    }

    val posting = e.withColumn("cell", cellCol(centroids))
    val queryVecs = e.filter(col("vec_id") < nQueries).orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val spark = emb.sparkSession
    import spark.implicits._
    val probeCells = queryVecs.flatMap { case (qId, qv) =>
      centroids.zipWithIndex
        .map { case (c, i) =>
          (i, -2.0 * c.zip(qv).map { case (a, b) => a * b }.sum + sqNorm(c))
        }
        .sortBy { case (i, d) => (d, i) }
        .take(nProbe)
        .map { case (i, _) => (qId, i) }
    }.toSeq.toDF("q_id", "cell")

    val cand = posting.join(broadcast(probeCells), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), col("v"))
      .join(broadcast(e.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))), Seq("q_id"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    val ivfTop = cand
      .select(col("q_id"), col("n_id"), Dedup.cosine(col("qv"), col("v")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"))
    val exactTop = bruteTopK(emb, nQueries, k).select(col("q_id"), col("n_id"))
    recallCheck(ivfTop, exactTop, recallFloor)
  }

  private def recallCheck(approxTop: DataFrame, exactTop: DataFrame,
                          recallFloor: Double): DataFrame = {
    val hits = approxTop.intersect(exactTop)
      .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
    exactTop.groupBy("q_id").agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        (coalesce(col("n_hit"), lit(0L)) >= lit(recallFloor) * col("n_exact")).as("recall_ok"))
      .orderBy("q_id")
  }
}
