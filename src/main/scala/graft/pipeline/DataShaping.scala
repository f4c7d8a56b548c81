package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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

  /**
   * Concat-then-split context chunking — the OTHER standard way
   * training corpora batch into fixed windows (packSequences bins
   * whole documents; here each source's token stream is conceptually
   * CONCATENATED in doc_id order and cut into exact `ctx`-token
   * chunks, so documents straddle chunk boundaries instead of
   * leaving tail slack). Emits one row per document with the half-
   * open global offset range it occupies and the first/last chunk
   * ids it touches — the narrow per-doc form; exploding to one row
   * per (doc, chunk) is a row-local `sequence()` away and never
   * needed for boundary accounting.
   *
   * The global per-source offsets reuse [[packSequences]]'s
   * distributed two-phase prefix sum (same bitwise-exact integer
   * arithmetic, same S×B-bounded driver round-trip, no
   * one-task-per-source window), so chunk assignment is a scan +
   * one bucketed exchange at any corpus size.
   */
  def chunkTokenStream(tokenTable: DataFrame, ctx: Long,
                       targetBuckets: Int = 1024): DataFrame = {
    require(ctx > 0)
    packSequences(tokenTable.filter(col("n_tok") > 0), ctx, targetBuckets)
      .withColumn("start_off", col("cum_tok") - col("n_tok"))
      .withColumn("first_chunk", expr(s"start_off div ${ctx}L"))
      .withColumn("last_chunk", expr(s"(cum_tok - 1L) div ${ctx}L"))
      .withColumn("crosses_chunk", col("last_chunk") > col("first_chunk"))
      .select("source", "doc_id", "n_tok", "start_off",
        "first_chunk", "last_chunk", "crosses_chunk")
  }

  /** 2^32 — the hash space of the 8-hex-char uniform used by the
    * priority sampler (32 bits, not the KMV's 48, so that
    * `w * HexSpace32` stays inside a Long for any weight < 2^30 —
    * a 2^30-token document is a terabyte of text). */
  val HexSpace32: Long = 1L << 32

  /**
   * Deterministic weighted top-n sampling by PRIORITY SAMPLING
   * (Duffield, Lund, Thorup, JACM 2007): each row gets priority
   * q_i = w_i / u_i with u_i uniform in (0,1]; the n largest
   * priorities are the sample, and with τ = the (n+1)-th priority
   * the estimator Σ max(w_i, τ) over the sample is (near-)unbiased
   * for the population's total weight.
   *
   * Everything is exact integer arithmetic on a deterministic
   * 32-bit uniform (first 8 hex chars of md5(doc_id), the engine's
   * standard content-independent coin): q = (w · 2^32) div u32 —
   * so the sample is reproducible across runs AND engines, and the
   * DuckDB oracle replays it byte-exact. Ties (repeated q) break by
   * doc_id.
   *
   * Scale: `orderBy(...).limit(n)` plans as TakeOrderedAndProject —
   * per-partition top-n heaps merged once, no global sort, no full
   * shuffle. τ comes from the same top-(n+1) funnel (a one-scalar
   * driver round-trip, not row data). The returned sample keeps
   * `est_w = max(w, τ)` per row plus `est_ok`, the estimator-vs-
   * exact-total check computed in-plan.
   */
  def prioritySample(docs: DataFrame, n: Int, weight: Column,
                     estTolPct: Int = 30): DataFrame = {
    require(n > 0)
    val base = docs
      .withColumn("doc_id", col("doc_id").cast("long"))
      .withColumn("w", weight.cast("long"))
      .filter(col("w") > 0)
      .withColumn("u32", expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint) + 1"))
      .withColumn("q", expr(s"(w * ${HexSpace32}L) div u32"))
    val topN1 = base.orderBy(col("q").desc, col("doc_id")).limit(n + 1)
      .select("source", "doc_id", "w", "q").cache()
    try {
      // τ = the (n+1)-th priority (0 when the population fits in n):
      // the SMALLEST q of the top-(n+1) funnel iff it holds n+1 rows.
      // The collect is the already-funneled O(n) key set, not corpus
      // row data — the same bounded driver round-trip as packSequences'
      // offset table.
      val funnel = topN1.collect()
      val tau = if (funnel.length == n + 1)
        funnel.map(r => (r.getLong(3), r.getLong(1))).min._1 else 0L
      val kept = topN1.orderBy(col("q").desc, col("doc_id")).limit(n)
        .withColumn("est_w", greatest(col("w"), lit(tau)))
      val totals = base.agg(sum("w").as("w_total"))
      kept.crossJoin(broadcast(totals))
        .withColumn("est_total", sum(col("est_w")).over(
          Window.partitionBy(lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("est_ok",
          abs(col("est_total") - col("w_total")) * 100 <= col("w_total") * estTolPct)
        .select("source", "doc_id", "w", "q", "est_w", "est_ok")
    } finally topN1.unpersist()
  }

  /**
   * Token-budget MIXTURE sampling — the data-mixing step of a corpus
   * release (cf. The Pile / LLaMA source weighting): given per-source
   * mixture weights and a token budget expressed as a fraction
   * `budgetNum/budgetDen` of the corpus (scale-free: the same call
   * works at sf0.01 and at 100 TB), each source's keep rate is
   *
   *   rate4096_s = min(4096, (T · budgetNum · w_s · 4096)
   *                          div (budgetDen · ΣW · actual_s))
   *
   * — i.e. its token target `B · w_s / ΣW` over its actual tokens,
   * quantized to 1/4096ths in ONE integer floor-division so the
   * DuckDB oracle replays it exactly (BigInt here, HUGEINT there).
   * A document keeps iff its 12-bit md5 coin < rate: the same
   * content-independent, engine-reproducible coin as
   * [[stratifiedSample]], so the whole sample is a scan-level filter.
   *
   * Scale: phase 1 is a map-side-combined per-source token total (S
   * tiny rows to the driver), phase 2 a broadcast-joined row-local
   * filter. Sources missing from `weights` get weight `defaultW`.
   */
  def mixtureSample(tokenTable: DataFrame, weights: Map[String, Long],
                    budgetNum: Long, budgetDen: Long,
                    defaultW: Long = 1L): DataFrame =
    mixtureSampleWith(tokenTable, _ => weights, budgetNum, budgetDen, defaultW)

  /** [[mixtureSample]] with the weights derived FROM the per-source
    * token totals it already collects — one corpus aggregation, not
    * two, when the weighting is a function of size (temperature
    * mixing). `deriveWeights` runs on the driver over the S-row
    * totals map. */
  def mixtureSampleWith(tokenTable: DataFrame,
                        deriveWeights: Map[String, Long] => Map[String, Long],
                        budgetNum: Long, budgetDen: Long,
                        defaultW: Long = 1L): DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0 && defaultW >= 0)
    val spark = tokenTable.sparkSession
    val base = tokenTable.select(
      col("source"), col("doc_id").cast("long").as("doc_id"),
      col("n_tok").cast("int").as("n_tok"))
    val totals = base.groupBy("source").agg(sum("n_tok").as("actual")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val weights = deriveWeights(totals)
    require(weights.values.forall(_ >= 0))
    val t = totals.values.sum
    // keysIterator, not keys.map: a Set.map would DEDUPLICATE equal
    // weights before summing
    val wsum = totals.keysIterator.map(s => weights.getOrElse(s, defaultW)).sum
    val rates: Seq[(String, Int)] = totals.toSeq.map { case (s, actual) =>
      val w = weights.getOrElse(s, defaultW)
      val r = (BigInt(t) * budgetNum * w * 4096) /
        (BigInt(budgetDen) * wsum * actual)
      s -> math.min(4096L, r.toLong).toInt
    }
    import spark.implicits._
    val rateDf = rates.toDF("source", "rate4096")
    base.join(broadcast(rateDf), Seq("source"))
      .withColumn("coin", expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 3), 16, 10) as int)"))
      .filter(col("coin") < col("rate4096"))
      .select("source", "doc_id", "n_tok", "rate4096", "coin")
  }

  /**
   * α-temperature mixture weights — the standard source-weighting knob
   * of corpus mixing (The Pile / GPT-3 / LLaMA sample sources with
   * probability ∝ n_s^α: α=1 is proportional-to-size, α→0 uniform,
   * intermediate α up-weights small sources). Exposed at the one
   * exponent that is EXACT in integer arithmetic — α = 1/2 via
   * floor-sqrt of each source's token total — so the rates
   * [[mixtureSample]] derives from these weights stay
   * engine-reproducible and the DuckDB oracle replays the whole chain:
   * `floor(sqrt(n))` over BIGINT agrees bit-for-bit between JVM and
   * DuckDB for every `n < 2^52` (the IEEE sqrt is correctly rounded,
   * and below 2^52 the rounding error 1/(2·sqrt(n)) can never cross an
   * integer boundary — at a true 10^12-token source, totals approach
   * that bound and the caller should aggregate in larger units or
   * compute the integer sqrt exactly). One tiny per-source aggregate:
   * S rows to the driver, the same bounded round-trip
   * [[mixtureSample]] itself already makes for the totals.
   */
  def temperatureWeightsSqrt(tokenTable: DataFrame): Map[String, Long] =
    temperatureWeightsSqrt(
      tokenTable.groupBy("source")
        .agg(sum(col("n_tok").cast("long")).as("actual"))
        .collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .toMap)

  /** The same floor-sqrt weighting as a pure function of per-source
    * totals — pass to [[mixtureSampleWith]] so the corpus is
    * aggregated ONCE (the table-taking overload exists for callers
    * who need the weights standalone). */
  def temperatureWeightsSqrt(totals: Map[String, Long]): Map[String, Long] =
    totals.map { case (s, n) => s -> math.sqrt(n.toDouble).toLong }

  /**
   * Deterministic per-epoch global shuffle — the data-order step of a
   * training run: epoch `e` reads the corpus in the order of
   * `md5(e || ':' || doc_id)`, so every epoch is a different
   * permutation, every permutation is reproducible across runs,
   * engines, and partitionings (the coin is content-independent), and
   * a resumed job can recompute any row's position without state.
   * Emits `(epoch, doc_id, pos)` with `pos` the 0-based global rank
   * by `(shuffle_key, doc_id)` within the epoch.
   *
   * Global ranking without a global sort OR a one-task window: the
   * first `bucketHexChars` hex chars of the key form 16^c uniform
   * buckets that are PREFIXES of the sort key (bucket order == key
   * order), so phase 1 counts rows per (epoch, bucket) — a map-side-
   * combined agg whose output is epochs × 16^c tiny rows prefix-summed
   * on the driver — and phase 2 ranks within each bucket and adds the
   * bucket's starting offset. Same two-phase discipline as
   * [[packSequences]]: the driver round-trip carries offsets, never
   * rows, and parallelism is 16^c per epoch instead of 1.
   */
  def epochShuffle(docs: DataFrame, epochs: Seq[Int],
                   bucketHexChars: Int = 2): DataFrame = {
    require(epochs.nonEmpty && bucketHexChars >= 1 && bucketHexChars <= 8)
    val spark = docs.sparkSession
    val keyed = docs
      .select(col("doc_id").cast("long").as("doc_id"))
      .withColumn("epoch", explode(array(epochs.map(e => lit(e)): _*)))
      .withColumn("skey", md5(concat(col("epoch").cast("string"), lit(":"),
        col("doc_id").cast("string"))))
      .withColumn("bucket",
        expr(s"cast(conv(substring(skey, 1, $bucketHexChars), 16, 10) as int)"))
    // phase 1: per-(epoch, bucket) row counts -> driver prefix sum
    val counts = keyed.groupBy("epoch", "bucket").count().collect()
    val starts: Seq[(Int, Int, Long)] = counts
      .groupBy(_.getInt(0)).toSeq.flatMap { case (e, rows) =>
        var acc = 0L
        rows.sortBy(_.getInt(1)).map { r =>
          val s = acc; acc += r.getLong(2); (e, r.getInt(1), s)
        }
      }
    import spark.implicits._
    val startDf = starts.toDF("epoch", "bucket", "bucket_start")
    // phase 2: within-bucket rank + bucket offset (bucket is a key
    // prefix, so this equals the global row_number by (skey, doc_id))
    val w = Window.partitionBy("epoch", "bucket").orderBy("skey", "doc_id")
    keyed.join(broadcast(startDf), Seq("epoch", "bucket"))
      .withColumn("pos", col("bucket_start") + row_number().over(w) - 1)
      .select(col("epoch"), col("doc_id"), col("pos").cast("long").as("pos"))
  }

  /**
   * Leakage-free train/val/test split: every member of a near-dup
   * cluster is assigned the SAME split, so a document's near-copy can
   * never sit in eval while the document trains (the leakage mode a
   * per-doc coin cannot prevent, and the reason eval decontamination
   * alone is insufficient once near-dups exist WITHIN the corpus).
   *
   * `clusterLabels` is any `(doc_id, cluster_rep)` frame — in
   * production [[Dedup.nearDupClustersLsh]]'s output, so the pair
   * generation is the banded LSH shape. The split coin is the first
   * md5 nibble of the CLUSTER REP (not the doc): `< trainSlots` →
   * train, `< trainSlots+valSlots` → val, else test (out of 16).
   * Docs in no cluster are their own rep. Deterministic,
   * content-independent, engine-reproducible — the same coin family
   * as [[stratifiedSample]].
   *
   * Scale: one left join keyed on doc_id (labels are (id, rep) pairs
   * — digest-grained, never text) + a row-local coin; the join side
   * is only the clustered docs (near-dup members), which AQE
   * broadcasts when duplication is sparse.
   */
  def leakFreeSplit(docs: DataFrame, clusterLabels: DataFrame,
                    trainSlots: Int = 12, valSlots: Int = 2): DataFrame = {
    require(trainSlots >= 1 && valSlots >= 0 && trainSlots + valSlots <= 16)
    val labels = clusterLabels.select(col("doc_id").cast("long").as("doc_id"),
      col("cluster_rep").cast("long").as("cluster_rep"))
    docs.select(col("doc_id").cast("long").as("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("cluster_rep"), col("doc_id")))
      .withColumn("nibble", expr(
        "locate(substring(md5(cast(rep AS string)), 1, 1), '0123456789abcdef') - 1")
        .cast("int"))
      .select(col("doc_id"), col("rep"),
        when(col("nibble") < trainSlots, "train")
          .when(col("nibble") < trainSlots + valSlots, "val")
          .otherwise("test").as("split"))
  }
}
