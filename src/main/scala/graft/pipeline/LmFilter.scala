package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.pipeline.TextFunctions.words

/**
 * Language-model quality filtering — the perplexity-style companion
 * to the boilerplate removal in [[Dedup.dropBoilerplate]] (CCNet,
 * Wenzek et al. 2020, pairs exactly these two: dedup/boilerplate +
 * an LM trained on a trusted corpus scoring the crawl; Gopher and
 * LLaMA keep the same stage). A bigram LM with add-one smoothing is
 * trained on a trusted REFERENCE slice and every pool document is
 * scored by how much of it the model finds improbable.
 *
 * The filter decision is EXACT INTEGER arithmetic end-to-end, so the
 * DuckDB oracle replays it byte-for-byte (the discipline of
 * [[Selection]]'s cross-multiplied DSIR votes):
 *
 *   - model: `c2(g)` = count of bigram g in the reference,
 *     `c1(w)` = count of bigrams whose FIRST word is w (the
 *     conditional's denominator), `V` = distinct words in the
 *     reference (the add-one vocabulary);
 *   - a pool bigram (w1,w2) is RARE iff its smoothed conditional
 *     probability `(c2+1)/(c1+V) < 1/rarityDen`, evaluated without
 *     floats as `(c2+1) * rarityDen < c1 + V`;
 *   - per document: `n_bigrams`, `n_rare`, and the rare rate in
 *     exact per-mille `rare_pm = (1000*n_rare) div n_bigrams`; the
 *     keep rule compares `rare_pm` to a threshold the caller picks
 *     (the gate uses the corpus lower-median — a real ~50% split,
 *     like the decontamination gate's median overlap).
 *
 * True perplexity (the float the literature quotes) is exposed by
 * [[perplexity]] for users — `exp(-1/n * sum ln p)` — and unit-tested
 * against a hand computation; the gate hashes only the integer
 * columns because `ln` is not an IEEE correctly-rounded op, so its
 * last ulp may differ across engines (rare/keep decisions never
 * touch it).
 *
 * Scale shape (100 TB posture): the model build is one bigram-grained
 * partial aggregation over the REFERENCE slice only (build-once,
 * reused across scoring runs). Scoring joins pool bigrams to the
 * model on the gram key — the model side is one row per gram, so AQE
 * broadcasts it while it fits (the CCNet deployment shape: a pruned
 * KenLM of a few GB rides every node) and falls back to a shuffled
 * hash join keyed on the gram beyond that; hot stop-bigrams are
 * single model rows, and the doc-side exchange they skew is the same
 * one the salted-join operator (`q_skew_salted`) already handles.
 * The per-doc aggregate partial-aggregates map-side to one row per
 * (doc, partition). Documents with fewer than 2 words carry no
 * bigram and are not scored (degenerate docs are [[Curation]]'s
 * quality gate's job).
 */
object LmFilter {

  /** (g = "w1 w2", w1) bigram structs of a BOUND word-array column.
    * The column must be a projected attribute, not the raw split
    * expression: a lambda that closes over an unbound `split(text)`
    * re-evaluates the split per element — O(words²) regex splits per
    * document (measured 7.4 s of the 8 s text_lm_filter leg at
    * sf0.1). `zip_with` over two slices of the bound array is one
    * O(words) pass, and carrying w1 from the zip drops the per-gram
    * re-split the old `split(g, " ")[0]` projection paid. */
  private def bigramsOf(wc: Column): Column =
    zip_with(slice(wc, lit(1), size(wc) - 1), slice(wc, lit(2), size(wc) - 1),
      (a, b) => struct(concat(a, lit(" "), b).as("g"), a.as("w1")))

  private def docBigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").cast("long").as("doc_id"), col("source"),
        words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), col("source"),
        explode(bigramsOf(col("ws"))).as("e"))
      .select(col("doc_id"), col("source"),
        col("e.g").as("g"), col("e.w1").as("w1"))

  /**
   * Score every non-reference document against the bigram LM of
   * `refSource`. Output: (doc_id, source, n_bigrams, n_rare,
   * rare_pm) — one row per pool document with >= 1 bigram.
   */
  def rareBigramScore(docs: DataFrame, refSource: String,
                      rarityDen: Long = 50L): DataFrame = {
    require(rarityDen >= 1, s"rarityDen $rarityDen must be >= 1")
    val grams = docBigrams(docs)
    val isRef = col("source") === lit(refSource)

    // ONE aggregation pass over the reference bigrams builds the whole
    // model (g determines w1, so grouping by both is the same grouping
    // as by g alone), materialized once — the build-once LM artifact.
    // c1 (the conditional's denominator: ref bigrams whose first word
    // is w) is then the sum of c2 over that model table, not a second
    // explode of the reference slice.
    val model = grams.filter(isRef).groupBy("g", "w1")
      .agg(count(lit(1)).as("c2"))
      .localCheckpoint(true)
    val c2 = model.select("g", "c2")
    val c1 = model.groupBy("w1").agg(sum(col("c2")).as("c1"))
    // add-one vocabulary: distinct words ANYWHERE in the reference
    // (both bigram positions — i.e. every word of every ref doc)
    val vocab = docs.filter(isRef)
      .select(explode(words(col("text"))).as("w"))
      .agg(countDistinct("w").as("v"))

    grams.filter(!isRef)
      .join(c2, Seq("g"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("rare",
        (coalesce(col("c2"), lit(0L)) + 1L) * rarityDen <
          coalesce(col("c1"), lit(0L)) + col("v"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("rare"), 1L).otherwise(0L)).as("n_rare"))
      .withColumn("rare_pm", floor(col("n_rare") * 1000L / col("n_bigrams")).cast("long"))
      .select("doc_id", "source", "n_bigrams", "n_rare", "rare_pm")
  }

  /**
   * True bigram perplexity per pool document under the same add-one
   * model: `exp(-(sum ln((c2+1)/(c1+V))) / n_bigrams)`. Float output
   * for users/specs — see the scaladoc for why the gate hashes the
   * integer columns instead.
   */
  def perplexity(docs: DataFrame, refSource: String): DataFrame = {
    val grams = docBigrams(docs)
    val isRef = col("source") === lit(refSource)
    val ref = grams.filter(isRef)
    val c2 = ref.groupBy("g").agg(count(lit(1)).as("c2"))
    val c1 = ref.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = docs.filter(isRef)
      .select(explode(words(col("text"))).as("w"))
      .agg(countDistinct("w").as("v"))
    grams.filter(!isRef)
      .join(c2, Seq("g"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("lp",
        log((coalesce(col("c2"), lit(0L)) + 1L).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp").as("sum_lp"))
      .withColumn("ppl", exp(-col("sum_lp") / col("n_bigrams")))
      .select("doc_id", "source", "n_bigrams", "ppl")
  }
}
