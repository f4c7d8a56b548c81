package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextFunctions._

/**
 * Text-analysis operators for a large-scale training-data pipeline:
 * language ID, quality scoring, token counting, and document
 * fingerprinting — all over the `documents` table.
 *
 * Every metric is a row-local projection built from codegen'd builtins
 * (split/filter/aggregate/regexp/md5), so at 100 TB each of these is a
 * single parquet scan + WholeStageCodegen projection: no shuffle, no
 * UDF, no driver involvement. The formulas are deliberately
 * SQL-expressible so the DuckDB oracle replays them exactly.
 */
object TextOps {

  private def ws: Column = words(col("text"))

  /**
   * Stopword-profile language ID (see TextFunctions.StopwordProfiles):
   * per-language occurrence scores, argmax with fixed tie order
   * (alphabetical), "und" when no profile matches.
   */
  def langId(docs: DataFrame): DataFrame = {
    // bind the split once: each profile's score references the word
    // array, and an unbound `words(text)` re-splits per profile
    val bound = docs.select(col("doc_id").cast("long").as("doc_id"),
      col("lang").as("lang_label"), ws.as("ws"))
    val cols = Seq(col("doc_id"), col("lang_label")) ++
      TextFunctions.StopwordProfiles.map { case (l, stops) =>
        langScore(col("ws"), stops).as(s"score_$l")
      }
    val scored = bound.select(cols: _*)
    val scoreCols = TextFunctions.StopwordProfiles.map { case (l, _) => col(s"score_$l") }
    val m = greatest(scoreCols: _*)
    val pred = TextFunctions.StopwordProfiles.foldLeft(when(m === 0, "und")) {
      case (acc, (l, _)) => acc.when(col(s"score_$l") === m, l)
    }
    scored.withColumn("lang_pred", pred)
  }

  /**
   * Quality metrics: word/char counts, mean word length, type-token
   * ratio, stopword ratio, and a composite keep/drop decision — the
   * standard pre-training quality gates (cf. C4/Gopher filtering
   * rules), restricted to ones computable from this corpus.
   */
  def quality(docs: DataFrame): DataFrame = {
    // bind the split once: five metric expressions reference the word
    // array, and an unbound `words(text)` re-splits per metric
    val wc = col("ws")
    val nWords = size(wc)
    val sumWordLen = aggregate(transform(wc, w => length(w)), lit(0L), (a, x) => a + x)
    val nDistinct = size(array_distinct(wc))
    val stopHits = langScore(wc, TextFunctions.StopwordProfiles.toMap.apply("en"))
    docs.select(col("doc_id").cast("long").as("doc_id"),
        length(col("text")).as("n_chars_calc"), ws.as("ws"))
      .select(
      col("doc_id"),
      nWords.as("n_words"),
      col("n_chars_calc"),
      round(sumWordLen / nWords, 6).as("mean_word_len"),
      round(nDistinct.cast("double") / nWords, 6).as("type_token_ratio"),
      round(stopHits.cast("double") / nWords, 6).as("stopword_ratio"),
      (nWords.between(5, 2000) &&
        (nDistinct.cast("double") / nWords) >= 0.05 &&
        (sumWordLen / nWords).between(1.0, 20.0)).as("quality_keep"))
  }

  /**
   * Token counting two ways: whitespace words, and a BPE-ish regex
   * tokenizer (`[a-z]+|[0-9]+|punct`) — plus the n_tok invariant vs
   * the stored column.
   */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      size(ws).as("n_ws_tokens"),
      expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))").as("n_re_tokens"))

  /**
   * Document fingerprints: md5 content hash (exact-dup key) and a
   * 31-base polynomial rolling hash mod 1e9+7 over the byte stream —
   * both replayable in ANSI-ish SQL for the oracle. (The 64-bit
   * SimHash fingerprint is exercised by Dedup.simhashPairs, where its
   * near-dup property is what's under test.)
   */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      md5(col("text")).as("fp_md5"),
      // native single pass ([[RollingHash]]) — bit-identical to the
      // aggregate(transform(split(text, ''), ascii)) fold the oracle
      // replays, minus the interpreted lambda frame per character
      TextFunctions.rollingHash(col("text")).as("fp_rolling"))

  /**
   * Model-based quality filtering — the INFERENCE half of the
   * fastText-style classifier gate (Joulin et al. 2016; the CCNet /
   * GPT-3 quality-filter recipe): score = Σ over hashed bag-of-bigram
   * features of a weight-table lookup, keep = score > 0. At 100 TB
   * inference cost is the whole story: this is a parquet scan + one
   * codegen'd row-local projection — no shuffle, no UDF, no model
   * server round-trips.
   *
   * The weight table here is a deterministic integer function of the
   * feature bucket (millis in [-1000, 1000]), standing in for trained
   * weights so the DuckDB oracle can replay inference EXACTLY; a real
   * model drops in by replacing `weightOf` with an `element_at` on a
   * broadcast weight-array literal — the plan shape is identical.
   * Feature hashing reuses the corpus rolling-hash convention
   * ([[fingerprints]]), bucketed mod `dim`.
   */
  def qualityModel(docs: DataFrame, dim: Int = 512): DataFrame =
    // ONE native pass over the gram array ([[QualityScore]] — bit-
    // identical to the aggregate/transform higher-order form, whose
    // interpreted per-character lambda frames were the whole
    // inference cost of this scan-shaped filter)
    docs.select(
        col("doc_id").cast("long").as("doc_id"),
        TextFunctions.qualityScore(TextFunctions.shingles(ws, 2), dim).as("qs"))
      .select(
        col("doc_id"),
        col("qs.n_features").as("n_features"),
        col("qs.score_milli").as("score_milli"))
      .withColumn("keep", col("score_milli") > 0)

  /**
   * Gopher-style repetition filtering (Rae et al. 2021 §A1.1): per
   * document, the character coverage of the most frequent word 2-gram
   * and of all duplicated 3-grams, plus the keep rule — drop when the
   * top 2-gram covers more than 1/5 of the document's characters or
   * duplicated 3-grams cover more than 3/20 (the published 0.20/0.15
   * thresholds as exact integer comparisons; overlapping grams count
   * each occurrence's characters, the Gopher convention).
   *
   * The stats come from [[TextFunctions.repetitionStats]] — one native
   * row-local pass per document — so the whole filter is a parquet
   * scan + codegen'd projection: nothing shuffles, which is the only
   * acceptable shape for a filter that reads all 100 TB. (The oracle
   * replays the explode → groupBy form in SQL; integer counts and a
   * total tie-break make the two forms byte-equal.)
   */
  def repetition(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id").cast("long").as("doc_id"),
        length(col("text")).as("n_chars_doc"),
        ws.as("ws"))
      .select(
        col("doc_id"),
        col("n_chars_doc"),
        repetitionStats(col("ws"), 2).as("r2"),
        repetitionStats(col("ws"), 3).as("r3"))
      .select(col("doc_id"), col("n_chars_doc"),
        col("r2.n_grams").as("g2"), col("r2.top_cnt").as("top2_cnt"),
        col("r2.top_chars").as("top2_chars"), col("r2.dup_chars").as("dup2_chars"),
        col("r3.n_grams").as("g3"), col("r3.top_cnt").as("top3_cnt"),
        col("r3.top_chars").as("top3_chars"), col("r3.dup_chars").as("dup3_chars"),
        (col("r2.top_chars") * 5 <= col("n_chars_doc") &&
          col("r3.dup_chars") * 20 <= col("n_chars_doc") * 3).as("rep_keep"))

  /** Email-address pattern: simple char classes only (no backslash
    * escapes — `[.]` instead of `\.`), so the Java (Spark) and RE2
    * (DuckDB/production scrubbers) dialects agree AND the pattern
    * survives SQL string-literal escaping verbatim. Explicit `A-Z`
    * ranges instead of a case-insensitivity flag: both dialects match
    * case-sensitively by default and their flag syntaxes differ, so
    * spelling the ranges out is what keeps the dialect intersection. */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}"
  /** Long digit runs (ids, phone-ish numbers). */
  val NumberPattern = "[0-9]{6,}"

  /**
   * PII redaction — the scrub every shipped training corpus runs
   * before release: replace email addresses and long digit runs with
   * typed placeholder tokens, and count what was removed (the
   * redaction-rate metric reviewers audit). Row-local codegen'd
   * regexes: at 100 TB this is scan + projection, nothing else. The
   * patterns stay in the dialect intersection of Java and RE2 regex
   * so the oracle (and a production RE2 scrubber) replays them
   * byte-identically.
   *
   * Counts are counts of redactions PERFORMED: `n_numbers` is
   * computed on the email-redacted intermediate, because the number
   * replacement also runs after the email replacement — a digit run
   * inside an email address is scrubbed as part of `<EMAIL>` and must
   * not inflate the `<NUM>` audit count.
   */
  def redactPii(docs: DataFrame): DataFrame = {
    val emailRedacted = regexp_replace(col("text"), EmailPattern, "<EMAIL>")
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      regexp_replace(emailRedacted, NumberPattern, "<NUM>").as("text_clean"),
      expr(s"size(regexp_extract_all(text, '$EmailPattern', 0))")
        .cast("int").as("n_emails"),
      size(expr(s"regexp_extract_all(regexp_replace(text, '$EmailPattern', '<EMAIL>'), '$NumberPattern', 0)"))
        .cast("int").as("n_numbers"))
  }

  /**
   * One-pass per-source corpus datacard — the summary table every
   * released training corpus ships with: document counts, EXACT
   * distinct-text counts (the honest denominator for a duplication
   * rate; the sketch gates cover the approximate path), duplicate-doc
   * counts, and character-volume totals/extrema.
   *
   * Two-phase shape built for 100 TB: phase 1 groups on
   * `(source, md5(text))` — a 128-bit key space, so no hot keys and
   * the map-side partial absorbs within-partition duplicate cliques;
   * its exchange carries (source, digest, count, len) rows, never
   * text. Phase 2 is a |distinct texts|-input, |sources|-output
   * aggregation. All outputs are exact integers (no float columns),
   * so the datacard is byte-stable across engines and reruns.
   */
  def corpusStats(docs: DataFrame): DataFrame =
    docs.select(col("source"), md5(col("text")).as("fp"),
        length(col("text")).cast("long").as("len"))
      .groupBy("source", "fp")
      .agg(count(lit(1)).as("cnt"), min("len").as("len"))
      .groupBy("source")
      .agg(
        sum("cnt").as("n_docs"),
        count(lit(1)).as("n_distinct_texts"),
        (sum("cnt") - count(lit(1))).as("n_dup_docs"),
        sum(col("len") * col("cnt")).as("n_chars_total"),
        min("len").as("min_chars"),
        max("len").as("max_chars"))

  /**
   * Per-document novelty scoring over the token table — the
   * memorization-exposure audit (Lee et al. 2022's coverage measure,
   * as a SCORE rather than a cut): for each doc, how many of its
   * sliding L-token windows also occur in at least one OTHER
   * document. High-shared docs are boilerplate/duplication hotspots;
   * the score ranks them without mutating the corpus (the companion
   * to [[Dedup.substringDedup]], which cuts).
   *
   * Shares [[Dedup.substringWindows]]'s rolling 64-bit window keys,
   * so score and cut can never disagree about what "a window" is.
   * Scale shape: the posexplode is row-local O(corpus tokens)
   * (inherent to any exact-substring measure); the cross-doc vote is
   * a distinct + count on (wkey) — 64-bit keys and doc ids on the
   * exchange, never tokens; the shared-key set is
   * duplication-proportional, so the join back to window occurrences
   * broadcasts under AQE; the closing per-doc count partial-
   * aggregates map-side. Key collisions are the same N²/2⁶⁴ trade as
   * the substring gates — the oracle groups on raw window token text,
   * so a collision fails the gate rather than hiding.
   */
  def novelty(toks: DataFrame, L: Int = 8): DataFrame = {
    require(L >= 2, s"window length $L")
    val base = Dedup.substringBase(toks)
    // both the cross-doc vote and the per-doc count read the window
    // table — materialize the posexplode + per-window hash pass once
    // (same discipline as substringDedup)
    val wins = Dedup.substringWindows(base, L).localCheckpoint(true)
    val shared = wins.select(col("doc_id"), col("wkey")).distinct()
      .groupBy("wkey").agg(count(lit(1)).as("nd"))
      .filter(col("nd") > 1).select("wkey")
    val perDoc = wins.join(shared, "wkey")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    val nWin = greatest(col("n_tok") - (L - 1), lit(0))
    base.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("n_tok").cast("int").as("n_tok"),
        nWin.cast("int").as("n_windows"),
        coalesce(col("n_shared"), lit(0L)).cast("int").as("n_shared_windows"),
        (nWin - coalesce(col("n_shared"), lit(0L))).cast("int").as("n_novel_windows"))
  }

  /**
   * Corpus version diff — the audit between two releases of the same
   * table: per source, how many docs were added, removed, changed
   * (same doc_id, different text), or unchanged. The companion to
   * [[corpusStats]] (one snapshot) and the snapshot/MERGE family
   * (which WRITES versions; this op explains what changed between
   * them).
   *
   * Scale shape: both sides are projected to (doc_id, md5(text),
   * source) BEFORE the full-outer join, so the join exchange carries
   * digests, never text; doc_id is a unique key on both sides, so
   * there is no multiplicity blow-up and AQE is free to pick a
   * broadcast side when one snapshot is small (the nightly-delta
   * case). Classification is row-local; the closing aggregation is
   * |sources|-sized with map-side partials.
   */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    def keyed(d: DataFrame, suffix: String): DataFrame =
      d.select(col("doc_id").cast("long").as("doc_id"),
        md5(col("text")).as(s"fp_$suffix"), col("source").as(s"src_$suffix"))
    keyed(oldDocs, "o").join(keyed(newDocs, "n"), Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("src_n"), col("src_o")).as("source"),
        when(col("fp_o").isNull, "added")
          .when(col("fp_n").isNull, "removed")
          .when(col("fp_o") =!= col("fp_n"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("source")
      .agg(
        sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("status") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("status") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"))
  }
}
