package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * BPE-style merge training over a corpus (Sennrich et al. 2016,
 * "Neural Machine Translation of Rare Words with Subword Units" —
 * the tokenizer-training pass of every LLM data pipeline).
 *
 * Structure, not a toy: the corpus is first collapsed to its
 * WORD-FREQUENCY table by one distributed groupBy (map-side combine,
 * one shuffle whose width is the vocabulary, not the corpus). All R
 * merge rounds then iterate over that table — so at 100 TB the
 * per-round cost is O(|vocab|), independent of corpus size, and each
 * round is one pair-count shuffle + a 1-row driver round-trip for
 * the argmax (the only driver traffic).
 *
 * Merge application semantics are deliberately the portable
 * single-pass `replace` (left-to-right, resume AFTER the
 * replacement, symbols space-delimited with sentinel spaces): both
 * the JVM and DuckDB implement exactly this scan, so the oracle
 * replays every round byte-for-byte. This differs from canonical
 * BPE only on immediately-adjacent repeated occurrences: the resume
 * point skips the symbol that ended a replacement, so `a a a a`
 * becomes `aa a a` in one round (canonical BPE gives `aa aa`) and
 * the leftover pair merges in a later round. No asymptotics change
 * and determinism holds across engines.
 *
 * Tie-break: highest count, then (lhs, rhs) lexicographic — total
 * order, so training is reproducible on any cluster layout.
 */
object Bpe {

  /** (round, lhs, rhs, pair_count) for `rounds` merge rounds. */
  def train(docs: DataFrame, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    // corpus -> word-frequency table, symbols space-separated chars
    val words = docs
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(trim(regexp_replace(col("w"), "(.)", "$1 ")).as("seq"), col("cnt"))
      .cache()
    try {
      var seqs = words
      val merges = Seq.newBuilder[(Int, String, String, Long)]
      var r = 1
      var exhausted = false
      while (r <= rounds && !exhausted) {
        val arr = split(col("seq"), " ")
        val top = seqs
          .select(col("cnt"),
            explode(arrays_zip(
              slice(arr, lit(1), size(arr) - 1),
              slice(arr, lit(2), size(arr) - 1))).as("p"))
          .groupBy(col("p").getField("0").as("lhs"), col("p").getField("1").as("rhs"))
          .agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("lhs"), col("rhs"))
          .limit(1)
          .collect()
        top.headOption match {
          case None => exhausted = true
          case Some(Row(l: String, rr: String, c: Long)) =>
            require(l.matches("[a-z0-9]+") && rr.matches("[a-z0-9]+"),
              s"BPE symbols must be alphanumeric to inline safely: '$l' '$rr'")
            merges += ((r, l, rr, c))
            seqs = seqs.select(
              trim(expr(s"replace(' ' || seq || ' ', ' $l $rr ', ' $l$rr ')")).as("seq"),
              col("cnt"))
          case Some(other) => sys.error(s"unexpected row $other")
        }
        r += 1
      }
      import spark.implicits._
      merges.result().toDF("round", "lhs", "rhs", "pair_count")
    } finally words.unpersist()
  }

  /** DuckDB replay of `train`: one CTE chain per round, same
    * pair-count, same (c DESC, lhs, rhs) argmax, same single-pass
    * replace application. */
  def oracleSql(rounds: Int): String = {
    val sb = new StringBuilder
    sb.append("WITH w0 AS (SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS seq, ")
      .append("CAST(count(*) AS BIGINT) AS cnt FROM ")
      .append("(SELECT unnest(regexp_split_to_array(text, '\\s+')) AS w FROM documents) GROUP BY 1)")
    for (r <- 1 to rounds) {
      val prev = s"w${r - 1}"
      sb.append(s", p$r AS (SELECT ws[i] AS lhs, ws[i+1] AS rhs, CAST(sum(cnt) AS BIGINT) AS c ")
        .append(s"FROM (SELECT regexp_split_to_array(seq, ' ') AS ws, cnt FROM $prev) t, ")
        .append("unnest(range(1, len(ws))) AS u(i) GROUP BY 1, 2)")
      sb.append(s", m$r AS (SELECT lhs, rhs, c FROM p$r ORDER BY c DESC, lhs, rhs LIMIT 1)")
      if (r < rounds)
        sb.append(s", w$r AS (SELECT trim(replace(' ' || seq || ' ', ")
          .append(s"' ' || (SELECT lhs FROM m$r) || ' ' || (SELECT rhs FROM m$r) || ' ', ")
          .append(s"' ' || (SELECT lhs FROM m$r) || (SELECT rhs FROM m$r) || ' ')) AS seq, cnt FROM $prev)")
    }
    sb.append(" SELECT * FROM (")
    sb.append((1 to rounds).map(r =>
      s"SELECT $r AS round, lhs, rhs, c AS pair_count FROM m$r").mkString(" UNION ALL "))
    sb.append(") ORDER BY round")
    sb.toString
  }
}
