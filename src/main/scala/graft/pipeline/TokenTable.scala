package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The engine's primary input: a table of pre-tokenized training
 * sequences `(doc_id string, tokens array<int32>, n_tok int32,
 * source string)` per BASELINE.json's input_hint, derived
 * DETERMINISTICALLY from the sandbox `documents` table so a DuckDB
 * oracle can reproduce every row:
 *
 *   tokens = words of `text` mapped to their index in the fixed,
 *            sorted vocabulary below; n_tok = size(tokens).
 *
 * At 100 TB the same derivation is a parquet/Iceberg scan + one
 * codegen'd `transform(split(...))` projection — no shuffle, no UDF.
 */
object TokenTable {

  /** The corpus vocabulary, sorted; token id = index in this array. */
  val Vocab: Array[String] = Array(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")

  /** SQL array literal of the vocab, shared by Spark and DuckDB text. */
  def vocabSqlArray: String = Vocab.map(w => s"'$w'").mkString("array(", ", ", ")")
  def vocabDuckArray: String = Vocab.map(w => s"'$w'").mkString("[", ", ", "]")

  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** The token table (doc_id, tokens, n_tok, source). The vocab
    * lookup is the native [[VocabIds]] pass (element-identical to
    * `transform(split(text), w -> array_position(vocab, w) - 1)`),
    * and `n_tok` counts the tokens array itself (transform preserves
    * cardinality, so it equals the split's size) — one split per row
    * instead of two, no per-word vocab scan. */
  def load(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir).select(
        col("doc_id").cast("string").as("doc_id"),
        TextFunctions.vocabIds(TextFunctions.words(col("text")), Vocab.toSeq).as("tokens"),
        col("source"))
      .select(col("doc_id"), col("tokens"),
        expr("cast(size(tokens) as int)").as("n_tok"), col("source"))

  /** Exploded (doc_id, source, token:int) view — the bulk-insert feed. */
  def tokens(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir).select(
      col("doc_id"), col("source"), explode(col("tokens")).as("token"))
}
