package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import TextFunctions.words

/**
 * Sparse lexical retrieval — the inverted-index + BM25 stack every
 * large-scale corpus pipeline leans on (retrieval-shaped
 * decontamination, domain selection by query affinity, boilerplate
 * hunting, "find the training doc that answered this eval question").
 * The reference serves set-membership at this position
 * (`csrc/bloomd`: is this key in the corpus?); BM25 is the ranked
 * generalization: WHICH corpus docs match this bag of terms, and how
 * well.
 *
 * Shape, Spark-first:
 *
 *   1. `invertedIndex` — one explode + one hash agg: postings
 *      (term, doc_id, tf, dl). At 100 TB this is the build-once
 *      artifact (write it bucketed by term); everything below reads
 *      it.
 *   2. `termStats` — df per term + the corpus scalars (N, total_len).
 *      Map-side partial agg absorbs the Zipf head: the exchange
 *      carries one row per (partition, term), never one per posting.
 *   3. `bm25TopK` — queries are the SMALL side by construction, so
 *      the per-term stats for JUST the query vocabulary join against
 *      postings as a broadcast; the only exchange carrying data
 *      proportional to the corpus is the (q_id, doc_id) score agg,
 *      whose input is restricted to postings of query terms. Top-k
 *      ranks with `row_number` ≤ k, which Spark 4 plans as a map-side
 *      WindowGroupLimit: the rank shuffle carries O(queries × k)
 *      rows per partition, not every scored doc.
 *
 * Determinism for the oracle: per-term contributions are fixed-point
 * (round(x · 1e6) as BIGINT) BEFORE the sum, so the per-(query, doc)
 * score is an exact integer — associative, order-free, bit-identical
 * in Spark and DuckDB. Ties rank by ascending doc_id.
 *
 * Skew: a stop-term's posting list is the classic hot key. `maxDf`
 * drops terms with df > maxDf from SCORING (idf ≈ 0 makes them
 * near-noise anyway) — the cap applies identically on both sides of
 * the oracle, mirroring `Dedup.ngramJaccardPairs(maxShingleDocs)`.
 */
object Retrieval {

  /** Posting lists: (term, doc_id, tf, dl), one row per distinct term
    * per doc. `dl` (doc length in tokens) rides the posting so
    * scoring never re-joins the corpus. A document's words all live
    * in its own row, so the per-(term, doc) counts come from one
    * row-local pass ([[graft.pipeline.WordCounts]]) — the index
    * build is scan + explode with NO aggregation operator (the
    * explode + groupBy form exchanged the same rows just to count
    * what was already colocated). */
  def invertedIndex(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id").cast("long").as("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"), size(col("ws")).as("dl"),
        explode(TextFunctions.wordCounts(col("ws"))).as("e"))
      .select(col("e.term").as("term"), col("doc_id"), col("dl"),
        col("e.tf").as("tf"))

  /** Document frequency per term. Input: `invertedIndex` output. */
  def termStats(index: DataFrame): DataFrame =
    index.groupBy("term").agg(count(lit(1)).as("df"))

  /** Corpus scalars (n_docs, total_len) from the index — one tiny agg
    * over the per-doc lengths. */
  def corpusStats(index: DataFrame): DataFrame =
    index.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))

  /**
   * BM25 top-k over a prebuilt index: `queries` is (q_id, terms:
   * array<string>) — scored as a SET of terms (standard short-query
   * BM25; duplicate query terms count once).
   *
   * Output: (q_id, rank, doc_id, score_micros, tfidf_micros) with
   * rank 1..k by (score_micros desc, doc_id asc).
   *
   *   idf      = ln(1 + (N − df + 0.5)/(df + 0.5))   (Lucene form)
   *   tfnorm   = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
   *   score    = Σ_terms round(idf · tfnorm · 1e6)
   *   tfidf    = Σ_terms round(tf · ln(N/df) · 1e6)  (classic, for
   *              pipelines that want the unsaturated variant)
   */
  def bm25TopK(index: DataFrame, queries: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               maxDf: Long = Long.MaxValue): DataFrame =
    // postings repartitioned by doc_id before scoring: the in-query
    // exchange is index-sized (cheap), and HashPartitioning(doc_id)
    // satisfies the score agg's ClusteredDistribution(q_id, doc_id) —
    // so the (postings x queries) contribution set, which is strictly
    // larger whenever >1 query shares a term, never crosses an
    // exchange (the streaming path gets the same shape by CACHING the
    // index doc_id-partitioned, amortized across micro-batches)
    bm25FromIndex(index.repartition(col("doc_id")),
      termStats(index).crossJoin(broadcast(corpusStats(index))),
      queries, k, k1, b, maxDf)

  /**
   * Scoring against PREBUILT static sides — `stats` is
   * `termStats(index).crossJoin(corpusStats(index))`, i.e. one
   * vocab-sized table (term, df, n_docs, total_len). This is the
   * streaming entry point: the index and stats are computed once,
   * cached, and every query micro-batch reuses them.
   */
  def bm25FromIndex(index: DataFrame, stats: DataFrame, queries: DataFrame,
                    k: Int, k1: Double = 1.2, b: Double = 0.75,
                    maxDf: Long = Long.MaxValue): DataFrame = {
    require(k >= 1, s"k=$k")
    val qterms = queries
      .select(col("q_id").cast("long").as("q_id"), explode(col("terms")).as("term"))
      .distinct()
    // stats for just the query vocabulary: |distinct query terms| rows
    val qstats = stats
      .join(qterms.select("term").distinct(), Seq("term"))
      .filter(col("df") <= maxDf)
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("idf2", log(col("n_docs").cast("double") / col("df")))
      .withColumn("avgdl", col("total_len").cast("double") / col("n_docs"))
      .select("term", "idf", "idf2", "avgdl")
    // ONE broadcast join against the postings: (q_id, term, idf,
    // idf2, avgdl) is still query-vocabulary-sized, and pre-joining
    // the two tiny sides halves the per-posting probe work (the old
    // shape probed two broadcast hash tables per posting row)
    val qside = qterms.join(qstats, Seq("term"))
    val contrib = index
      .join(broadcast(qside), Seq("term"))
      .withColumn("tfnorm",
        col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .select(col("q_id"), col("doc_id"),
        round(col("idf") * col("tfnorm") * lit(1e6)).cast("long").as("c_bm25"),
        round(col("tf") * col("idf2") * lit(1e6)).cast("long").as("c_tfidf"))
    val scored = contrib.groupBy("q_id", "doc_id")
      .agg(sum(col("c_bm25")).as("score_micros"), sum(col("c_tfidf")).as("tfidf_micros"))
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("score_micros").desc, col("doc_id").asc)))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("int").as("rank"),
        col("doc_id"), col("score_micros"), col("tfidf_micros"))
  }

  /**
   * Incremental maintenance — the crawl-append path: postings of
   * DISJOINT doc sets merge by plain union (tf and dl are per-doc
   * facts, so no posting is ever rewritten), and [[mergeStats]] adds
   * df/scalars. A 100 TB index is never rebuilt; each crawl batch
   * contributes its own postings partition-locally.
   */
  def mergeIndex(index: DataFrame, deltaDocs: DataFrame): DataFrame =
    index.unionByName(invertedIndex(deltaDocs))

  /** Merge two stats sides (term, df, n_docs, total_len) built over
    * disjoint doc sets: df adds per term, scalars add once. */
  def mergeStats(a: DataFrame, b: DataFrame): DataFrame = {
    val dfs = a.select("term", "df").unionByName(b.select("term", "df"))
      .groupBy("term").agg(sum(col("df")).as("df"))
    val scalars = a.select("n_docs", "total_len").limit(1)
      .unionByName(b.select("n_docs", "total_len").limit(1))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_len")).as("total_len"))
    dfs.crossJoin(broadcast(scalars))
  }

  /** Convenience: index the corpus and run `bm25TopK` in one call.
    * Production keeps the index as the build-once artifact instead. */
  def bm25(docs: DataFrame, queries: DataFrame, k: Int,
           k1: Double = 1.2, b: Double = 0.75,
           maxDf: Long = Long.MaxValue): DataFrame =
    // the index feeds termStats, corpusStats AND the posting join —
    // materialize it once (the build-once artifact this scaladoc
    // already promises at scale; the streaming entry point persists
    // the same two sides explicitly)
    bm25TopK(invertedIndex(docs).localCheckpoint(true), queries, k, k1, b, maxDf)
}
