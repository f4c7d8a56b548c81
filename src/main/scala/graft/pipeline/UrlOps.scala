package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL curation operators — the crawl-side steps every web-scale corpus
 * release runs before any text-level pass (cf. C4's and CCNet's URL
 * dedup, RefinedWeb/FineWeb's URL-level filtering): canonicalize the
 * URL, deduplicate documents by canonical URL, and drop documents from
 * blocklisted domains.
 *
 * Shapes at 100 TB:
 *  - [[normalizeUrl]] / [[domainOf]] are row-local chains of codegen'd
 *    `regexp_replace`/`regexp_extract` builtins — scan + projection,
 *    no UDF, no shuffle. Patterns stay inside the Java∩RE2 regex
 *    dialect (character classes like `[?]`/`[.]` instead of backslash
 *    escapes, explicit case ranges) so a DuckDB oracle — or a
 *    production RE2 scrubber — replays them byte-identically.
 *  - [[dedupByUrl]] is ONE hash exchange keyed on the canonical URL
 *    carrying (url_norm, doc_id) pairs, map-side combined — the same
 *    partial/final shape as exact content dedup, with the group count
 *    bounded by distinct URLs, never document bytes.
 *  - [[filterBlockedDomains]] broadcasts the blocklist (domain lists
 *    are thousands of rows, corpus is 10^11 — the asymmetric-join
 *    textbook case) into a left-anti hash join: zero exchange on the
 *    corpus side.
 */
object UrlOps {

  /** Query-parameter names that never identify content: analytics and
    * click-tracking keys stripped during canonicalization. */
  val TrackerPattern = "(utm_[a-z]+|fbclid|gclid|msclkid|ref_src)"

  /**
   * Canonicalize a URL for identity comparison. The rules (each a
   * single non-overlapping regex pass, applied in this order — later
   * passes rely on earlier ones):
   *
   *  1. drop the fragment (`#...` never reaches the server);
   *  2. drop `&`-separated tracking parameters, then a leading
   *     `?`-position tracker (promoting the next real parameter to
   *     `?`), then a dangling `?`;
   *  3. lowercase the scheme and authority (host names are
   *     case-insensitive per RFC 3986 §3.2.2; the path is NOT touched
   *     — it is case-sensitive);
   *  4. drop the port only when it is the scheme's default
   *     (`https://h:443` ≡ `https://h`, but `http://h:443` is a
   *     different authority and survives);
   *  5. drop a `www.` host prefix;
   *  6. drop trailing slashes at the end of the path (both
   *     `...dir/?q` and `...dir/` forms).
   *
   * Parameter ORDER is preserved (reordering `?a=1&b=2` to `?b=2&a=1`
   * changes semantics for some servers); parameter-name case is
   * likewise preserved. Scheme distinction (http vs https) is kept.
   */
  def normalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    val noAmpTrackers = regexp_replace(noFrag, "&" + TrackerPattern + "=[^&]*", "")
    val noLeadTracker =
      regexp_replace(noAmpTrackers, "[?]" + TrackerPattern + "=[^&]*&?", "?")
    val noDanglingQ = regexp_replace(noLeadTracker, "[?]$", "")
    val headPat = "^[a-zA-Z]+://[^/?#]+"
    val head = lower(regexp_extract(noDanglingQ, headPat, 0))
    val tail = regexp_replace(noDanglingQ, headPat, "")
    val noDefPort = regexp_replace(
      regexp_replace(head, "^(https://[a-z0-9.-]+):443$", "$1"),
      "^(http://[a-z0-9.-]+):80$", "$1")
    val noWww = regexp_replace(noDefPort, "^(https?://)www[.]", "$1")
    val tailClean = regexp_replace(regexp_replace(tail, "/+[?]", "?"), "/+$", "")
    concat(noWww, tailClean)
  }

  /** Registrable host of a CANONICAL url ([[normalizeUrl]] output):
    * authority sans scheme, port, and the already-stripped www. */
  def domainOf(normUrl: Column): Column =
    regexp_extract(normUrl, "^[a-z]+://([^/:?]+)", 1)

  /**
   * Deduplicate documents by canonical URL: one row per distinct
   * canonical URL with the surviving document (smallest doc_id — the
   * deterministic first-crawled convention) and the duplicate count.
   * Exactly the exact-dedup aggregation shape with the md5 key
   * replaced by the canonical URL.
   */
  def dedupByUrl(docs: DataFrame, urlCol: String = "url"): DataFrame =
    docs.select(normalizeUrl(col(urlCol)).as("url_norm"),
        col("doc_id").cast("long").as("doc_id"))
      .groupBy("url_norm")
      .agg(min("doc_id").as("kept_doc_id"), count(lit(1)).as("n_copies"))

  /**
   * Per-domain contribution cap — RefinedWeb/FineWeb's anti-domination
   * rule: keep at most `k` documents per registrable domain, the ones
   * with the globally smallest `priority` values (ties broken by the
   * string form of doc_id, ascending). The caller supplies `priority`
   * — a deterministic, engine-reproducible expression (the gates use
   * the corpus md5 coin) so reruns and the oracle pick identical
   * survivors. `priority` is negated internally to ride the max-k
   * sketch, so it must stay above Long.MinValue (any hash-prefix coin
   * does; the 12-hex-digit corpus coin is < 2^48).
   *
   * Built on the exact mergeable top-k aggregate rather than a
   * `row_number` window: a window hash-exchanges EVERY row of a hot
   * domain into one task (the packSequences lesson), while the TopK
   * partial aggregate reduces each map partition to ≤k rows per
   * domain before the exchange — skew-immune by construction, and
   * merge associativity makes the answer independent of partitioning.
   */
  def capPerDomain(docs: DataFrame, k: Int, priority: Column,
                   urlCol: String = "url"): DataFrame = {
    import graft.agg.GraftFunctions._
    docs.select(domainOf(normalizeUrl(col(urlCol))).as("domain"),
        col("doc_id").cast("string").as("doc_str"),
        (-priority).as("neg"))
      .groupBy("domain")
      .agg(topk_agg(col("neg"), col("doc_str"), k).as("sk"))
      .select(col("domain"), explode(topk_items(col("sk"))).as("row"))
      .select(col("domain"),
        col("row.item").cast("long").as("doc_id"),
        (-col("row.score")).as("priority"))
  }

  /**
   * Drop documents whose canonical-URL domain appears in `blocked`
   * (one `domain: string` column). The blocklist side is explicitly
   * broadcast; the corpus side stays exchange-free.
   */
  def filterBlockedDomains(docs: DataFrame, blocked: DataFrame,
                           urlCol: String = "url"): DataFrame = {
    val withDomain = docs.withColumn("domain",
      domainOf(normalizeUrl(col(urlCol))))
    withDomain.join(broadcast(blocked), Seq("domain"), "left_anti")
  }
}
