package graft.pipeline

import graft.hash.Murmur3x64
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Row-local text-sketch expressions for the dedup pipeline. Both are
 * SCALAR (the signature of a document depends only on that document's
 * own shingles), so they run inside the scan projection — no shuffle,
 * no state — and the only shuffle in a dedup job is the subsequent
 * band-bucket join. They reuse the engine's bit-exact Murmur3 x64_128
 * (graft.hash.Murmur3x64) so signatures are deterministic across JVMs,
 * partitionings, and reruns — required for resumable jobs.
 */


/** Reference-object codegen for unary text-sketch expressions: keeps
  * the enclosing scan projection inside WholeStageCodegen (a
  * CodegenFallback child would interpret the whole stage). */
trait UnaryRefCodegen { self: UnaryExpression =>
  def evalRef(input: AnyRef): AnyRef

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("expr", this, classOf[UnaryRefCodegen].getName)
    val boxed = CodeGenerator.boxedType(dataType)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ($boxed) $ref.evalRef($c);")
  }
}

/**
 * MinHash signature of a set of shingle strings.
 *
 * Permutation hashes follow the same Kirsch–Mitzenmacher 2-hash scheme
 * the bloom core uses (h_i = h1 + i*h2, wrapping mod 2^64): one 128-bit
 * Murmur per shingle yields all `numPerms` permutation values, so cost
 * is O(shingles * numPerms) adds, not O(shingles * numPerms) hashes.
 * Collision probability per permutation equals the Jaccard similarity
 * (Broder 1997), independent of the total order used for "min" — we use
 * signed Long order with empty-set sentinel Long.MaxValue.
 */
case class MinHashSig(child: Expression, numPerms: Int)
    extends UnaryExpression with UnaryRefCodegen {
  override def evalRef(input: AnyRef): AnyRef = nullSafeEval(input).asInstanceOf[AnyRef]
  require(numPerms > 0 && numPerms <= 4096, s"numPerms out of range: $numPerms")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numPerms)(Long.MaxValue)
    val two = new Array[Long](2)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        Murmur3x64.hash128(bytes, 0, bytes.length, 0L, two)
        val h2 = two(1)
        var h = two(0)
        var p = 0
        while (p < numPerms) {
          if (h < sig(p)) sig(p) = h
          h += h2
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/**
 * 64-bit SimHash (Charikar 2002) over a bag of word strings: each
 * word votes ±1 per bit position of its Murmur3 x64 hash; the
 * fingerprint sets bit b iff the vote sum is positive. Similar word
 * bags yield fingerprints at small Hamming distance, probed with the
 * built-in `bit_count(a ^ b)` — no custom expression needed there.
 */
case class SimHash64(child: Expression)
    extends UnaryExpression with UnaryRefCodegen {
  override def evalRef(input: AnyRef): AnyRef = nullSafeEval(input).asInstanceOf[AnyRef]

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val acc = new Array[Int](64)
    val two = new Array[Long](2)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        Murmur3x64.hash128(bytes, 0, bytes.length, 0L, two)
        val h = two(0)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

/**
 * Distinct word n-gram shingles of a words array, as one native pass.
 *
 * Semantically identical to the builtin composition
 * `array_distinct(transform(sequence(1, size-n+1), i ->
 * concat_ws(' ', slice(words, i, n))))` (with the whole doc as a
 * single shingle when size < n), but those interpreted higher-order
 * lambdas cost ~1.7 ms per 100-word document — 20x the rest of the
 * dedup pipeline combined. This loop builds each shingle once and
 * dedups through a LinkedHashSet (first-occurrence order, matching
 * array_distinct).
 */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with UnaryRefCodegen {
  override def evalRef(input: AnyRef): AnyRef = nullSafeEval(input).asInstanceOf[AnyRef]
  require(n >= 1, s"shingle width $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nw = arr.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    val sep = UTF8String.fromString(" ")
    if (nw < n) {
      val parts = new Array[UTF8String](nw)
      var i = 0
      while (i < nw) { parts(i) = arr.getUTF8String(i); i += 1 }
      out.add(UTF8String.concatWs(sep, parts: _*))
    } else {
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i + n <= nw) {
        var j = 0
        while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        out.add(UTF8String.concatWs(sep, parts: _*))
        i += 1
      }
    }
    val res = new Array[AnyRef](out.size)
    out.toArray(res)
    new GenericArrayData(res)
  }

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
  override def prettyName: String = "word_shingles"
}

/**
 * Per-document n-gram repetition statistics (the Gopher repetition
 * signals, Rae et al. 2021 §A1.1): over the OVERLAPPING word n-grams
 * of one document — total gram count, the most frequent gram's
 * occurrence count and character coverage (count × gram chars, ties
 * broken by lexicographically smallest gram so the answer is unique),
 * and the character coverage of all duplicated grams (Σ count × chars
 * over grams with count > 1).
 *
 * One native pass with a per-row hash map — a SCALAR of the document,
 * so at 100 TB the repetition filter is scan + WholeStageCodegen
 * projection, no shuffle (the explode → groupBy(doc, gram) alternative
 * exchanges every token of the corpus). The oracle replays the explode
 * form in SQL; equality is exact because counts and character sums are
 * integers and the tie-break is total.
 */
case class RepetitionStats(child: Expression, n: Int)
    extends UnaryExpression with UnaryRefCodegen {
  override def evalRef(input: AnyRef): AnyRef = nullSafeEval(input).asInstanceOf[AnyRef]
  require(n >= 1, s"gram width $n")

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", IntegerType, nullable = false),
    StructField("top_cnt", IntegerType, nullable = false),
    StructField("top_chars", LongType, nullable = false),
    StructField("dup_chars", LongType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nw = arr.numElements()
    if (nw < n)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0, 0, 0L, 0L))
    val counts = new java.util.HashMap[UTF8String, Integer]()
    val sep = UTF8String.fromString(" ")
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i + n <= nw) {
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      val g = UTF8String.concatWs(sep, parts: _*)
      val prev = counts.get(g)
      counts.put(g, if (prev == null) 1 else prev + 1)
      i += 1
    }
    var topCnt = 0
    var topGram: UTF8String = null
    var dupChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.intValue()
      if (c > topCnt || (c == topCnt && e.getKey.compareTo(topGram) < 0)) {
        topCnt = c
        topGram = e.getKey
      }
      if (c > 1) dupChars += c.toLong * e.getKey.numChars()
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nw - n + 1, topCnt, topCnt.toLong * topGram.numChars(), dupChars))
  }

  override protected def withNewChildInternal(c: Expression): RepetitionStats = copy(child = c)
  override def prettyName: String = "repetition_stats"
}

/** Column builders + builtin-composed text helpers (codegen'd where possible). */
/**
 * Unicode NFC normalization — the canonical-composition pass every
 * corpus release runs first (CCNet-style pipelines normalize before
 * hashing, or byte-identical duplicates with different combining-mark
 * encodings slip every exact-dedup stage). Row-local, codegen'd via
 * the shared reference-object trait; delegates to the JDK's ICU-table
 * Normalizer, which implements the same Unicode standard DuckDB's
 * utf8proc does — so the oracle replays it with nfc_normalize().
 */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with UnaryRefCodegen {
  override def evalRef(input: AnyRef): AnyRef = nullSafeEval(input).asInstanceOf[AnyRef]

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // NFC-clean strings (all-ASCII fast path inside isNormalized) skip
    // the composition walk — the common case for web text
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(child = c)
  override def prettyName: String = "nfc_normalize"
}

/**
 * Accent stripping: NFD decomposition, then drop combining marks
 * (category Mn) — "Café" → "Cafe". The transliteration step of
 * language-agnostic fingerprinting; agrees with DuckDB's
 * strip_accents for Latin-script text (both are mark-removal after
 * canonical decomposition).
 */
case class StripAccents(child: Expression)
    extends UnaryExpression with UnaryRefCodegen {
  override def evalRef(input: AnyRef): AnyRef = nullSafeEval(input).asInstanceOf[AnyRef]

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val d = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    // walk CODE POINTS, not chars: supplementary-plane combining
    // marks (e.g. U+10A01) are surrogate pairs, and per-char getType
    // would return SURROGATE and keep them — diverging from utf8proc
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): StripAccents = copy(child = c)
  override def prettyName: String = "strip_accents"
}

/**
 * fastText-style hashed-bag score over a gram array in ONE compiled
 * pass: per gram g, bucket = (fold over characters: a = (a*31 +
 * char) mod 1e9+7) mod dim, weight = bucket*2654435761 mod 1000003
 * mod 2001 - 1000; emits (n_features, sum of weights). Bit-identical
 * to the higher-order-function form
 * `aggregate(transform(grams, g -> weightOf(bucketOf(g))), 0L, +)`
 * with `bucketOf = pmod(aggregate(split(g, ''), ...), dim)` — the
 * character value replicates Spark's `ascii` on a split('') element
 * (first UTF-16 unit of the code point, = the code point itself for
 * BMP text), and all arithmetic is the same long ops in the same
 * order — but higher-order functions run as interpreted lambda
 * frames per character, and a quality model reads every gram of all
 * 100 TB, so this is the one projection where that interpreter tax
 * is the whole inference bill.
 */
/**
 * Per-document term frequencies in ONE row-local pass: word array ->
 * array<struct<term, tf>> with one entry per DISTINCT word, ordered
 * by first occurrence (deterministic on any layout). Replaces the
 * explode + groupBy(term, doc_id) hash aggregation in the inverted-
 * index build: a document's words all live in its own row, so the
 * per-(term, doc) counts never needed an aggregation operator at all
 * — this emits the aggregated postings directly and the index build
 * becomes scan + explode (its only exchange is whatever the CONSUMER
 * needs, e.g. the doc_id scoring repartition).
 */
case class WordCounts(child: Expression)
    extends UnaryExpression with UnaryRefCodegen {
  override def evalRef(input: AnyRef): AnyRef = nullSafeEval(input).asInstanceOf[AnyRef]

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", IntegerType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new java.util.LinkedHashMap[UTF8String, Integer]()
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      val prev = counts.get(w)
      counts.put(w, if (prev == null) 1 else prev + 1)
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = org.apache.spark.sql.catalyst.InternalRow(e.getKey, e.getValue.intValue())
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WordCounts = copy(child = c)
  override def prettyName: String = "word_counts"
}

/**
 * Vocabulary lookup of a whole word array in ONE call: word ->
 * 0-based index in `vocab`, null for out-of-vocabulary words —
 * element-for-element identical to
 * `transform(words, w -> cast(array_position(vocab, w) - 1 as int))`
 * (array_position takes the FIRST match, replicated by putIfAbsent),
 * but via one hash-map probe per word instead of a linear scan of
 * the vocab literal, and one boxed call per ROW instead of per word.
 * The tokenization projection runs in front of every token-sketch
 * gate, so its per-word constant is corpus-proportional work.
 */
case class VocabIds(child: Expression, vocab: Seq[String])
    extends UnaryExpression with UnaryRefCodegen {
  override def evalRef(input: AnyRef): AnyRef = nullSafeEval(input).asInstanceOf[AnyRef]

  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)

  @transient private lazy val idx: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    vocab.zipWithIndex.foreach { case (w, i) =>
      m.putIfAbsent(UTF8String.fromString(w), Integer.valueOf(i))
    }
    m
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = idx.get(arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): VocabIds = copy(child = c)
  override def prettyName: String = "vocab_ids"
}

/**
 * 31-base polynomial rolling hash mod 1e9+7 over a string's
 * characters in one compiled pass — bit-identical to
 * `aggregate(transform(split(text, ''), c -> ascii(c)), 0L,
 * (a, c) -> (a * 31 + c) % 1000000007)` (same character values as
 * Spark's ascii on split('') elements, same long arithmetic), minus
 * the interpreted lambda frame per character of the corpus.
 */
case class RollingHash(child: Expression)
    extends UnaryExpression with UnaryRefCodegen {
  override def evalRef(input: AnyRef): AnyRef = nullSafeEval(input).asInstanceOf[AnyRef]

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var a = 0L
    var j = 0
    while (j < s.length) {
      val cp = s.codePointAt(j)
      val v = if (Character.isSupplementaryCodePoint(cp))
        Character.highSurrogate(cp).toInt else cp
      a = (a * 31L + v) % 1000000007L
      j += Character.charCount(cp)
    }
    a
  }

  override protected def withNewChildInternal(c: Expression): RollingHash = copy(child = c)
  override def prettyName: String = "rolling_hash"
}

case class QualityScore(child: Expression, dim: Int)
    extends UnaryExpression with UnaryRefCodegen {
  require(dim >= 1, s"feature dim $dim")
  override def evalRef(input: AnyRef): AnyRef = nullSafeEval(input).asInstanceOf[AnyRef]

  override def dataType: DataType = StructType(Seq(
    StructField("n_features", IntegerType, nullable = false),
    StructField("score_milli", LongType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var score = 0L
    var i = 0
    while (i < n) {
      val g = arr.getUTF8String(i).toString
      var a = 0L
      var j = 0
      while (j < g.length) {
        val cp = g.codePointAt(j)
        // ascii(split-element) = the element's FIRST UTF-16 unit
        val v = if (Character.isSupplementaryCodePoint(cp))
          Character.highSurrogate(cp).toInt else cp
        a = (a * 31L + v) % 1000000007L
        j += Character.charCount(cp)
      }
      score += (a % dim) * 2654435761L % 1000003L % 2001L - 1000L
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, score))
  }

  override protected def withNewChildInternal(c: Expression): QualityScore = copy(child = c)
  override def prettyName: String = "quality_score"
}

object TextFunctions {

  def minhash_sig(shingles: Column, numPerms: Int): Column =
    ColumnShim.column(MinHashSig(ColumnShim.expression(shingles), numPerms))

  /** Hashed-bag classifier score struct (native single pass, see
    * QualityScore). */
  def qualityScore(gramsCol: Column, dim: Int): Column =
    ColumnShim.column(QualityScore(ColumnShim.expression(gramsCol), dim))

  /** 31-base polynomial rolling hash mod 1e9+7 (native single pass,
    * see RollingHash). */
  def rollingHash(text: Column): Column =
    ColumnShim.column(RollingHash(ColumnShim.expression(text)))

  /** word array -> 0-based vocab ids, null when out-of-vocabulary
    * (native single pass, see VocabIds). */
  def vocabIds(wordsCol: Column, vocab: Seq[String]): Column =
    ColumnShim.column(VocabIds(ColumnShim.expression(wordsCol), vocab))

  /** word array -> array<struct<term, tf>> per distinct word
    * (native single pass, see WordCounts). */
  def wordCounts(wordsCol: Column): Column =
    ColumnShim.column(WordCounts(ColumnShim.expression(wordsCol)))

  /** Unicode NFC canonical composition (native, codegen'd). */
  def nfc(text: Column): Column =
    ColumnShim.column(NfcNormalize(ColumnShim.expression(text)))

  /** NFD + combining-mark removal (native, codegen'd). */
  def stripAccents(text: Column): Column =
    ColumnShim.column(StripAccents(ColumnShim.expression(text)))

  def simhash64(words: Column): Column =
    ColumnShim.column(SimHash64(ColumnShim.expression(words)))

  /** Whitespace word array — the same split the token table uses. */
  def words(text: Column): Column = split(text, "\\s+")

  /** Distinct word n-gram shingles (native single pass, see WordShingles). */
  def shingles(wordsCol: Column, n: Int): Column =
    ColumnShim.column(WordShingles(ColumnShim.expression(wordsCol), n))

  /** Per-doc n-gram repetition stats struct (native single pass, see
    * RepetitionStats). */
  def repetitionStats(wordsCol: Column, n: Int): Column =
    ColumnShim.column(RepetitionStats(ColumnShim.expression(wordsCol), n))

  /**
   * Stopword-profile language scores. Honest n-gram/stopword heuristic
   * (fully SQL-expressible so DuckDB can replay it exactly): score(L) =
   * number of word occurrences that are stopwords of L; prediction =
   * argmax with fixed tie order, "und" when all scores are zero.
   */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "that"),
    "es" -> Seq("el", "la", "de", "y", "es", "en", "que", "los"),
    "fr" -> Seq("le", "la", "et", "est", "les", "des", "un", "une"),
    "zh" -> Seq("de0", "shi4", "le0", "zai4", "he2", "you3", "wo3", "ta1"))

  def langScore(wordsCol: Column, stopwords: Seq[String]): Column =
    size(filter(wordsCol, w => w.isin(stopwords: _*)))
}
