package graft

import graft.agg.GraftFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract).
  * `runMain graft.Profile check` dissects the bench check phase. */
object Profile {

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.headOption.getOrElse("check") match {
      case "check" => profileCheck(spark)
      case "lm" => profileLm(spark)
      case "lsh" => profileLsh(spark)
      case "sretr" => profileStreamRetrieval(spark)
      case "cprep" => profileCorpusPrep(spark)
      case other => println(s"unknown mode $other")
    }
    spark.stop()
  }

  private def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Stage-by-stage dissection of the text_lm_filter leg. */
  private def profileLm(spark: SparkSession): Unit = {
    import graft.pipeline._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def stage(label: String)(f: => Unit): Unit = {
      f // warm
      val t = (1 to 2).map(_ => timed(f)).min
      println(f"[prof] $label%-28s $t%.2f s")
    }
    val words = TextFunctions.words(col("text"))
    stage("docs scan")(noop(docs))
    stage("words size")(noop(docs.select(org.apache.spark.sql.functions.size(words).as("n"))))
    val bigrams = docs.filter(org.apache.spark.sql.functions.size(words) >= 2)
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        explode(transform(sequence(lit(0), org.apache.spark.sql.functions.size(words) - 2),
          i => concat(element_at(words, i + 1), lit(" "), element_at(words, i + 2)))).as("g"))
    stage("bigram explode")(noop(bigrams))
    stage("bigram explode+w1")(noop(bigrams.withColumn("w1", split(col("g"), " ").getItem(0))))
    val pool = bigrams.filter(col("source") =!= "src0")
    stage("pool groupBy doc")(noop(pool.groupBy("doc_id").agg(count(lit(1)).as("n"))))
    stage("full rareBigramScore")(noop(LmFilter.rareBigramScore(docs, "src0")))
  }

  /** Does CollapseProject inline minhash_sig into the per-band
    * lambda (32x re-evaluation)? Times banding with sig as a
    * collapsed projection vs a checkpoint-bound attribute. */
  private def profileLsh(spark: SparkSession): Unit = {
    import graft.pipeline.TextFunctions._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sh = docs.select(col("doc_id").cast("long").as("id"),
      shingles(words(col("text")), 3).as("sh")).localCheckpoint(true)
    val bands = 32; val r = 4
    def bucketsOf(sig: org.apache.spark.sql.DataFrame) = sig.select(col("id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"), hash(org.apache.spark.sql.functions.slice(col("sig"), b * r + 1, lit(r))).as("bh")))).as("e"))
      .select(col("id"), col("e.band").as("band"), col("e.bh").as("bh"))
    def stage(label: String)(f: => Unit): Unit = {
      f; val t = (1 to 2).map(_ => timed(f)).min
      println(f"[prof] $label%-28s $t%.2f s")
    }
    val sigProj = sh.withColumn("sig", minhash_sig(col("sh"), 128))
    stage("sig only")(noop(sigProj.select("id", "sig")))
    stage("buckets, collapsed sig")(noop(bucketsOf(sigProj)))
    val sigCk = sigProj.select("id", "sig").localCheckpoint(true)
    stage("buckets, bound sig")(noop(bucketsOf(sigCk)))
    println("---- collapsed plan Generate node: ----")
    bucketsOf(sigProj).queryExecution.optimizedPlan.toString.split("\n")
      .filter(l => l.contains("Generate") || l.contains("minhash"))
      .take(4).foreach(println)
  }

  /** Piece timing of the stream_retrieval leg's fixed costs. */
  private def profileStreamRetrieval(spark: SparkSession): Unit = {
    import graft.pipeline._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    def stage(label: String)(f: => Unit): Unit = {
      val t = timed(f)
      println(f"[prof] $label%-28s $t%.2f s")
    }
    stage("seed queries") {
      val qs = d.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("q_id"),
          org.apache.spark.sql.functions.slice(TextFunctions.words(col("text")), 1, 8).as("terms"))
      qs.repartitionByRange(2, col("q_id")).sortWithinPartitions("q_id")
        .write.mode("overwrite").parquet("/tmp/prof_sretr_in")
    }
    stage("index build+write") {
      Retrieval.invertedIndex(d).write.mode("overwrite").parquet("/tmp/prof_sretr_idx")
    }
    val idx = spark.read.parquet("/tmp/prof_sretr_idx").persist()
    stage("stats build+write") {
      Retrieval.termStats(idx)
        .crossJoin(broadcast(Retrieval.corpusStats(idx)))
        .write.mode("overwrite").parquet("/tmp/prof_sretr_stats")
    }
    val stats = spark.read.parquet("/tmp/prof_sretr_stats").persist()
    val qs = spark.read.parquet("/tmp/prof_sretr_in")
    stage("one bm25FromIndex batch") {
      noop(Retrieval.bm25FromIndex(idx, stats, qs, 10))
    }
    stage("one bm25FromIndex again") {
      noop(Retrieval.bm25FromIndex(idx, stats, qs, 10))
    }
    // sub-pieces of one scoring pass
    val qterms = qs.select(col("q_id").cast("long").as("q_id"),
      explode(col("terms")).as("term")).distinct()
    stage("qterms distinct")(noop(qterms))
    val qstats = stats.join(qterms.select("term").distinct(), Seq("term"))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("idf2", log(col("n_docs").cast("double") / col("df")))
      .withColumn("avgdl", col("total_len").cast("double") / col("n_docs"))
      .select("term", "idf", "idf2", "avgdl")
    val contrib = idx
      .join(broadcast(qstats), Seq("term"))
      .join(broadcast(qterms), Seq("term"))
      .withColumn("tfnorm", col("tf") * (lit(1.2) + 1.0) /
        (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl"))))
      .select(col("q_id"), col("doc_id"),
        round(col("idf") * col("tfnorm") * lit(1e6)).cast("long").as("c_bm25"),
        round(col("tf") * col("idf2") * lit(1e6)).cast("long").as("c_tfidf"))
    stage("contrib join")(noop(contrib))
    val scored = contrib.groupBy("q_id", "doc_id")
      .agg(sum(col("c_bm25")).as("score_micros"), sum(col("c_tfidf")).as("tfidf_micros"))
    stage("scored agg")(noop(scored))
    stage("ranked window") {
      import org.apache.spark.sql.expressions.Window
      noop(scored.withColumn("rank", org.apache.spark.sql.functions.row_number().over(
          Window.partitionBy(col("q_id"))
            .orderBy(col("score_micros").desc, col("doc_id").asc)))
        .filter(col("rank") <= 10))
    }
    val tmp = graft.util.Scratch.tempDir("profsrt")
    stage("full bm25Stream drain") {
      graft.streaming.StreamRetrieval.bm25Stream(
        spark, "/tmp/prof_sretr_in", d, tmp.resolve("cp").toString,
        tmp.resolve("out").toString, k = 10)
        .write.format("noop").mode("overwrite").save()
    }
  }

  /** Stage timing of the pipeline_corpus_prep gate's composition. */
  private def profileCorpusPrep(spark: SparkSession): Unit = {
    import graft.pipeline._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    def stage(label: String)(f: => Unit): Unit = {
      val t = timed(f)
      println(f"[prof] $label%-28s $t%.2f s")
    }
    val eval = d.filter(col("doc_id") % 7 === 0)
    val trainBase = d.filter(col("doc_id") % 7 =!= 0)
    val train = trainBase.unionByName(
      trainBase.withColumn("doc_id", col("doc_id") + 100000))
    var curated: org.apache.spark.sql.DataFrame = null
    stage("curate (LSH) build+noop") {
      curated = Curation.curate(train, minJ = 0.5,
        pairSource = Curation.PairSource.Lsh(minJ = 0.5))
      noop(curated)
    }
    var kept: org.apache.spark.sql.DataFrame = null
    stage("kept checkpoint") {
      kept = train.select(col("doc_id").cast("long").as("doc_id"),
          col("text"), col("source"))
        .join(curated.select("doc_id", "lang_pred"), Seq("doc_id"))
        .localCheckpoint()
    }
    var ovl: org.apache.spark.sql.DataFrame = null
    stage("decontam overlap ckpt") {
      ovl = Decontam.overlap(kept, eval, n = 3, maxOverlap = 0).localCheckpoint()
    }
    var med = 0.0
    stage("median agg") {
      med = Option(ovl.agg(expr("percentile(n_overlap, 0.5)")).head().get(0))
        .map(_.toString.toDouble).getOrElse(0.0)
    }
    val cleanIds = ovl.filter(col("n_overlap") <= med)
      .select(col("doc_id").as("kept_id"))
    val clean = kept.join(cleanIds, kept("doc_id") === cleanIds("kept_id"), "left_semi")
    var redacted: org.apache.spark.sql.DataFrame = null
    stage("redact join noop") {
      redacted = clean.join(
        TextOps.redactPii(clean).select("doc_id", "text_clean"), Seq("doc_id"))
      noop(redacted)
    }
    val evens = (0 until 20 by 2).map(i => s"src$i" -> 12).toMap
    val sampled = DataShaping.stratifiedSample(redacted, evens, defaultRate16 = 6)
    val withTok = sampled.withColumn("n_tok",
      expr("size(split(text_clean, '\\\\s+'))"))
    stage("sample+pack+join noop") {
      noop(DataShaping.packSequences(withTok, budget = 4096)
        .join(sampled.select("doc_id", "lang_pred"), Seq("doc_id"))
        .select("doc_id", "source", "lang_pred", "n_tok", "cum_tok", "bin_id")
        .orderBy("doc_id"))
    }
  }

  private def profileCheck(spark: SparkSession): Unit = {
    val n = 4000000L
    def keyDf(parts: Int) = spark.range(0, n, 1, parts)
      .select(concat(lit("key"), col("id")).as("k"))

    // the bench's grown SBF: 4M keys into init-cap 100k ladder
    val bigBlob = keyDf(256).agg(sbf_agg(col("k"), 100000L, 1e-4, 4, 0.9).as("s"))
      .head().getAs[Array[Byte]]("s")
    println(s"[prof] grown SBF blob: ${bigBlob.length / 1024 / 1024} MiB, " +
      s"layers=${graft.sketch.ScalableBloom.deserialize(bigBlob).numLayers}")
    // a right-sized SBF (cap = n): single layer, same key count
    val rightBlob = keyDf(256).agg(sbf_agg(col("k"), n, 1e-4, 4, 0.9).as("s"))
      .head().getAs[Array[Byte]]("s")
    println(s"[prof] right-sized blob: ${rightBlob.length / 1024 / 1024} MiB, " +
      s"layers=${graft.sketch.ScalableBloom.deserialize(rightBlob).numLayers}")

    def probe(blob: Array[Byte], parts: Int): Unit = keyDf(parts)
      .select(sbf_contains(lit(blob), col("k")).as("hit"))
      .write.format("noop").mode("overwrite").save()

    // single-thread structure ceiling (no Spark): contains() per key
    val sk = graft.sketch.ScalableBloom.deserialize(bigBlob)
    val m = 1000000
    val tLocal = timed {
      var i = 0
      while (i < m) {
        sk.contains(s"key$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        i += 1
      }
    }
    println(f"[prof] single-thread contains: ${m / tLocal / 1e6}%.2f M keys/s")

    for ((label, blob, parts) <- Seq(
        ("grown/256parts", bigBlob, 256),
        ("grown/32parts", bigBlob, 32),
        ("right-sized/256parts", rightBlob, 256),
        ("right-sized/32parts", rightBlob, 32))) {
      probe(blob, parts) // warm
      val t = (1 to 3).map(_ => timed(probe(blob, parts))).min
      println(f"[prof] $label%-22s ${t}%.2f s  ${n / t / 1e6}%.2f M keys/s")
    }

    // key generation cost alone (scan + concat, no probe)
    val tGen = (1 to 3).map(_ => timed {
      keyDf(256).select(length(col("k")).as("l"))
        .write.format("noop").mode("overwrite").save()
    }).min
    println(f"[prof] keygen only: ${tGen}%.2f s  ${n / tGen / 1e6}%.2f M keys/s")
  }
}
