package graft.pipeline

import graft.agg.GraftFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}

/**
 * Resumable sketch build with per-partition checkpoints, lineage, and
 * metrics (the north rule's recovery contract).
 *
 * Unit of work = a deterministic batch of input FILES (sorted file
 * list, fixed-size chunks) — the same unit a 100 TB table naturally
 * shards into. Each batch runs as its own Spark job:
 *
 *   scan(batch files) -> explode(tokens) -> groupBy(source)
 *     -> bloom_agg + hll_agg + count
 *     -> write parts/batch=N (atomic: parquet job commit)
 *     -> append lineage JSONL {batch, files, rows, wall_ms, ts,
 *        partitions:[{p, records, bytes, run_ms}, ...]} — the
 *        per-partition task metrics (scan-side records/bytes/runtime
 *        from the Spark listener bus), so the journal carries both
 *        WHAT was processed (file lineage) and HOW (per-partition
 *        work), the north rule's lineage + metrics contract
 *
 * A crash between batches loses nothing; a crash inside a batch loses
 * only that batch's work (its parquet commit never happened, and its
 * lineage line was never written — lineage is appended strictly AFTER
 * the data commit, so the journal can under-claim but never over-claim).
 * Resume = skip batches present in the journal, run the rest, then
 * fold all partials with the associative merge aggregates
 * (bloom_merge_agg / hll_merge_agg) — bit-identical to a single-shot
 * build because bloom OR and HLL register-max are associative and
 * commutative (proved in MergeSpec/AggSpec).
 */
object SketchBuildJob {

  final case class Result(sketches: DataFrame, batchesRun: Int, batchesSkipped: Int)

  /** Deliberate mid-run crash for the kill/resume test. */
  final class InjectedFailure(batch: Int)
    extends RuntimeException(s"injected failure after batch $batch")

  def run(spark: SparkSession, inDir: String, ckptDir: String,
          filesPerBatch: Int = 2,
          capacity: Long = 100000L, fpProb: Double = 1e-4,
          failAfterBatches: Int = -1): Result = {
    val partsDir = s"$ckptDir/parts"
    val lineagePath = Paths.get(ckptDir, "lineage.jsonl")
    Files.createDirectories(Paths.get(ckptDir))

    val allFiles = spark.read.parquet(inDir).inputFiles.sorted
    val batches = allFiles.grouped(filesPerBatch).zipWithIndex
      .map { case (fs, i) => (i, fs) }.toSeq

    val done: Set[Int] =
      if (Files.exists(lineagePath))
        scala.jdk.CollectionConverters.ListHasAsScala(Files.readAllLines(lineagePath)).asScala
          .filter(_.contains("\"status\":\"done\""))
          .map(l => "\"batch\":(\\d+)".r.findFirstMatchIn(l).get.group(1).toInt)
          .toSet
      else Set.empty

    var ran = 0
    batches.foreach { case (batch, files) =>
      if (!done.contains(batch)) {
        val t0 = System.nanoTime()
        // per-partition task metrics for THIS batch's jobs only: the
        // batch runs under its own job group; the listener maps the
        // group's jobs to their stage ids and records successful task
        // ends from those stages — concurrent jobs on the session and
        // failed/speculative attempts never pollute the journal
        val groupId = s"graft-build-b$batch-${java.util.UUID.randomUUID().toString.take(8)}"
        val groupStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
        val partMetrics = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, Long)]()
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            if (js.properties != null &&
                groupId == js.properties.getProperty("spark.jobGroup.id"))
              js.stageIds.foreach(sid => groupStages.add(sid))
          override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val m = te.taskMetrics
            if (te.reason == org.apache.spark.Success && groupStages.contains(te.stageId) &&
                m != null && m.inputMetrics.recordsRead > 0)
              partMetrics.add((te.taskInfo.index, m.inputMetrics.recordsRead,
                m.inputMetrics.bytesRead, m.executorRunTime))
          }
        }
        spark.sparkContext.addSparkListener(listener)
        spark.sparkContext.setJobGroup(groupId, s"sketch build batch $batch")
        try {
          val tokens = spark.read.parquet(files.toIndexedSeq: _*)
            .select(col("source"), explode(col("tokens")).as("token"))
          val partial = tokens.groupBy("source").agg(
            bloom_agg(col("token").cast("string"), capacity, fpProb).as("bloom"),
            hll_agg(col("token").cast("string"), 14).as("hll"),
            count(lit(1)).as("n_tokens"))
          // data first (atomic via parquet job commit), journal second
          partial.write.mode("overwrite").parquet(s"$partsDir/batch=$batch")
        } finally {
          spark.sparkContext.clearJobGroup()
          // listener events are posted async; wait until the metric
          // stream stabilizes (two consecutive identical sizes)
          var prev = -1
          var same = 0
          var waited = 0
          while (same < 2 && waited < 2000) {
            Thread.sleep(50); waited += 50
            val n = partMetrics.size()
            if (n == prev) same += 1 else { same = 0; prev = n }
          }
          spark.sparkContext.removeSparkListener(listener)
        }
        val wallMs = (System.nanoTime() - t0) / 1000000
        import scala.jdk.CollectionConverters._
        val parts = partMetrics.asScala.toSeq.sortBy(_._1)
        val rows = parts.map(_._2).sum
        val partsJson = parts.map { case (p, r, b, ms) =>
          s"""{"p":$p,"records":$r,"bytes":$b,"run_ms":$ms}"""
        }.mkString("[", ",", "]")
        val fileList = files.map(f => "\"" + f.replace("\\", "\\\\") + "\"").mkString("[", ",", "]")
        val line = s"""{"batch":$batch,"status":"done","files":$fileList,""" +
          s""""rows":$rows,"wall_ms":$wallMs,"ts":${System.currentTimeMillis()},""" +
          s""""partitions":$partsJson}""" + "\n"
        Files.writeString(lineagePath, line,
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        ran += 1
        if (failAfterBatches >= 0 && ran >= failAfterBatches)
          throw new InjectedFailure(batch)
      }
    }

    // final fold of all per-batch partials (associative merge)
    val merged = spark.read.parquet(partsDir)
      .groupBy("source")
      .agg(bloom_merge_agg(col("bloom")).as("bloom"),
        hll_merge_agg(col("hll")).as("hll"),
        sum(col("n_tokens")).as("n_tokens"))
    Result(merged, ran, done.size)
  }
}
