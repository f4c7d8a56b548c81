package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed result sinks for the always-on streaming operators.
 *
 * The reference daemon runs forever and serves its state in place
 * (`csrc/bloomd/background.c` keeps filters current on disk); the
 * Spark-native analog is a streaming query whose foreachBatch APPENDS
 * each micro-batch to a parquet changelog directory — executors write
 * their own partitions, nothing is collected to the driver — and whose
 * result is a READ of that directory. For update-mode streams (upsert
 * per key per batch) the changelog is compacted on read with a
 * last-writer-wins window over the recorded batch id: exactly the
 * changelog-table + compaction-view pattern a lakehouse MERGE would
 * give us (parquet stands in for the table format here, same seam as
 * [[graft.catalog.SketchTableIO]]).
 */
object StreamSinks {

  /** A session for running a STATEFUL streaming query with its own
    * shuffle/state partition count: every stateful operator launches
    * one state-store task per shuffle partition per micro-batch, so a
    * 32-partition session pays 32 state tasks (and 32 store commits)
    * for a 20-row batch — the dominant per-batch constant measured in
    * round 3's changelog-sink costs. `statePartitions` sizes state
    * parallelism to the query's real key cardinality (a deployment
    * decision: thousands at 10^12-row scale, a handful at gate
    * scale); 0 keeps the caller's session untouched. The partition
    * count is baked into the checkpoint on first run, which is why it
    * must be chosen per QUERY, not inherited from whatever session
    * happens to start the stream. */
  def sessionForState(spark: SparkSession, statePartitions: Int): SparkSession =
    if (statePartitions <= 0) spark
    else {
      val s = spark.newSession() // shared context, isolated SQL conf
      // newSession starts from SparkConf defaults, not runtime-set
      // values — carry over the conf the streaming semantics rely on
      s.conf.set("spark.sql.session.timeZone",
        spark.conf.get("spark.sql.session.timeZone"))
      s.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
      s
    }

  /** foreachBatch body: write the micro-batch into its OWN partition
    * directory (`batch_id=N`), mode overwrite — a distributed write,
    * never a driver collect, and IDEMPOTENT per batch id: Structured
    * Streaming's exactly-once contract for foreachBatch requires the
    * sink write to be idempotent on (batchId) because a failed batch
    * is re-run with the same id — a plain append would duplicate the
    * retried batch's rows, an overwrite of the batch's directory
    * cannot. `batch_id` resurfaces on read as the inferred partition
    * column.
    * `maxFiles` bounds the batch's output file count (micro-batches
    * inherit the session's shuffle partition count, so a 20-row batch
    * would otherwise commit 32 near-empty files — per-batch task +
    * file constants were the measured cost of the changelog sinks in
    * round 3). The write stays distributed (`coalesce`, never a
    * driver collect); pass 0 to keep the batch's own partitioning for
    * genuinely large batches. */
  def appendBatch(batch: DataFrame, batchId: Long, sinkDir: String,
                  maxFiles: Int = 4): Unit =
    // coalesce never increases partition count, so small batches merge
    // to <= maxFiles tasks while an already-narrow batch is untouched
    (if (maxFiles > 0) batch.coalesce(maxFiles) else batch)
      .write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")

  /** Seed the changelog with a zero-row file carrying the schema, so
    * reading the sink is well-defined even when every batch is empty. */
  def seed(spark: SparkSession, schema: org.apache.spark.sql.types.StructType,
           sinkDir: String): Unit =
    spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
      .coalesce(1).write.mode("overwrite").parquet(s"$sinkDir/batch_id=-1")

  /** Append-mode result: each row was emitted exactly once. */
  def readAppend(spark: SparkSession, sinkDir: String): DataFrame =
    spark.read.parquet(sinkDir).drop("batch_id")

  /** Changelog compaction: rewrite the accumulated per-batch files
    * into one chunky file per batch id (executor-side — a distributed
    * repartition-and-write, no driver collect), preserving the
    * `batch_id` partition column so [[readLatestByKey]]'s
    * last-writer-wins window is untouched. Run it while the stream is
    * idle (e.g. after an AvailableNow drain, or between restarts of a
    * continuous query): the swap below replaces the whole directory,
    * and a concurrently-committing batch could land in the old tree.
    * Long-running sinks would call this periodically — the changelog
    * grows one directory of small files per micro-batch forever
    * otherwise, and parquet read cost is dominated by file-open
    * constants once files are small. */
  def compact(spark: SparkSession, sinkDir: String): Unit = {
    import java.nio.file.{Files => JFiles, Paths, StandardCopyOption}
    val live = Paths.get(sinkDir)
    val old = Paths.get(sinkDir + ".old")
    def rmTree(p: java.nio.file.Path): Unit =
      if (JFiles.exists(p)) {
        val walk = JFiles.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => JFiles.deleteIfExists(q))
        finally walk.close()
      }
    def mv(a: java.nio.file.Path, b: java.nio.file.Path): Unit =
      try JFiles.move(a, b, StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.AtomicMoveNotSupportedException => JFiles.move(a, b) }
    // A leftover .old means a prior compaction died mid-protocol, and
    // it is NOT safely deletable: a crash between the two renames
    // leaves .old as the ONLY complete copy (live missing — or
    // recreated with just post-crash batches by a restarted stream).
    // Recover by MERGE — move any batch directory .old has and live
    // lacks into live — BEFORE reading the sink, so the compaction
    // input includes the recovered batches. Both crash cases are
    // covered: after a COMPLETED swap the compacted live has the same
    // batch_id set, nothing moves and .old really was garbage; after
    // a mid-swap crash the pre-crash batches are restored (live's
    // copy wins when both exist — batch overwrite semantics make it
    // newer-or-equal).
    if (JFiles.exists(old)) {
      JFiles.createDirectories(live)
      val kids = JFiles.list(old)
      try kids.forEach { dir =>
        val dst = live.resolve(dir.getFileName)
        // only batch directories carry data; anything else in .old is
        // garbage and would break live's partition discovery
        if (JFiles.isDirectory(dir) && !JFiles.exists(dst) &&
          dir.getFileName.toString.startsWith("batch_id=")) mv(dir, dst)
      } finally kids.close()
      rmTree(old)
    }
    val df = spark.read.parquet(sinkDir) // batch_id surfaces as a column
    val dataSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields.filterNot(_.name == "batch_id"))
    val tmp = sinkDir + ".compacting"
    // hash-partition by batch id: each id lands in exactly one task,
    // so every batch_id=N directory is rewritten as a single file
    df.repartition(col("batch_id"))
      .write.partitionBy("batch_id").mode("overwrite").parquet(tmp)
    // an all-empty changelog writes no partition dirs at all — re-seed
    // so the compacted sink stays readable
    seed(spark, dataSchema, tmp)
    mv(live, old)
    mv(Paths.get(tmp), live)
    rmTree(old) // best-effort cleanup of the superseded tree
  }

  /** Update-mode result: compact the changelog to the LAST emission
    * per key (upsert semantics). Within one batch a key appears at
    * most once (it's a groupBy/state output), so batch_id is a total
    * order per key. */
  def readLatestByKey(spark: SparkSession, sinkDir: String, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("batch_id").desc)
    spark.read.parquet(sinkDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "batch_id")
  }
}
