package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/**
 * Physical data layout for shuffle-free joins and scan pruning — the
 * write-side half of "100 TB efficiency". The reference daemon keeps
 * its filters hot by laying bytes out for the probe path
 * (`csrc/libbloom/bitmap.c` mmap layout, `filter.c:filter_add` page
 * locality); the Spark-native analog is laying TABLES out for the
 * query path:
 *
 *   - [[writeBucketed]]: hash-bucketed + per-bucket-sorted parquet
 *     tables. Two tables bucketed on their join keys with the same
 *     bucket count join WITHOUT any Exchange — the shuffle was paid
 *     once at write time and amortizes over every subsequent join.
 *     At 100 TB this turns the nightly fact⋈dim re-join from a
 *     full-network shuffle into a map-side zip of co-numbered
 *     buckets; bucket-key equality filters also prune to a single
 *     bucket's files ("SelectedBucketsCount: 1 out of N").
 *   - [[writeHivePartitioned]]: directory partitioning; equality
 *     predicates on the partition column never list, open, or read
 *     the other directories (partition pruning at plan time).
 *   - [[writeSortedShards]]: range-partition + sort-within on a sort
 *     key; parquet row-group min/max zone maps then let a pushed
 *     range predicate skip whole row groups, so scan output is
 *     proportional to the selected range, not the table.
 *
 * The plan-introspection helpers return the evidence (exchange
 * counts under a join, partition filters, pushed filters) so gates
 * can pin the physical shape into their ORACLE-CHECKED output —
 * co-location is part of the answer, not a side assertion.
 */
object Layout {

  /** Write `df` as a parquet table hash-bucketed (and sorted) by
    * `key` into `buckets` buckets, stored under `path` and registered
    * as `table` in the session catalog (bucket metadata lives in the
    * catalog, which is why bucketed writes are saveAsTable, not
    * save). */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.format("parquet").mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Hive-style directory partitioning by `partCol`. */
  def writeHivePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** Range-partition into `shards` sorted shards by `key` so parquet
    * row-group zone maps line up with the sort order. */
  def writeSortedShards(df: DataFrame, path: String, key: String,
                        shards: Int): Unit =
    df.repartitionByRange(shards, col(key)).sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)

  /**
   * Morton code: interleave the low `bits` bits of two bucketized
   * non-negative ints (a in even positions, b in odd) — a plain
   * codegen'd integer expression. Range-partitioning + sorting by the
   * z-value makes each parquet row group a RECTANGLE in (a, b) space,
   * so min/max zone maps stay tight on BOTH columns and a predicate
   * on either axis (or a box on both) skips row groups —
   * [[writeSortedShards]] generalized to two query axes from one
   * layout (the Delta/Iceberg OPTIMIZE ZORDER discipline).
   */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
             bits: Int): org.apache.spark.sql.Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Range-partition into `shards` sorted shards by the Morton code of
    * two pre-bucketized columns; the z column itself is not persisted
    * — the pruning works off the DATA columns' per-row-group stats. */
  def writeZOrdered(df: DataFrame, path: String,
                    aBucket: org.apache.spark.sql.Column,
                    bBucket: org.apache.spark.sql.Column,
                    bits: Int, shards: Int): Unit =
    df.withColumn("__z", zValue(aBucket, bBucket, bits))
      .repartitionByRange(shards, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /**
   * Skew-safe shuffle equi-join: the dim side is replicated once per
   * salt value and the fact side deterministically splits across
   * salts (hash of the whole fact row), so a hot join key occupies
   * `salts` tasks instead of one — the join-side complement of the
   * two-phase salted aggregation (`q_skew_salted`). Row-identical to
   * the plain join (the salt is join-key-extending, never filtering).
   *
   * Forces a shuffle join (`merge` hint): salting exists for exactly
   * the case where the dim is too big to broadcast — at test scale a
   * broadcast would otherwise hide the exchange being demonstrated.
   * Cost: dim is written `salts`× into the exchange; use for
   * moderate dims with skewed facts (tiny dims should broadcast,
   * which needs no salt at all).
   */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toSeq: _*), lit(salts)).cast("int"))
    val expanded = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.hint("merge").join(expanded, Seq(key, "__salt")).drop("__salt")
  }

  /** The PREPARED physical plan, with `EnsureRequirements` applied
    * (so exchanges are visible) but before AQE re-planning: the
    * adaptive wrapper's current plan is its initial plan until the
    * query actually runs. `queryExecution.sparkPlan` is useless for
    * exchange counting — strategies emit joins WITHOUT their
    * exchanges; preparation inserts them. */
  private def preparedPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }

  private def firstJoin(p: SparkPlan): Option[SparkPlan] = p.collectFirst {
    case j: SortMergeJoinExec => j
    case j: ShuffledHashJoinExec => j
  }

  /** Number of ShuffleExchange nodes UNDER the first shuffle-class
    * join in `df`'s prepared physical plan — 0 means the join runs
    * on the tables' own (bucketed) partitioning, i.e. co-located. */
  def joinShuffles(df: DataFrame): Int =
    firstJoin(preparedPlan(df))
      .map(_.collect { case e: ShuffleExchangeExec => e }.size)
      .getOrElse(-1)

  /** For each ShuffleExchange under the first shuffle-class join,
    * the number of clustering expressions in its hash partitioning —
    * a salted join shows 2 (key + salt) on both sides. */
  def joinExchangeArities(df: DataFrame): Seq[Int] =
    firstJoin(preparedPlan(df)).toSeq.flatMap(_.collect {
      case e: ShuffleExchangeExec => e.outputPartitioning match {
        case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
          h.expressions.size
        case _ => 0
      }
    })

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = (p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }).collect { case s: FileSourceScanExec => s }

  /** True when every file scan in the plan carries a non-empty
    * partition-pruning predicate (plan-time directory pruning). */
  def usesPartitionFilter(df: DataFrame): Boolean = {
    val ss = scans(preparedPlan(df))
    ss.nonEmpty && ss.forall(_.partitionFilters.exists(
      _.references.nonEmpty))
  }

  /** The PushedFilters metadata strings of every scan in the plan —
    * what actually reached the parquet reader. */
  def pushedFilters(df: DataFrame): Seq[String] =
    scans(preparedPlan(df)).map(_.metadata.getOrElse("PushedFilters", ""))

  /** Post-execution count of files the scan actually opened (the
    * `numFiles` metric). `DataFrame.inputFiles` reports the whole
    * relation REGARDLESS of pruning, so directory-pruning evidence
    * has to come from the executed scan itself. */
  def scannedFiles(df: DataFrame): Long = {
    df.collect() // runs df's OWN QueryExecution (count() would build a new one)
    scans(df.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
  }

  /** Post-execution scan output rows (after row-group skipping):
    * execute `df`, then sum its file scans' numOutputRows metric.
    * Zone-map evidence = this is far below the table row count on a
    * sorted layout under a pushed range predicate. */
  def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    scans(df.queryExecution.executedPlan)
      .map(_.metrics("numOutputRows").value).sum
  }
}
