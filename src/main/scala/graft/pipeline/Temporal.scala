package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal operators over the `events` table: as-of join and
 * gap-based sessionization. Both are single-shuffle window plans —
 * the scalable shape for time-ordered per-entity analytics at
 * 100 TB (the alternative, a range/theta join probe-vs-reference,
 * is quadratic per entity and never survives scale-up).
 *
 * Timestamps are carried as integer MICROSECONDS (`unix_micros`)
 * end to end: exact arithmetic, no float drift, and byte-identical
 * to DuckDB's `epoch_us` on the UTC-pinned session, so the oracle
 * re-derives every value.
 */
object Temporal {

  /** events projected to the integer-time core used by both ops */
  private def timed(events: DataFrame): DataFrame =
    events.select(
      col("event_id"), col("user_id"),
      unix_micros(col("ts").cast("timestamp")).as("ts_us"),
      col("event_type"), col("value"))

  /**
   * As-of join: for each `probeType` event, the most recent
   * `refType` event by the SAME user with ts_us <= the probe's
   * (ties at equal ts resolve to the reference — "at or before").
   *
   * Plan: both sides come from ONE scan; a marker column tags the
   * side; a single window partitioned by user_id, ordered by
   * (ts_us, is_probe, event_id), carries the last-seen reference
   * forward with `last(..., ignoreNulls)` over UNBOUNDED PRECEDING.
   * Exactly one hash exchange (user_id) + one sort — no range join,
   * no per-probe scan. At 10^9 users the exchange spreads evenly;
   * a pathological single-entity skew would be salted by time range
   * (not needed for this data model, where user_id is the natural
   * high-cardinality key).
   */
  def asOfJoin(events: DataFrame, probeType: String, refType: String): DataFrame = {
    val tagged = timed(events)
      .filter(col("event_type").isin(probeType, refType))
      .withColumn("is_probe", (col("event_type") === probeType).cast("int"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("is_probe"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def refOnly(c: Column): Column = when(col("is_probe") === 0, c)
    // all carried columns in ONE projection so Catalyst plans a single
    // Window operator (chained withColumn stacks three window passes
    // over the same sort)
    tagged
      .select(col("event_id"), col("user_id"), col("ts_us"), col("is_probe"),
        last(refOnly(col("event_id")), ignoreNulls = true).over(w).as("ref_event_id"),
        last(refOnly(col("ts_us")), ignoreNulls = true).over(w).as("ref_ts_us"),
        last(refOnly(round(col("value") * 100).cast("long")), ignoreNulls = true).over(w).as("ref_cents"))
      .filter(col("is_probe") === 1)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("ref_event_id"), col("ref_ts_us"), col("ref_cents"),
        (col("ts_us") - col("ref_ts_us")).as("lag_us"))
  }

  /**
   * Gap-based sessionization: a session breaks when the time since
   * the previous event of the same user exceeds `gapUs`. Emits one
   * row per session with integer aggregates only (cents, counts,
   * micros) so the DuckDB oracle is byte-exact.
   *
   * Plan: one window (lag + running sum of break flags) on the
   * user_id exchange, then a partial-aggregated groupBy on
   * (user_id, session_idx). The second exchange moves one partial
   * row per session per task — at 100 TB the window's sort
   * dominates and the agg exchange is session-cardinality, not
   * event-cardinality.
   */
  def sessionize(events: DataFrame, gapUs: Long): DataFrame = {
    val e = timed(events)
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .withColumn("is_purchase", (col("event_type") === lit("purchase")).cast("long"))
    val ord = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val prev = lag(col("ts_us"), 1).over(ord)
    val sessioned = e
      .withColumn("brk",
        when(prev.isNull || col("ts_us") - prev > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("brk")).over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessioned.groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        sum(col("cents")).as("cents"),
        sum(col("is_purchase")).as("n_purchases"))
  }
}
