package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Time-series / event-stream operators, batch-first (SURVEY.md §2.10):
  * tumbling, sliding and session windows over the `events` table, plus
  * JSON property extraction. The same window expressions run unchanged
  * under Structured Streaming (see [[graft.streaming.EventStreams]]).
  */
object Events {

  private def dec2(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** Tumbling 1-hour windows: groupBy(window(ts, "1 hour")). The window
    * struct's start is surfaced as a plain timestamp column. Partial
    * aggregation means each executor emits one row per (window, partition)
    * before the shuffle — scales linearly in distinct windows. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast(DoubleType).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("n_events"),
        col("sum_value"))
      .withColumn("avg_value", col("sum_value") / col("n_events"))
      .orderBy("window_start")

  /** Sliding windows: 1-hour length, 30-minute slide — each event lands in
    * exactly 2 windows (Spark plans this as a generate/explode + hash agg). */
  def slidingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"))
      .orderBy("window_start")

  /** Session windows: per-user sessions closed by a 5-minute inactivity gap.
    * `session_window` merges adjacent events server-side — the distributed
    * equivalent of the gaps-and-islands pattern. */
  def userSessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast(DoubleType).as("sum_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"),
        col("sum_value"))
      .orderBy("user_id", "session_start")

  /** Histogram by event type. */
  def typeHistogram(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast(DoubleType).as("sum_value"))
      .orderBy("event_type")

  /** Semi-structured extraction: pull `k` out of the JSON `props` column and
    * aggregate it per event type. get_json_object is a codegen'd builtin —
    * no UDF, stays inside whole-stage codegen. */
  def propsAggregate(events: DataFrame): DataFrame =
    events
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        count(col("k")).as("n_k"))
      .orderBy("event_type")

  /** Gap-filled hourly time series with forward fill — the feature-store
    * resample primitive (training frames need a value for EVERY step, not
    * just steps with observations): each user gets a dense hour grid over
    * their own [first, last] activity span; hours with no events carry
    * `n_events = 0` and the LAST observed hourly sum forward.
    *
    * Shape: one aggregation to hourly buckets, one tiny per-user span
    * aggregation whose `sequence()` explode generates the grid (rows
    * produced ∝ output, nothing quadratic), a left equi-join on
    * (user, hour), and one per-user ordered window for the fill —
    * partitioned by user, so parallelism scales with users, and the
    * running frame is O(1) state (`last` with ignoreNulls). `maxUsers`
    * bounds the demo grid; at production scale drop it and the same plan
    * streams every user. Sums accumulate in DECIMAL(18,2) (exact), cast
    * to double and rounded only on output — oracle-portable. */
  def forwardFillHourly(events: DataFrame, maxUsers: Long = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events
      .filter(col("user_id") < maxUsers)
      .withColumn("hour", date_trunc("hour", col("ts")))
    val hourly = ev
      .groupBy(col("user_id"), col("hour"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).as("__sum"))
    val grid = ev
      .groupBy(col("user_id"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(hourly, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        round(last(col("__sum"), ignoreNulls = true).over(w).cast(DoubleType), 6)
          .as("filled_value"))
      .orderBy("user_id", "hour")
  }
}
