package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType}

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

  /** Ordered conversion funnel: how many users reached each stage, where
    * reaching stage i+1 means an event of that type STRICTLY AFTER the
    * user's stage-i time and within `windowHours` of it (first-touch
    * chaining: each stage's time is the EARLIEST qualifying event).
    *
    * Single-pass design: one shuffle keyed on user_id collects the
    * per-stage timestamp lists (only events of funnel types are kept, so
    * state per user is bounded by that user's funnel-event count), then
    * the stage chain is evaluated per user with array expressions —
    * `array_min(filter(ts_i, t -> prev < t <= prev + window))` — no
    * self-joins, no re-scan per stage. A null stage time propagates
    * through the chain, so a user counts toward a stage only if every
    * earlier stage was reached in order. The final stage counts are one
    * global aggregate over users. */
  def funnel(events: DataFrame,
             stages: Seq[String] = Seq("view", "click", "purchase"),
             windowHours: Int = 24): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val tsCols = stages.indices.map(i => s"__ts_$i")
    val aggs = stages.zip(tsCols).map { case (st, c) =>
      collect_list(when(col("event_type") === st, col("ts"))).as(c)
    }
    val perUser = events
      .filter(col("event_type").isin(stages: _*))
      .groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
    val win = expr(s"INTERVAL $windowHours HOURS")
    val chain = tsCols.tail.foldLeft(Vector(array_min(col(tsCols.head)))) {
      (acc, c) =>
        val prev = acc.last
        acc :+ array_min(filter(col(c), t => t > prev && t <= prev + win))
    }
    val counted = perUser.agg(
      count(chain.head).as("__c0"),
      chain.tail.zipWithIndex.map { case (c, i) => count(c).as(s"__c${i + 1}") }: _*)
    counted
      .select(explode(array(stages.zipWithIndex.map { case (st, i) =>
        struct(lit(i + 1).cast(IntegerType).as("stage_idx"),
          lit(st).as("stage"), col(s"__c$i").as("users"))
      }: _*)).as("s"))
      .select(col("s.stage_idx").as("stage_idx"), col("s.stage").as("stage"),
        col("s.users").as("users"))
      .orderBy("stage_idx")
  }

  /** Cohort retention matrix over `cohortEvent` activity: users are
    * grouped by the day of their FIRST such event (the cohort), and each
    * cell counts how many of them were active again `day_offset` days
    * later, up to `horizonDays`.
    *
    * All heavy shuffles are keyed on user_id: one aggregate for the
    * cohort day, one distinct over (user, day) — activity collapses to
    * at most one row per user-day BEFORE the join, so the join input is
    * bounded by users x horizon, not by raw event volume. The final
    * (cohort_day, day_offset) aggregate is tiny. Per-group state is O(1)
    * throughout — no windows, no per-user lists — so the plan holds at
    * any event volume. */
  /** First-order Markov transition matrix over each user's event stream:
    * count and probability of event type B immediately following type A.
    * The sequence-mining primitive behind next-action prediction and
    * anomalous-flow detection. Order within a user is made total by the
    * (ts, event_id) tiebreak, so same-instant events transition
    * identically in both engines.
    *
    * Scale shape: one shuffle by user for the lead() window; the bigram
    * aggregate is two-phase (map-side partials), and the per-source
    * normalizer is a window over the #types² aggregated frame — tiny by
    * construction. */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val counts = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("__next", lead(col("event_type"), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val wt = org.apache.spark.sql.expressions.Window.partitionBy(col("from_type"))
    counts
      .withColumn("p_transition",
        round(col("n_transitions") / sum(col("n_transitions")).over(wt), 6))
      .orderBy("from_type", "to_type")
  }

  /** Last-touch attribution: for every purchase, the most recent PRIOR
    * non-purchase event by the same user, provided it happened within the
    * attribution window. One ignore-nulls `last()` over a rows frame —
    * deterministic under the (ts, event_id) total order — then the window
    * bound nulls out stale touches; no per-purchase range probe, no
    * self-join.
    *
    * Scale shape: one shuffle by user, one ordered pass; the frame is a
    * running carry (Spark evaluates the unbounded-preceding last() as an
    * incremental accumulator, not a re-scan per row). */
  def lastTouchAttribution(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val touch = struct(col("ts"), col("event_id"), col("event_type"))
    val prior = last(
      when(col("event_type") =!= "purchase", touch), ignoreNulls = true).over(w)
    events
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .withColumn("__t", prior)
      .filter(col("event_type") === "purchase")
      // A touch attributes only inside the window; outside → null columns,
      // keeping one output row per purchase either way.
      .withColumn("__ok",
        col("__t").isNotNull &&
          col("__t.ts") >= col("ts") - expr(s"INTERVAL $windowDays DAYS"))
      .select(
        col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"),
        when(col("__ok"), col("__t.event_type")).as("touch_type"),
        when(col("__ok"), col("__t.event_id")).as("touch_id"),
        // Exact integer microseconds — the fixture's timestamps carry
        // sub-second precision, so a seconds-truncating diff would be
        // engine-convention-sensitive; the raw epoch-micros delta is not.
        when(col("__ok"),
          unix_micros(col("ts")) - unix_micros(col("__t.ts")))
          .as("micros_since_touch"))
      .orderBy("purchase_id")
  }

  /** Session path analysis — the top event-type sequences users walk
    * within a session (5-minute inactivity gap): an explicit lag-based
    * sessionizer under the (ts, event_id) total order, splitting on
    * `gap >= 5 minutes` — the SAME convention the q80 oracle states and
    * DuckDB's gaps-and-islands formulation computes, made explicit here
    * rather than inherited from `session_window` (whose interval is
    * CLOSED at its end, so an event at exactly last+gap would merge —
    * a boundary-tie divergence that second-quantized production logs
    * would actually hit). The per-session event list is collected and
    * sorted inside the aggregate (bounded by session length — activity
    * rate × gap horizon, never stream length), and the path histogram
    * ranks via top-k, not a global sort. The sequence-mining companion
    * to [[eventTransitions]]: bigrams there, whole walks here.
    *
    * Scale shape: one shuffle by user shared by both windows (same
    * partitioning + ordering → one sort), then a hash aggregate keyed by
    * (user, session) and the tiny path histogram. */
  def sessionPaths(events: DataFrame, k: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("__new_session",
        when(lag(col("ts"), 1).over(w).isNull ||
          col("ts") - lag(col("ts"), 1).over(w) >= expr("INTERVAL 5 MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("__sid", sum(col("__new_session"))
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("__sid"))
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("__evs"))
      .select(concat_ws(">",
        transform(col("__evs"), e => e.getField("event_type"))).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(desc("n_sessions"), col("path"))
      .limit(k)
  }

  def cohortRetention(events: DataFrame,
                      cohortEvent: String = "purchase",
                      horizonDays: Int = 14): DataFrame = {
    val activity = events
      .filter(col("event_type") === cohortEvent)
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
    val firstDay = activity.groupBy(col("user_id"))
      .agg(min(col("d")).as("cohort_day"))
    val activeDays = activity.distinct()
    firstDay.join(activeDays, Seq("user_id"))
      .withColumn("day_offset", datediff(col("d"), col("cohort_day")).cast(IntegerType))
      .filter(col("day_offset") < horizonDays)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("active_users"))
      .orderBy("cohort_day", "day_offset")
  }
}
