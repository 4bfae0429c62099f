package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val facts = Seq(
    (1L, 10L, ts("2024-01-01 09:00:00"), "a"),
    (2L, 10L, ts("2024-01-01 10:00:00"), "b"),  // == feature time: inclusive
    (3L, 10L, ts("2024-01-01 11:30:00"), "c"),
    (4L, 20L, ts("2024-01-01 08:00:00"), "d"),  // before any feature: null
    (5L, 20L, ts("2024-01-01 23:00:00"), "e"),
    (6L, 30L, ts("2024-01-01 12:00:00"), "f"))  // key with no features: null
    .toDF("fact_id", "user_id", "ts", "tag")

  private lazy val features = Seq(
    (10L, ts("2024-01-01 10:00:00"), 1.0),
    (10L, ts("2024-01-01 11:00:00"), 2.0),
    (20L, ts("2024-01-01 09:00:00"), 5.0))
    .toDF("user_id", "fts", "score")

  test("as-of join attaches the latest feature at-or-before each fact") {
    val got = AsOfJoin.asOf(facts, features, Seq("user_id"), "ts", "fts", Seq("score"))
      .orderBy("fact_id")
      .collect()
      .map(r => r.getAs[Long]("fact_id") ->
        (if (r.isNullAt(r.fieldIndex("score"))) None else Some(r.getAs[Double]("score"))))
      .toMap
    assert(got == Map(
      1L -> None,        // 09:00, first feature at 10:00
      2L -> Some(1.0),   // exactly at feature time — inclusive
      3L -> Some(2.0),   // 11:30 sees the 11:00 value, not 10:00
      4L -> None,        // before key 20's first feature
      5L -> Some(5.0),
      6L -> None))       // key 30 has no features at all
  }

  test("a version's NULL value is attached as NULL, never backfilled from older versions") {
    val feats = Seq(
      (10L, Some(ts("2024-01-01 10:00:00")), Some(1.0), Some("x")),
      (10L, Some(ts("2024-01-01 11:00:00")), None, Some("y")), // value NULLed in v2
      (10L, None, Some(99.0), Some("z")))                      // NULL ts: never applies
      .toDF("user_id", "fts", "score", "tag2")
    val fact = Seq((1L, 10L, ts("2024-01-01 12:00:00"), "a"))
      .toDF("fact_id", "user_id", "ts", "tag")
    val row = AsOfJoin.asOf(fact, feats, Seq("user_id"), "ts", "fts",
      Seq("score", "tag2")).collect().head
    // The 11:00 version applies: its score is NULL (not 1.0 from 10:00),
    // and BOTH columns come from that same version.
    assert(row.isNullAt(row.fieldIndex("score")))
    assert(row.getAs[String]("tag2") == "y")

    // A fact before any feature sees nothing — in particular not the
    // NULL-timestamp row, which must never match (SQL ASOF semantics).
    val early = Seq((2L, 10L, ts("2024-01-01 09:00:00"), "b"))
      .toDF("fact_id", "user_id", "ts", "tag")
    val er = AsOfJoin.asOf(early, feats, Seq("user_id"), "ts", "fts",
      Seq("score", "tag2")).collect().head
    assert(er.isNullAt(er.fieldIndex("score")) && er.isNullAt(er.fieldIndex("tag2")))
  }

  test("as-of join keeps every fact row and all fact columns (left semantics)") {
    val out = AsOfJoin.asOf(facts, features, Seq("user_id"), "ts", "fts", Seq("score"))
    assert(out.count() == facts.count())
    assert(out.columns.toSet == Set("user_id", "fact_id", "ts", "tag", "score"))
    // Original payload survives untouched.
    assert(out.orderBy("fact_id").select("tag").as[String].collect().toSeq ==
      Seq("a", "b", "c", "d", "e", "f"))
  }

  test("as-of join agrees with a per-fact driver-side scan on the events fixture") {
    val ev = Tables.events(spark, sf)
    val feats = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("value").as("fv"))
    val got = AsOfJoin.asOf(ev, feats, Seq("user_id"), "ts", "ts", Seq("fv"))
      .select("event_id", "user_id", "ts", "fv").collect()
      .map(r => r.getAs[Long]("event_id") -> Option(r.get(r.fieldIndex("fv")))).toMap

    val featRows = feats.collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("ts"), r.getAs[Double]("fv")))
    val want = ev.select("event_id", "user_id", "ts").collect().map { r =>
      val (id, uid, t) = (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("ts"))
      val eligible = featRows.filter { case (u, ft, _) => u == uid && !ft.after(t) }
      id -> (if (eligible.isEmpty) None
             else Some(eligible.maxBy { case (_, ft, _) => (ft.getTime, ft.getNanos) }._3))
    }.toMap
    assert(got.size == want.size)
    assert(got.map { case (k, v) => v == want(k) }.forall(identity))
  }
}
