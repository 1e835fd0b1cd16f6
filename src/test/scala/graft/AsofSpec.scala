package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** As-of join semantics: latest-at-or-before, strict mode, no-match
  * nulls, per-key isolation. */
class AsofSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    ("A", t("2026-01-01 10:00:00"), 100.0),
    ("A", t("2026-01-01 10:00:10"), 101.0),
    ("A", t("2026-01-01 10:00:20"), 102.0),
    ("B", t("2026-01-01 10:00:05"), 50.0))
    .toDF("sym", "qts", "price")

  private lazy val trades = Seq(
    ("A", t("2026-01-01 10:00:05"), 10L), // after 100, before 101
    ("A", t("2026-01-01 10:00:10"), 20L), // exactly at 101
    ("A", t("2026-01-01 09:59:59"), 30L), // before any quote
    ("B", t("2026-01-01 10:01:00"), 40L), // B's only quote
    ("C", t("2026-01-01 10:00:00"), 50L)) // no quotes for C
    .toDF("sym", "tts", "qty")

  test("as-of: latest quote at-or-before each trade, nulls when none") {
    val out = Relational.asofJoin(trades, quotes, Seq("sym"), "tts", "qts")
      .orderBy("sym", "tts")
      .select("sym", "qty", "price").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(out.toSeq === Seq(
      ("A", 30L, None), // 09:59:59 — before any quote
      ("A", 10L, Some(100.0)),
      ("A", 20L, Some(101.0)), // exact timestamp matches
      ("B", 40L, Some(50.0)),
      ("C", 50L, None))) // key with no right rows
  }

  test("range join: bucketed result equals the naive BETWEEN join") {
    val ev = Demo.table(spark, sf(), "events")
      .select("event_id", "user_id", "ts")
    val sess = graft.streaming.Streams.Batch.sessionize(
      Demo.table(spark, sf(), "events").select("user_id", "ts", "value"),
      "user_id", "ts", "value", gapMs = 1800000L)
      .withColumnRenamed("key", "user_id")
      .select("user_id", "session_start", "session_end", "n_events")
    val banded = Relational.rangeJoin(ev, sess, Seq("user_id"), "ts",
      "session_start", "session_end", bucketSeconds = 600)
    val naive = ev.join(sess, Seq("user_id"))
      .filter(col("ts") >= col("session_start") &&
        col("ts") <= col("session_end"))
    assert(banded.count() === naive.count())
    assert(banded.count() === ev.count()) // sessions partition the events
    assert(banded.select(banded.columns.map(col): _*)
      .exceptAll(naive.select(banded.columns.map(col): _*)).count() === 0)
  }

  test("strict as-of excludes the exact-timestamp quote") {
    val out = Relational.asofJoin(trades, quotes, Seq("sym"), "tts", "qts",
      allowExact = false)
      .filter(col("qty") === 20L).collect().head
    assert(out.getAs[Double]("price") === 100.0) // not the 10:00:10 quote
  }
}
