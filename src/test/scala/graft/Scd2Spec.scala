package graft

import graft.operators.Scd2
import org.apache.spark.sql.DataFrame

/** Type-2 SCD merge: change/insert/delete/reappear case coverage,
  * idempotence, closed-row immutability, and the partial-feed mode. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val K = Seq("k")
  private val A = Seq("seg")

  private def snap(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("k", "seg")

  private def rows(h: DataFrame): Set[(Long, String, Long, Option[Long])] =
    h.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet

  test("init opens every snapshot row at the epoch") {
    val h = Scd2.init(snap(1L -> "a", 2L -> "b"), K, A, 0L)
    assert(rows(h) == Set((1L, "a", 0L, None), (2L, "b", 0L, None)))
  }

  test("change closes the old version and opens a new one; equal rows stay") {
    val h0 = Scd2.init(snap(1L -> "a", 2L -> "b"), K, A, 0L)
    val h1 = Scd2.merge(h0, snap(1L -> "a", 2L -> "B"), K, A, 1L)
    assert(rows(h1) == Set(
      (1L, "a", 0L, None),           // unchanged: still the epoch-0 row
      (2L, "b", 0L, Some(1L)),       // closed
      (2L, "B", 1L, None)))          // new open version
  }

  test("insert, delete (closeMissing), and reappearance start new versions") {
    val h0 = Scd2.init(snap(1L -> "a"), K, A, 0L)
    val h1 = Scd2.merge(h0, snap(2L -> "x"), K, A, 1L)
    assert(rows(h1) == Set(
      (1L, "a", 0L, Some(1L)),       // missing from the full snapshot
      (2L, "x", 1L, None)))          // inserted
    // key 1 re-fed with the SAME value: absence gap → NEW version,
    // the closed row is never reopened
    val h2 = Scd2.merge(h1, snap(1L -> "a", 2L -> "x"), K, A, 2L)
    assert(rows(h2) == Set(
      (1L, "a", 0L, Some(1L)),
      (1L, "a", 2L, None),
      (2L, "x", 1L, None)))
  }

  test("partial feed (closeMissing=false) leaves absent keys open") {
    val h0 = Scd2.init(snap(1L -> "a", 2L -> "b"), K, A, 0L)
    val h1 = Scd2.merge(h0, snap(2L -> "B"), K, A, 1L,
      closeMissing = false)
    assert(rows(h1) == Set(
      (1L, "a", 0L, None),           // untouched by the partial feed
      (2L, "b", 0L, Some(1L)),
      (2L, "B", 1L, None)))
  }

  test("re-applying the same snapshot is a no-op (idempotent fold)") {
    val h0 = Scd2.init(snap(1L -> "a", 2L -> "b"), K, A, 0L)
    val s = snap(1L -> "A", 2L -> "b")
    val h1 = Scd2.merge(h0, s, K, A, 1L)
    val h2 = Scd2.merge(h1, s, K, A, 2L)
    assert(rows(h2) == rows(h1))
  }

  test("closed rows pass through every later epoch untouched") {
    val h0 = Scd2.init(snap(1L -> "a"), K, A, 0L)
    val h1 = Scd2.merge(h0, snap(1L -> "b"), K, A, 1L)
    val h2 = Scd2.merge(h1, snap(1L -> "c"), K, A, 2L)
    val h3 = Scd2.merge(h2, snap(1L -> "c"), K, A, 3L)
    assert(rows(h3) == Set(
      (1L, "a", 0L, Some(1L)),
      (1L, "b", 1L, Some(2L)),
      (1L, "c", 2L, None)))
    // exactly one open version per live key
    assert(h3.filter($"valid_to".isNull).count() == 1)
  }

  test("null-safe attribute comparison: null -> value and value -> null are changes") {
    val h0 = Scd2.init(Seq((1L, null: String), (2L, "b"))
      .toDF("k", "seg"), K, A, 0L)
    val h1 = Scd2.merge(h0, Seq((1L, "a"), (2L, null: String))
      .toDF("k", "seg"), K, A, 1L)
    val got = h1.collect().map(r => (r.getLong(0),
      Option(r.getString(1)), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(got == Set(
      (1L, None, 0L, Some(1L)), (1L, Some("a"), 1L, None),
      (2L, Some("b"), 0L, Some(1L)), (2L, None, 1L, None)))
    // null == null is NOT a change
    val h2 = Scd2.merge(h1, Seq((1L, "a"), (2L, null: String))
      .toDF("k", "seg"), K, A, 2L)
    assert(h2.count() == h1.count())
  }

  test("is_current flags exactly the open versions") {
    val h0 = Scd2.init(snap(1L -> "a", 2L -> "b"), K, A, 0L)
    val h1 = Scd2.merge(h0, snap(1L -> "A", 2L -> "b"), K, A, 1L)
    val flagged = Scd2.withCurrentFlag(h1)
    assert(flagged.filter($"is_current").count() == 2)
    assert(flagged.filter(!$"is_current" && $"valid_to".isNull).count() == 0)
  }

  test("asOf reconstructs every fed snapshot exactly") {
    val snaps = Seq(
      snap(1L -> "a", 2L -> "b"),            // epoch 0
      snap(1L -> "A", 3L -> "c"),            // epoch 1: change, delete, insert
      snap(1L -> "A", 2L -> "b2", 3L -> "c")) // epoch 2: reappear changed
    val h = snaps.zipWithIndex.drop(1).foldLeft(
      Scd2.init(snaps.head, K, A, 0L)) { case (acc, (sn, e)) =>
        Scd2.merge(acc, sn, K, A, e.toLong)
      }
    snaps.zipWithIndex.foreach { case (sn, e) =>
      val got = Scd2.asOf(h, e.toLong).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val want = sn.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == want, s"asOf($e)")
    }
    // beyond the last epoch: still the latest snapshot
    val latest = Scd2.asOf(h, 99L).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(latest == Set((1L, "A"), (2L, "b2"), (3L, "c")))
  }

  test("multi-column keys and attributes merge on the full key") {
    val h0 = Scd2.init(Seq((1L, "x", "a", 10L), (1L, "y", "b", 20L))
      .toDF("k", "k2", "seg", "v"), Seq("k", "k2"), Seq("seg", "v"), 0L)
    val h1 = Scd2.merge(h0,
      Seq((1L, "x", "a", 11L), (1L, "y", "b", 20L))
        .toDF("k", "k2", "seg", "v"), Seq("k", "k2"), Seq("seg", "v"), 1L)
    val open = h1.filter($"valid_to".isNull).collect()
      .map(r => (r.getString(1), r.getLong(3))).toSet
    assert(open == Set(("x", 11L), ("y", 20L)))
    assert(h1.count() == 3)
  }
}
