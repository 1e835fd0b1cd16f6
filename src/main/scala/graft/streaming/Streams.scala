package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** One closed session per key: [start, end] with event/value rollups. */
case class SessionSummary(
    key: String,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long,
    sum_value: Double)

private[streaming] case class SessionState(
    start: Long, last: Long, n: Long, sum: Double)

/**
 * Structured Streaming operators (SURVEY.md §2.10 — the reference is
 * batch-only; these are the streaming extension a training-data pipeline
 * needs: streaming ingest dedup, windowed rollups, and stateful
 * sessionization).
 *
 * Scale notes: all three are keyed stateful ops — state lives in the
 * state store partitioned by key, watermarks bound state size and drop
 * late data deterministically. `dropDuplicatesWithinWatermark` keeps one
 * digest per id only until the watermark passes, so unbounded streams
 * don't accumulate unbounded state (the batch analogue is exact dedup by
 * groupBy).
 */
object Streams {

  /** Streaming exact dedup by id within the watermark horizon —
    * the streaming twin of TextDedup.exactGroups. */
  def dedupWithinWatermark(events: DataFrame, idCol: String,
      tsCol: String, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Event-time tumbling/sliding window counts + sums per event type. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, window: String = "1 hour",
      slide: Option[String] = None,
      watermark: String = "10 minutes"): DataFrame = {
    val w = slide match {
      case Some(s) => org.apache.spark.sql.functions
        .window(col(tsCol), window, s)
      case None => org.apache.spark.sql.functions.window(col(tsCol), window)
    }
    events.withWatermark(tsCol, watermark)
      .groupBy(w.as("win"), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
      .select(col("win.start").as("window_start"),
        col("win.end").as("window_end"), col(keyCol), col("n"),
        col("sum_value"))
  }

  /**
   * Gap-based sessionization via flatMapGroupsWithState: a session closes
   * when a later event of the same key arrives more than `gapMs` after it
   * (in-batch close), or when the event-time watermark passes its
   * timeout (cross-batch close). Event-time timeouts keep the query
   * deterministic and idle when no data arrives (a processing-time
   * timeout would re-trigger micro-batches continuously). Custom keyed
   * state — the pattern the reference has no answer to (its "sessions"
   * would be a batch group-by).
   *
   * Input columns (by position): key, event timestamp, value. Callers
   * must set the watermark on the timestamp column first.
   */
  def sessionize(events: Dataset[(String, Timestamp, Double)],
      gapMs: Long): Dataset[SessionSummary] = {
    implicit val stateEnc: Encoder[SessionState] = Encoders.product[SessionState]
    implicit val outEnc: Encoder[SessionSummary] = Encoders.product[SessionSummary]
    events.groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[(String, Timestamp, Double)],
            state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionSummary(key, new Timestamp(s.start),
              new Timestamp(s.last), s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_._2.getTime)
            var closed = List.empty[SessionSummary]
            var cur = state.getOption
            sorted.foreach { case (_, ts, v) =>
              val t = ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.last, t),
                    s.n + 1, s.sum + v))
                case Some(s) =>
                  closed ::= SessionSummary(key, new Timestamp(s.start),
                    new Timestamp(s.last), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, v))
                case None =>
                  cur = Some(SessionState(t, t, 1, v))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /**
   * Stream-stream interval join: each left event paired with right
   * events of the same key whose timestamp falls in
   * `[leftTs - lookback, leftTs]` — the streaming enrichment shape
   * (e.g. purchases joined to the clicks that preceded them).
   *
   * Both sides carry watermarks and the join condition bounds the time
   * range in both directions, so the state store can evict: left rows
   * age out once the right watermark passes `leftTs`, right rows once
   * the left watermark passes `rightTs + lookback`. An unbounded
   * condition would grow state forever — the classic stream-join pitfall.
   * Right key/ts columns must be pre-renamed to avoid collisions.
   */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      rightKeyCol: String, leftTs: String, rightTs: String,
      lookback: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      col(keyCol) === col(rightKeyCol) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback") &&
        col(rightTs) <= col(leftTs))
      .drop(rightKeyCol)
  }

  /**
   * Running heavy hitters per key group via mapGroupsWithState: each
   * micro-batch folds its items into a bounded Misra-Gries sketch
   * (the same [[graft.functions.MisraGriesSketch]] the batch aggregate
   * uses) and emits the current top items. State per key is at most k
   * counters — a streaming top-k whose state size never grows with the
   * stream. Input columns (by position): group key, item.
   */
  def runningHeavyHitters(events: Dataset[(String, String)], k: Int,
      topN: Int): Dataset[(String, Seq[(String, Long)])] = {
    implicit val outEnc: Encoder[(String, Seq[(String, Long)])] =
      Encoders.product[(String, Seq[(String, Long)])]
    implicit val stateEnc: Encoder[Array[Byte]] = Encoders.BINARY
    events.groupByKey(_._1)(Encoders.STRING)
      .mapGroupsWithState[Array[Byte], (String, Seq[(String, Long)])](
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, String)],
            state: GroupState[Array[Byte]]) =>
          val sketch = state.getOption
            .map(graft.functions.MisraGriesSketch.deserialize)
            .getOrElse(new graft.functions.MisraGriesSketch(k))
          rows.foreach { case (_, item) =>
            if (item != null)
              sketch.offer(
                org.apache.spark.unsafe.types.UTF8String.fromString(item), 1L)
          }
          state.update(graft.functions.MisraGriesSketch.serialize(sketch))
          key -> sketch.top(topN)
      }
  }

  /** Batch-mode equivalents of the streaming ops, for parity testing and
    * backfill: same semantics, runnable over a static frame. */
  object Batch {

    /** Gap-based sessionization as window functions: a new session starts
      * when the gap to the previous event exceeds gapMs. */
    def sessionize(events: DataFrame, keyCol: String, tsCol: String,
        valueCol: String, gapMs: Long): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val byKey = Window.partitionBy(keyCol).orderBy(col(tsCol))
      // cast tolerates TIMESTAMP_NTZ inputs (naive parquet timestamps):
      // with the session timezone pinned to UTC the wall-clock value IS
      // the instant, so epoch arithmetic is unchanged for LTZ columns
      val ts = col(tsCol).cast("timestamp")
      val newSession = when(
        unix_millis(ts) -
          unix_millis(lag(ts, 1).over(byKey)) > gapMs ||
          lag(col(tsCol), 1).over(byKey).isNull, 1L).otherwise(0L)
      events
        .withColumn("_new", newSession)
        .withColumn("_sid", sum(col("_new")).over(
          byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col(keyCol).as("key"), col("_sid"))
        .agg(min(col(tsCol)).as("session_start"),
          max(col(tsCol)).as("session_end"),
          count(lit(1)).as("n_events"),
          sum(col(valueCol)).as("sum_value"))
        .drop("_sid")
    }
  }
}
