package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Type-2 slowly-changing-dimension merge — history-preserving upserts
 * for the golden-record mart (the type-2 counterpart of [[Merge]]'s
 * overwrite/patch semantics; the reference's dbt layer materializes
 * type-1 marts — `/root/reference/dbt/models/marts/` — so versioned
 * history is the natural warehouse extension, following the dbt
 * snapshot "check" strategy).
 *
 * History schema: key columns + attribute columns + `valid_from`
 * (epoch the version became current) + `valid_to` (epoch it stopped,
 * NULL while open). Applying a snapshot at `epoch`:
 *  - matched key, attributes EQUAL (null-safe) → open row unchanged;
 *  - matched key, attributes differ → the open row closes
 *    (`valid_to = epoch`) and a new open version inserts;
 *  - snapshot-only key → new open version (`valid_from = epoch`);
 *  - history-only key → closed at `epoch` when `closeMissing` (full
 *    snapshot semantics: absence is deletion), else left open
 *    (partial-feed semantics);
 *  - already-closed rows pass through untouched. A key deleted and
 *    later re-fed starts a NEW version (an absence gap never
 *    reopens a closed row).
 *
 * Scale shape: ONE key-partitioned full-outer join between the OPEN
 * slice and the snapshot per epoch, then a map-side per-row emission
 * (explode of a ≤2-element struct array — close + reinsert travel in
 * the same task, no second shuffle) unioned with the closed pass-through.
 * No global windows, no driver state; the snapshot side broadcasts
 * when small. Callers requiring uniqueness must feed snapshots with
 * one row per key (standard dimension-feed contract, not checked here).
 */
object Scd2 {

  /** Bootstrap a history from the first snapshot: every row an open
    * version at `epoch`. */
  def init(snapshot: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String], epoch: Long): DataFrame =
    snapshot.select(
      (keyCols ++ attrCols).map(col) :+
        lit(epoch).as("valid_from") :+
        lit(null).cast("long").as("valid_to"): _*)

  /** Apply one snapshot epoch to a type-2 history (see object doc). */
  def merge(history: DataFrame, snapshot: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String], epoch: Long,
      closeMissing: Boolean = true): DataFrame = {
    val outCols = keyCols ++ attrCols ++ Seq("valid_from", "valid_to")
    val closed = history.filter(col("valid_to").isNotNull)
      .select(outCols.map(col): _*)
    val open = history.filter(col("valid_to").isNull)
    val snap = snapshot.select((keyCols ++ attrCols).map(col): _*)
      .withColumn("__present", lit(1))

    val j = open.as("o").join(snap.as("n"),
      keyCols.map(k => col(s"o.$k") === col(s"n.$k")).reduce(_ && _),
      "full_outer")
    val hasOld = col("o.valid_from").isNotNull
    val hasNew = col("n.__present").isNotNull
    val changedCol = attrCols
      .map(a => !(col(s"o.$a") <=> col(s"n.$a")))
      .reduceOption(_ || _).getOrElse(lit(false))

    def row(keySide: String, attrSide: String, from: Column,
        to: Column): Column =
      struct(
        keyCols.map(k => col(s"$keySide.$k").as(k)) ++
          attrCols.map(a => col(s"$attrSide.$a").as(a)) ++
          Seq(from.as("valid_from"), to.cast("long").as("valid_to")): _*)

    val keep = row("o", "o", col("o.valid_from"), lit(null))
    val close = row("o", "o", col("o.valid_from"), lit(epoch))
    val fresh = row("n", "n", lit(epoch), lit(null))

    val rows =
      when(hasOld && hasNew && changedCol, array(close, fresh))
        .when(hasOld && hasNew, array(keep))
        .when(!hasOld, array(fresh))
        .otherwise(array(if (closeMissing) close else keep))

    closed.unionByName(
      j.select(explode(rows).as("__r")).select(col("__r.*")))
  }

  /** `is_current` presentation flag (open version ⇔ NULL `valid_to`). */
  def withCurrentFlag(historyDf: DataFrame): DataFrame =
    historyDf.withColumn("is_current", col("valid_to").isNull)

  /** Time-travel read: the dimension AS OF `epoch` — versions whose
    * validity interval covers it (`valid_from ≤ epoch < valid_to`,
    * open = unbounded). The reconstruction contract: over a history
    * folded from full snapshots with `closeMissing = true`, `asOf(e)`
    * equals snapshot `e` EXACTLY — the oracle-gated property that
    * pins the whole fold (a map-side filter; partition pruning applies
    * when the history is stored partitioned by `valid_to IS NULL`). */
  def asOf(history: DataFrame, epoch: Long): DataFrame =
    history.filter(col("valid_from") <= epoch &&
      (col("valid_to").isNull || col("valid_to") > epoch))
      .drop("valid_from", "valid_to")
}
