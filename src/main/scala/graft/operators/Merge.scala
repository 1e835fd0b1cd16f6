package graft.operators

import graft.etl.Clean
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Idempotent merge operators — the engine-level model of the reference's
 * four Postgres loaders (src/load/load_postgres.py:124-372):
 * append with ON CONFLICT DO NOTHING (web), whole-row upsert by key (abr,
 * matches), and the column-precedence golden merge
 * (src/load/upsert_logic.py:87-168). The reference achieves these with
 * driver-side psycopg2 execute_batch at ~6K rows/s (rawlog.txt:193-393);
 * here they are distributed joins: both sides shuffle-partition on the
 * merge key, so a 100 TB target table merges with per-key locality and no
 * driver involvement. With AQE on, a small incoming side broadcasts
 * automatically.
 *
 * All three dedup the incoming side first (deterministic keep-first) so a
 * batch containing the same key twice cannot produce duplicate output —
 * matching ON CONFLICT semantics where later statements win row-at-a-time
 * but set output is single-row-per-key.
 */
object Merge {

  private def dedup(incoming: DataFrame, keys: Seq[String]): DataFrame =
    Clean.dedupKeepFirst(incoming, keys,
      incoming.columns.filterNot(keys.contains).toSeq)

  /** ON CONFLICT DO NOTHING: keep every existing row; add incoming rows
    * whose key is absent (load_postgres.py:124-178, web_companies). */
  def insertIfAbsent(existing: DataFrame, incoming: DataFrame,
      keys: Seq[String]): DataFrame =
    existing.unionByName(
      dedup(incoming, keys).join(existing.select(keys.map(col): _*),
        keys, "left_anti"))

  /** Whole-row upsert: incoming replaces the existing row with the same
    * key; unmatched existing rows survive (load_postgres.py:180-248,
    * abr_entities / entity_match_results). */
  def upsert(existing: DataFrame, incoming: DataFrame,
      keys: Seq[String]): DataFrame =
    dedup(incoming, keys).unionByName(
      existing.join(incoming.select(keys.map(col): _*), keys, "left_anti"))

  /** Column-precedence merge: for keys present on both sides take the
    * incoming value unless it is null, else keep existing (the golden-
    * record per-field precedence of upsert_logic.py:111-168). Keys present
    * on only one side pass through. Column set = union of both schemas. */
  def patch(existing: DataFrame, incoming: DataFrame,
      keys: Seq[String]): DataFrame = {
    val inc = dedup(incoming, keys)
    val allCols = existing.columns ++
      inc.columns.filterNot(existing.columns.contains)
    val ex = existing.as("ex")
    val in = inc.as("in")
    val merged = ex.join(in, keys, "full_outer")
    merged.select(allCols.map { c =>
      val hasEx = existing.columns.contains(c)
      val hasIn = inc.columns.contains(c)
      if (keys.contains(c)) col(c)
      else if (hasEx && hasIn) coalesce(col(s"in.$c"), col(s"ex.$c")).as(c)
      else if (hasIn) col(s"in.$c").as(c)
      else col(s"ex.$c").as(c)
    }: _*)
  }
}
