package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) interleaving — the second axis of the lake layout
 * story: [[graft.io.ParquetSink.writeSortedBy]] gives min/max file
 * skipping on ONE key; sorting by the interleaved z-value gives
 * approximate locality on BOTH keys at once, so point/range predicates
 * on EITHER column (or both) skip most files — the clustered layout
 * Delta/Iceberg call OPTIMIZE ZORDER BY, here as a plain deterministic
 * expression over the existing range-sorted writer.
 *
 * The z-value of (a, b) interleaves their low `bits` bits: bit i of
 * `a` lands at position 2i, bit i of `b` at 2i+1 — a pure integer
 * expression (31 masked shift-ORs, codegen'd, no UDF), identical in
 * DuckDB ([[oracleExpr]] emits the same fold), so layouts are
 * reproducible across engines.
 *
 * Precondition: both inputs non-negative and below 2^bits (the demo
 * keys are; masking silently would destroy high-bit locality, so the
 * operator asserts instead — see the `zCheck` guard).
 */
object ZOrder {

  /** Interleaved z-value Column: bit i of `a` → 2i, bit i of `b` → 2i+1.
    * `(a & (1<<i)) << i` is `((a>>i)&1) << 2i` without the extract. */
  def zValue(a: Column, b: Column, bits: Int = 31): Column = {
    require(bits >= 1 && bits <= 31, "bits in [1, 31]")
    val guard = assert_true(zCheck(a, bits) && zCheck(b, bits),
      lit(s"z-order input out of [0, 2^$bits) — widen bits or pre-scale"))
    val z = (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(a.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(b.bitwiseAND(lit(1L << i)), i + 1))
    }
    // assert_true is NULL on success; the `when` forces its evaluation
    when(guard.isNull, z)
  }

  private def zCheck(c: Column, bits: Int): Column =
    c >= 0L && c < (1L << bits)

  /** The same fold as DuckDB SQL over column names — generated from one
    * definition so engine and oracle cannot drift. */
  def oracleExpr(a: String, b: String, bits: Int = 31): String = {
    require(bits >= 1 && bits <= 31, "bits in [1, 31]")
    (0 until bits).flatMap { i =>
      Seq(s"(($a & ${1L << i}) << $i)", s"(($b & ${1L << i}) << ${i + 1})")
    }.mkString("(", " | ", ")")
  }
}
