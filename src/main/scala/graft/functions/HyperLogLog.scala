package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * DETERMINISTIC HyperLogLog (Flajolet et al. 2007): 2^p max-of-rho
 * registers over the repo's shared md5-prefix 60-bit hash
 * (`conv(substr(md5(x),1,15),16,10)` — the same function every dedup
 * oracle replays, so the SKETCH itself is DuckDB-replayable, unlike
 * engine-native HLL implementations whose hash is private). The
 * aggregate returns the raw REGISTER ARRAY; the estimator
 * ([[GraftFunctions.hll_estimate]]) runs IN-PLAN over it with exact
 * integer arithmetic (Σ 2^(Q−r) fits a LONG for p ≤ 12), so the whole
 * chain — hash, registers, harmonic estimate, linear-counting
 * small-range branch — is oracle-checkable bit-for-bit.
 *
 * Why it exists at 100 TB: `COUNT(DISTINCT)` shuffles every distinct
 * key; this carries 2^p bytes per group up the aggregation tree
 * (map-side combinable, register-wise max under merge — commutative,
 * associative, idempotent, so partitioning never changes a register).
 * Standard error ≈ 1.04/√m (~3.3 % at p=10).
 *
 * Hash layout: top p bits index the register; rho = leading zeros of
 * the remaining (60−p)-bit suffix + 1 ∈ [1, 61−p]; an untouched
 * register holds 0.
 */
final class HllSketch(val p: Int) extends Serializable {
  val m: Int = 1 << p
  val regs: Array[Byte] = new Array[Byte](m)

  // One digest per sketch, not per row: the aggregate buffer is
  // single-threaded per task, so the instance is reused across offers
  // (digest() resets it); transient because MessageDigest is not
  // serializable — sketch transport goes through the register bytes
  // only, and a deserialized sketch lazily re-creates its digest.
  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")

  def offer(item: UTF8String): Unit = {
    val d = md.digest(item.getBytes)
    // first 15 hex chars = top 60 bits of the digest: bytes 0..6 full
    // (56 bits) + the high nibble of byte 7
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h = (h << 4) | ((d(7) >> 4) & 0xfL)
    val suffixBits = 60 - p
    val idx = (h >>> suffixBits).toInt
    val rem = h & ((1L << suffixBits) - 1)
    val rho =
      if (rem == 0L) suffixBits + 1
      else suffixBits - (64 - java.lang.Long.numberOfLeadingZeros(rem)) + 1
    if (rho > regs(idx)) regs(idx) = rho.toByte
  }

  /** Register-wise max — commutative/associative/idempotent. */
  def merge(other: HllSketch): Unit = {
    var i = 0
    while (i < m) {
      if (other.regs(i) > regs(i)) regs(i) = other.regs(i)
      i += 1
    }
  }
}

object HllSketch {
  def serialize(b: HllSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.p)
    out.write(b.regs)
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): HllSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sketch = new HllSketch(in.readInt())
    in.readFully(sketch.regs)
    sketch
  }
}

/**
 * `hll_registers(item, p)` — custom Catalyst
 * [[TypedImperativeAggregate]] over an [[HllSketch]]: map-side partial
 * sketches, register-wise-max merge, output `array<int>` of the 2^p
 * registers. Estimate with [[GraftFunctions.hll_estimate]].
 */
case class HllRegisters(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllSketch] with BinaryLike[Expression] {

  private lazy val p: Int = right.eval().asInstanceOf[Number].intValue()

  override def prettyName: String = "hll_registers"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes() =
    if (left.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hll_registers expects a STRING item column, got ${left.dataType.catalogString}")
    else if (!right.foldable || right.eval() == null || {
      val v = right.eval().asInstanceOf[Number].intValue(); v < 4 || v > 12
    })
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "hll_registers p must be an integer literal in [4, 12] " +
          "(2^p registers per group — the estimator's integer fold is " +
          "exactly 2^61 at worst for ANY p; the cap bounds sketch size)")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): HllSketch = new HllSketch(p)

  override def update(b: HllSketch, input: InternalRow): HllSketch = {
    val v = left.eval(input).asInstanceOf[UTF8String]
    if (v != null) b.offer(v)
    b
  }

  override def merge(b: HllSketch, o: HllSketch): HllSketch = {
    b.merge(o); b
  }

  override def eval(b: HllSketch): Any =
    new GenericArrayData(b.regs.map(_.toInt: Any))

  override def serialize(b: HllSketch): Array[Byte] = HllSketch.serialize(b)
  override def deserialize(bytes: Array[Byte]): HllSketch =
    HllSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): HllRegisters =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllRegisters =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HllRegisters =
    copy(left = newLeft, right = newRight)
}
