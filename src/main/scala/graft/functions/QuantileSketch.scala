package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * DETERMINISTIC quantile sketch (round-14 verdict ask #2 — the HLL
 * discipline applied to percentiles): a BOTTOM-K hash sample over the
 * repo's shared md5-prefix 60-bit hash of a caller-supplied UNIQUE KEY
 * column. The sketch keeps the values of the k rows with the smallest
 * (hash, value) — a uniform random sample whose randomness is the
 * hash, so it is a pure function of the input SET: order-invariant,
 * partition-invariant, idempotent under re-aggregation of the same
 * rows, and DuckDB-replayable bit-for-bit (`ORDER BY hash, value
 * LIMIT k` — the same `substr(md5(x),1,15)` idiom every dedup oracle
 * replays).
 *
 * Why bottom-k instead of KLL/t-digest: those sketches' compaction
 * decisions depend on ARRIVAL ORDER (or RNG), so two partitionings of
 * the same data yield different sketches — unacceptable under this
 * repo's oracle-replay + partition-invariance discipline. The trade is
 * error: rank error ~1/√k (k=1024 → ~3%, the same envelope class as
 * HLL's 1.04/√m) instead of KLL's ~1/k; for percentile GATES over
 * arbitrary-grain signals at 100 TB (the CCNet/FineWeb pattern) that
 * is the standard operating point, and the k·16-byte sketch rides the
 * aggregation tree map-side exactly like the HLL registers.
 *
 * Merge = multiset union keeping the k smallest: an element of the
 * global bottom-k is in its partition's bottom-k, so merged partials
 * EQUAL the single-pass sketch — the property the incremental
 * (epoch-partial, merge-on-read) layout relies on.
 *
 * Estimation ([[GraftFunctions.quantile_estimate]]) happens IN-PLAN:
 * sort the sample by value, take index `floor(q·(n−1))` (lower
 * nearest-rank — no interpolation, so engine and oracle agree exactly
 * on doubles).
 */
final class QuantileSample(val k: Int) extends Serializable {

  // max-heap on (h desc, v desc): the largest retained entry is the
  // eviction candidate
  private[functions] val heap =
    new java.util.PriorityQueue[QuantileSample.Entry](math.max(16, k),
      QuantileSample.evictOrder)

  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")

  /** The shared md5-prefix 60-bit hash ([[HllSketch.offer]]'s layout —
    * `conv(substr(md5(x),1,15),16,10)`). */
  private def hash60(key: UTF8String): Long = {
    val d = md.digest(key.getBytes)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) >> 4) & 0xfL)
  }

  def offer(key: UTF8String, v: Double): Unit =
    offerEntry(hash60(key), v)

  def offerEntry(h: Long, v: Double): Unit = {
    if (heap.size < k) heap.add(QuantileSample.Entry(h, v))
    else {
      val top = heap.peek()
      if (h < top.h || (h == top.h && v < top.v)) {
        heap.poll()
        heap.add(QuantileSample.Entry(h, v))
      }
    }
  }

  /** Multiset union keeping the k smallest. PRECONDITION: the inputs
    * must cover DISJOINT row sets — merge does not dedupe, so a row
    * presented twice (the same epoch read twice, a sketch merged with
    * itself) contributes two sample slots and biases the estimate
    * toward its value. The epoch-partial layout satisfies this by
    * construction (each `batch_id` partition is written exactly once,
    * idempotent overwrite on replay); a caller merging arbitrary
    * partials owns the disjointness. Dedup is deliberately NOT built
    * in: collapsing exact (h, v) collisions would also collapse
    * genuinely distinct rows that collide (distinct keys, equal value,
    * 60-bit hash collision), silently breaking the `ORDER BY hash,
    * value LIMIT k` oracle replay. */
  def merge(o: QuantileSample): Unit = {
    val it = o.heap.iterator()
    while (it.hasNext) { val e = it.next(); offerEntry(e.h, e.v) }
  }

  /** Entries in (h asc, v asc) order — the deterministic output. */
  def sorted: Array[QuantileSample.Entry] = {
    val out = heap.toArray(new Array[QuantileSample.Entry](heap.size))
    java.util.Arrays.sort(out, QuantileSample.outputOrder)
    out
  }
}

object QuantileSample {
  final case class Entry(h: Long, v: Double)

  /** Max-heap order: LARGEST (h, v) first (the eviction candidate). */
  val evictOrder: java.util.Comparator[Entry] =
    new java.util.Comparator[Entry] {
      override def compare(a: Entry, b: Entry): Int = {
        val c = java.lang.Long.compare(b.h, a.h)
        if (c != 0) c else java.lang.Double.compare(b.v, a.v)
      }
    }

  /** Output order: (h asc, v asc). */
  val outputOrder: java.util.Comparator[Entry] =
    new java.util.Comparator[Entry] {
      override def compare(a: Entry, b: Entry): Int = {
        val c = java.lang.Long.compare(a.h, b.h)
        if (c != 0) c else java.lang.Double.compare(a.v, b.v)
      }
    }

  def serialize(s: QuantileSample): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(s.k)
    val entries = s.sorted
    out.writeInt(entries.length)
    entries.foreach { e => out.writeLong(e.h); out.writeDouble(e.v) }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): QuantileSample = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new QuantileSample(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { s.offerEntry(in.readLong(), in.readDouble()); i += 1 }
    s
  }
}

/** Shared implementation of the two eval shapes. */
sealed trait QuantileSketchBase
  extends TypedImperativeAggregate[QuantileSample]
  with TernaryLike[Expression] {

  def first: Expression  // value (double)
  def second: Expression // key (string — unique row id; the hash seed)
  def third: Expression  // k (int literal)

  protected lazy val k: Int = third.eval().asInstanceOf[Number].intValue()

  override def nullable: Boolean = false

  override def checkInputDataTypes() =
    if (first.dataType != DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a DOUBLE value column, got ${first.dataType.catalogString}")
    else if (second.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a STRING key column, got ${second.dataType.catalogString}")
    else if (!third.foldable || third.eval() == null || {
      val v = third.eval().asInstanceOf[Number].intValue()
      v < 16 || v > 65536
    })
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName k must be an integer literal in [16, 65536] " +
          "(the sketch carries 16·k bytes per group up the tree)")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): QuantileSample =
    new QuantileSample(k)

  override def update(b: QuantileSample, input: InternalRow): QuantileSample = {
    val v = first.eval(input)
    val key = second.eval(input)
    if (v != null && key != null)
      b.offer(key.asInstanceOf[UTF8String], v.asInstanceOf[Double])
    b
  }

  override def merge(b: QuantileSample, o: QuantileSample): QuantileSample = {
    b.merge(o); b
  }

  override def serialize(b: QuantileSample): Array[Byte] =
    QuantileSample.serialize(b)
  override def deserialize(bytes: Array[Byte]): QuantileSample =
    QuantileSample.deserialize(bytes)
}

/**
 * `quantile_sketch(value, key, k)` — the sample VALUES in (hash, value)
 * order: the serving output [[GraftFunctions.quantile_estimate]] reads.
 */
case class QuantileSketchValues(
    first: Expression,
    second: Expression,
    third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends QuantileSketchBase {

  override def prettyName: String = "quantile_sketch"
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def eval(b: QuantileSample): Any =
    new GenericArrayData(b.sorted.map(_.v: Any))

  override def withNewMutableAggBufferOffset(offset: Int): QuantileSketchValues =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QuantileSketchValues =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): QuantileSketchValues =
    copy(first = f, second = s, third = t)
}

/**
 * `quantile_sketch_partial(value, key, k)` — the PERSISTABLE partial:
 * (h, v) structs in (h asc, v asc) order. Epoch partials merge on read
 * via [[GraftFunctions.quantile_merge]] (flatten → sort → first k) and
 * EQUAL the batch sketch — the incremental layout's gate.
 */
case class QuantileSketchPartial(
    first: Expression,
    second: Expression,
    third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends QuantileSketchBase {

  override def prettyName: String = "quantile_sketch_partial"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false))), containsNull = false)

  override def eval(b: QuantileSample): Any =
    new GenericArrayData(b.sorted.map(e =>
      InternalRow(e.h, e.v): Any))

  override def withNewMutableAggBufferOffset(offset: Int): QuantileSketchPartial =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QuantileSketchPartial =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): QuantileSketchPartial =
    copy(first = f, second = s, third = t)
}
