package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Misra-Gries frequent-items sketch: at most `k` counters; any item whose
 * true count exceeds n/(k+1) is guaranteed to be present, and every
 * reported count is an underestimate by at most the total decrement
 * (≤ n/(k+1)). When the number of distinct items never exceeds k — in
 * any partial sketch or merge — no decrement ever fires and the counts
 * are EXACT, which is what the oracle-checked query exercises.
 *
 * The sketch is a bounded map, so a 100 TB aggregation carries at most
 * k counters per partition up the tree — the map-side-combinable
 * "top domains / top tokens" profile the reference computes with a full
 * groupBy + sort (pipeline.py's pandas value_counts equivalent).
 */
final class MisraGriesSketch(val k: Int) extends Serializable {
  val counts = new java.util.HashMap[UTF8String, java.lang.Long](k * 2)

  /** Add `w` occurrences of `item`. Caller must pass an owned (cloned)
    * UTF8String — rows reuse buffers. */
  def offer(item: UTF8String, w: Long): Unit = {
    val cur = counts.get(item)
    if (cur != null) { counts.put(item, cur + w); return }
    counts.put(item, w)
    if (counts.size > k) reduce()
  }

  /** Subtract the minimum count from every counter and drop zeros — the
    * batched Misra-Gries decrement (Agarwal et al.'s mergeable-summaries
    * formulation). */
  private def reduce(): Unit = {
    var min = Long.MaxValue
    val it = counts.values.iterator()
    while (it.hasNext) { val v = it.next().longValue(); if (v < min) min = v }
    val eit = counts.entrySet().iterator()
    while (eit.hasNext) {
      val e = eit.next()
      val nv = e.getValue.longValue() - min
      if (nv <= 0) eit.remove() else e.setValue(nv)
    }
  }

  def merge(other: MisraGriesSketch): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      offer(e.getKey, e.getValue.longValue())
    }
  }

  /** Top-n surviving counters as strings, (count desc, item asc). */
  def top(n: Int): Seq[(String, Long)] = {
    val all = new Array[(String, Long)](counts.size)
    val it = counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      all(i) = (e.getKey.toString, e.getValue.longValue()); i += 1
    }
    all.sortBy { case (item, c) => (-c, item) }.take(n).toSeq
  }
}

object MisraGriesSketch {

  def serialize(b: MisraGriesSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.counts.size)
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue.longValue())
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): MisraGriesSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sketch = new MisraGriesSketch(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      sketch.counts.put(UTF8String.fromBytes(buf),
        java.lang.Long.valueOf(in.readLong()))
      i += 1
    }
    sketch
  }
}

/**
 * `heavy_hitters(item, k)` — custom Catalyst [[TypedImperativeAggregate]]
 * over a [[MisraGriesSketch]]: map-side partial sketches, mergeable
 * across partitions, final output the surviving counters as
 * `array<struct<item string, n bigint>>` sorted by (n desc, item asc).
 */
case class HeavyHitters(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesSketch] with BinaryLike[Expression] {

  private lazy val k: Int = right.eval().asInstanceOf[Number].intValue()

  override def prettyName: String = "heavy_hitters"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("n", LongType))),
    containsNull = false)

  override def checkInputDataTypes() =
    if (left.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters expects a STRING item column, got ${left.dataType.catalogString}")
    else if (!right.foldable || right.eval() == null ||
      right.eval().asInstanceOf[Number].intValue() < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "heavy_hitters k must be a positive integer literal")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): MisraGriesSketch =
    new MisraGriesSketch(k)

  override def update(b: MisraGriesSketch, input: InternalRow): MisraGriesSketch = {
    val v = left.eval(input).asInstanceOf[UTF8String]
    if (v != null) b.offer(v.clone(), 1L)
    b
  }

  override def merge(b: MisraGriesSketch, o: MisraGriesSketch): MisraGriesSketch = {
    b.merge(o); b
  }

  override def eval(b: MisraGriesSketch): Any = {
    val arr = new Array[(UTF8String, Long)](b.counts.size)
    val it = b.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      arr(i) = (e.getKey, e.getValue.longValue()); i += 1
    }
    val sorted = arr.sortWith { case ((i1, n1), (i2, n2)) =>
      if (n1 != n2) n1 > n2 else i1.compareTo(i2) < 0
    }
    new GenericArrayData(sorted.map { case (item, n) =>
      new GenericInternalRow(Array[Any](item, n)): Any
    })
  }

  override def serialize(b: MisraGriesSketch): Array[Byte] =
    MisraGriesSketch.serialize(b)

  override def deserialize(bytes: Array[Byte]): MisraGriesSketch =
    MisraGriesSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HeavyHitters =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HeavyHitters =
    copy(left = newLeft, right = newRight)
}
