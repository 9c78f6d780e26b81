package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982; mergeability per
  * Agarwal et al., "Mergeable Summaries", PODS 2012). At most `capacity`
  * counters; every decrement step destroys `capacity + 1` units of stream
  * mass, so for any item
  *
  *   est <= true <= est + N / (capacity + 1)
  *
  * where N is the total (merged) stream mass — i.e. NO item with frequency
  * above N/(capacity+1) can be missing from the summary. That bound is what
  * makes the two-pass exact heavy-hitters pipeline
  * ([[graft.functions.SketchFunctions.exactHeavyHitters]]) exact: the sketch
  * pass can only over-generate candidates, never drop a true heavy hitter.
  *
  * Scale design: this is a mergeable, bounded-size aggregation state — Spark
  * runs it map-side (partial aggregation), shuffling one <= capacity-entry
  * sketch per partition per group instead of the full item stream. The
  * decrement step is O(capacity) but amortized O(1) per item: each decrement
  * event consumes `capacity + 1` previously-added units, so total decrement
  * work is bounded by total insert work.
  *
  * The vocabulary/top-token shape of the reference's text plane (reference
  * test coverage: feature-view aggregations; this generalizes them to
  * unbounded key domains at 100 TB).
  */
case class HeavyHittersAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesSketch] with UnaryLike[Expression] {

  require(capacity >= 1 && capacity <= (1 << 20),
    s"heavy_hitters capacity must be in [1, 2^20], got $capacity")

  override def prettyName: String = "heavy_hitters"
  override def nullable: Boolean = false
  override def dataType: DataType = HeavyHittersAgg.resultType

  override def createAggregationBuffer(): MisraGriesSketch = new MisraGriesSketch(capacity)

  override def update(buf: MisraGriesSketch, input: InternalRow): MisraGriesSketch = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: MisraGriesSketch, other: MisraGriesSketch): MisraGriesSketch = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: MisraGriesSketch): Any = {
    // deterministic output order: estimated count desc, then item asc
    val entries = buf.entries.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(entries.map { case (item, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), c))
    })
  }

  override def serialize(buf: MisraGriesSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val es = buf.entries
    out.writeInt(es.length)
    es.foreach { case (item, c) =>
      val b = item.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new MisraGriesSketch(capacity)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      sk.add(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    sk
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HeavyHittersAgg =
    copy(child = c)
}

object HeavyHittersAgg {
  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est_count", LongType, nullable = false))),
    containsNull = false)
}

/** The mutable MG counter set. Weighted adds keep merge = "replay the other
  * summary's counters", which preserves the N/(capacity+1) bound: every unit
  * of decrement still destroys capacity+1 units of total mass, independent
  * of add order or weights.
  */
final class MisraGriesSketch(val capacity: Int) {
  private val counts = new java.util.HashMap[String, Long](capacity * 2)

  def add(item: String, weight: Long): Unit = {
    var w = weight
    while (w > 0) {
      val cur = counts.getOrDefault(item, 0L)
      if (cur > 0L || counts.size < capacity) {
        counts.put(item, cur + w)
        w = 0
      } else {
        // full and item absent: decrement everything by d — either the new
        // item's remaining weight is absorbed (w <= min) or some counter
        // hits zero and frees a slot for the remainder.
        var min = Long.MaxValue
        val it0 = counts.values().iterator()
        while (it0.hasNext) { val c = it0.next(); if (c < min) min = c }
        val d = math.min(w, min)
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val c = e.getValue - d
          if (c <= 0L) it.remove() else e.setValue(c)
        }
        w -= d
      }
    }
  }

  def mergeIn(other: MisraGriesSketch): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(e.getKey, e.getValue)
    }
  }

  def entries: Array[(String, Long)] = {
    val out = new Array[(String, Long)](counts.size)
    val it = counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = (e.getKey, e.getValue)
      i += 1
    }
    out
  }
}
