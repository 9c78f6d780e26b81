package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter membership plane: a mergeable bitset aggregate plus a
  * map-side probe expression sharing one hash scheme (XxHash64 double
  * hashing, Kirsch & Mitzenmacher 2006: h_i = h1 + i·h2), so a filter
  * built by [[BloomFilterAgg]] is probed bit-exactly by
  * [[BloomMightContain]].
  *
  * The 100 TB pattern this enables: a reference key set too large to
  * broadcast RAW (eval-set shingles, seen-URL sets, landed-corpus ids)
  * compresses to a few MB of bits — build with one map-side-combined
  * aggregation, ship the bytes as a literal, and prefilter the big side
  * map-side before any join. No false negatives ever (exactness is
  * restored by the exact join on survivors); false positives only cost
  * shuffled bytes, bounded by the classic (1 - e^{-kn/m})^k rate.
  */
object BloomCodec {
  /** Serialized layout: [int numHashes][long numBits][long... words]. */
  def encode(numHashes: Int, numBits: Long, words: Array[Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 8 + words.length * 8)
    buf.putInt(numHashes)
    buf.putLong(numBits)
    words.foreach(buf.putLong)
    buf.array()
  }

  final case class Decoded(numHashes: Int, numBits: Long, words: Array[Long])

  def decode(bytes: Array[Byte]): Decoded = {
    val buf = ByteBuffer.wrap(bytes)
    val k = buf.getInt
    val m = buf.getLong
    val words = new Array[Long]((bytes.length - 12) / 8)
    var i = 0
    while (i < words.length) { words(i) = buf.getLong; i += 1 }
    Decoded(k, m, words)
  }

  def hashes(item: UTF8String): (Long, Long) = (
    XxHash64Function.hash(item, StringType, 42L),
    XxHash64Function.hash(item, StringType, 0x9747b28cL))

  def bitIndex(h1: Long, h2: Long, i: Int, numBits: Long): Long = {
    val h = h1 + i.toLong * h2
    ((h % numBits) + numBits) % numBits
  }

  def contains(d: Decoded, item: UTF8String): Boolean = {
    val (h1, h2) = hashes(item)
    var i = 0
    while (i < d.numHashes) {
      val idx = bitIndex(h1, h2, i, d.numBits)
      if ((d.words((idx >>> 6).toInt) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Mutable bloom aggregation state. Merge is a word-wise OR, so the built
  * filter is bit-identical regardless of partitioning or merge order.
  */
final class BloomBuffer(val numHashes: Int, val numBits: Long) {
  val words = new Array[Long](((numBits + 63) / 64).toInt)

  def add(item: UTF8String): Unit = {
    val (h1, h2) = BloomCodec.hashes(item)
    var i = 0
    while (i < numHashes) {
      val idx = BloomCodec.bitIndex(h1, h2, i, numBits)
      words((idx >>> 6).toInt) |= 1L << (idx & 63)
      i += 1
    }
  }

  def orIn(other: BloomBuffer): Unit = {
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
  }
}

/** Aggregate a string column into bloom-filter bytes. Bounded mergeable
  * state (m/8 bytes) — Spark runs it map-side and shuffles one bitset per
  * partition per group.
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Long,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBuffer] with UnaryLike[Expression] {

  require(numBits >= 64 && numBits <= (1L << 33),
    s"bloom_agg numBits must be in [64, 2^33], got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"bloom_agg numHashes must be in [1, 16], got $numHashes")

  override def prettyName: String = "bloom_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomBuffer = new BloomBuffer(numHashes, numBits)

  override def update(buf: BloomBuffer, input: InternalRow): BloomBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: BloomBuffer, other: BloomBuffer): BloomBuffer = {
    buf.orIn(other)
    buf
  }

  override def eval(buf: BloomBuffer): Any =
    BloomCodec.encode(buf.numHashes, buf.numBits, buf.words)

  override def serialize(buf: BloomBuffer): Array[Byte] =
    BloomCodec.encode(buf.numHashes, buf.numBits, buf.words)

  override def deserialize(bytes: Array[Byte]): BloomBuffer = {
    val d = BloomCodec.decode(bytes)
    val buf = new BloomBuffer(d.numHashes, d.numBits)
    System.arraycopy(d.words, 0, buf.words, 0, d.words.length)
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomFilterAgg =
    copy(child = c)
}

/** `might_contain(bloomBytes, item)` — map-side bit probe with the same
  * double-hash scheme as [[BloomFilterAgg]]. The bloom side is typically a
  * literal (the collected filter); its decoded form is memoized by
  * reference so the per-row cost is k bit tests, no per-row decode.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires (binary, string), got ($l, $r)")
    }

  // Single volatile memo pair: expression instances are shared across
  // local[n] task threads (same lesson as BpeEncode's ConcurrentHashMap),
  // so two separate mutable fields could interleave — one bloom's ref
  // paired with another's decoded form would return wrong membership,
  // including false negatives. Reading/writing ONE immutable tuple keeps
  // the (ref, decoded) pair consistent; a lost race only costs a re-decode.
  @transient @volatile private var memo: (AnyRef, BloomCodec.Decoded) = _

  override def nullSafeEval(bloom: Any, item: Any): Any = {
    val bytes = bloom.asInstanceOf[Array[Byte]]
    var m = memo
    if (m == null || !(m._1 eq bytes)) {
      m = (bytes, BloomCodec.decode(bytes))
      memo = m
    }
    BloomCodec.contains(m._2, item.asInstanceOf[UTF8String])
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomMightContain =
    copy(left = l, right = r)
}
