package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hash-family text expressions for the dedup plane.
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`zip_with`) have
  * no codegen: every element evaluation walks the interpreted expression
  * tree, which makes shingling/minhashing/simhashing ~50-100× slower than a
  * plain JVM loop. These expressions collapse each whole per-row computation
  * into one `eval` call (CodegenFallback costs one virtual call per ROW, not
  * per element — irrelevant next to the loop). All hashing is Spark's own
  * XxHash64 (seed 42, same as the `xxhash64` SQL function), fully
  * deterministic.
  *
  * At 100 TB all of these run map-side inside a scan stage: no shuffle, no
  * state, linear in input bytes.
  */

/** Distinct xxhash64 values of word n-gram shingles over a token array.
  * Equivalent to hashing `array_join(slice(tokens, i, n), " ")` for every i
  * (the set Jaccard is defined on). Output is SORTED ascending so downstream
  * set ops (JaccardSim) can merge without allocation.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val t = arr.numElements()
    val seen = new mutable.LinkedHashSet[Long]
    // assemble shingle bytes directly (no String round-trip): UTF8String
    // concat of tokens + ' ' separators hashes identically to hashing
    // UTF8String.fromString(tokens.mkString(" "))
    var buf = new Array[Byte](256)
    def hashShingle(from: Int, len: Int): Unit = {
      var need = len - 1  // separators
      var j = 0
      while (j < len) { need += arr.getUTF8String(from + j).numBytes(); j += 1 }
      if (buf.length < need) buf = new Array[Byte](math.max(need, buf.length * 2))
      var off = 0
      j = 0
      while (j < len) {
        if (j > 0) { buf(off) = ' '; off += 1 }
        val s = arr.getUTF8String(from + j)
        s.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
        off += s.numBytes()
        j += 1
      }
      seen.add(XxHash64Function.hash(UTF8String.fromBytes(buf, 0, off), StringType, 42L))
    }
    if (t == 0) {
      seen.add(XxHash64Function.hash(UTF8String.EMPTY_UTF8, StringType, 42L))
    } else if (t < n) {
      hashShingle(0, t)
    } else {
      var i = 0
      while (i <= t - n) { hashShingle(i, n); i += 1 }
    }
    // sorted output → JaccardSim takes the allocation-free merge path
    val out = seen.toArray
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
}

/** MinHash signature over a long-hash set: k permutations
  * h_i = ((h mod P)·a_i + b_i) mod P with P = 2^31−1, deterministic a/b.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  private val P = 2147483647L
  private val as: Array[Long] = Array.tabulate(k)(i => 2L * i + 1)
  private val bs: Array[Long] = Array.tabulate(k)(i =>
    java.lang.Math.floorMod(0x9E3779B97F4A7C15L + i * 0x632BE59BD9B4E019L, P))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val hashes = v.asInstanceOf[ArrayData].toLongArray()
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      var m = Long.MaxValue
      val a = as(j); val b = bs(j)
      var i = 0
      while (i < hashes.length) {
        val h = java.lang.Math.floorMod(hashes(i), P)
        val p = (h * a + b) % P
        if (p < m) m = p
        i += 1
      }
      out(j) = if (hashes.isEmpty) 0L else m
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** Jaccard similarity |A∩B| / |A∪B| of two long-hash arrays (need not be
  * pre-deduplicated; duplicates are collapsed here).
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType

  private def isSortedDistinct(a: Array[Long]): Boolean = {
    var i = 1
    while (i < a.length) { if (a(i - 1) >= a(i)) return false; i += 1 }
    true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toLongArray()
    val ys = b.asInstanceOf[ArrayData].toLongArray()
    if (xs.isEmpty && ys.isEmpty) return 1.0
    // fast path: pre-sorted distinct inputs (what ShingleHashes emits) →
    // allocation-free merge count; fallback: hash sets
    if (isSortedDistinct(xs) && isSortedDistinct(ys)) {
      var i = 0; var j = 0; var inter = 0
      while (i < xs.length && j < ys.length) {
        if (xs(i) == ys(j)) { inter += 1; i += 1; j += 1 }
        else if (xs(i) < ys(j)) i += 1
        else j += 1
      }
      val union = xs.length + ys.length - inter
      return if (union == 0) 1.0 else inter.toDouble / union
    }
    val sa = new java.util.HashSet[Long](xs.length * 2)
    var i = 0
    while (i < xs.length) { sa.add(xs(i)); i += 1 }
    val sb = new java.util.HashSet[Long](ys.length * 2)
    var inter = 0
    i = 0
    while (i < ys.length) {
      val y = ys(i)
      if (sb.add(y) && sa.contains(y)) inter += 1
      i += 1
    }
    val union = sa.size + sb.size - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
}

/** 64-bit SimHash over a token array: per-token xxhash64 (seed 42), per-bit
  * ±1 votes, sign → bit. Equivalent to the aggregate/zip_with formulation
  * but one JVM loop per row.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val t = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < t) {
      val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** Canonical bag-of-words fingerprint: md5 hex over the sorted distinct
  * token set joined by ' '. Binary (byte-wise) sort order — identical to
  * Spark's `array_sort` and DuckDB's `list_sort` on strings. One JVM loop
  * per row (array_sort/array_distinct are interpreted per element and
  * dominate runtime otherwise).
  */
case class TokenSetFingerprint(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val t = arr.numElements()
    val seen = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < t) { seen.add(arr.getUTF8String(i).clone()); i += 1 }
    val md = java.security.MessageDigest.getInstance("MD5")
    var first = true
    val it = seen.iterator()
    while (it.hasNext) {
      if (!first) md.update(' '.toByte)
      md.update(it.next().getBytes)
      first = false
    }
    val digest = md.digest()
    val hex = new Array[Byte](32)
    val hexChars = "0123456789abcdef".getBytes
    i = 0
    while (i < 16) {
      hex(2 * i) = hexChars((digest(i) >> 4) & 0xF)
      hex(2 * i + 1) = hexChars(digest(i) & 0xF)
      i += 1
    }
    UTF8String.fromBytes(hex)
  }

  override protected def withNewChildInternal(c: Expression): TokenSetFingerprint = copy(child = c)
}

/** Winnowing document fingerprint (the MOSS algorithm): character-level
  * k-gram Rabin–Karp ROLLING hashes over the UTF-8 bytes, then each window
  * of `w` consecutive gram hashes contributes its minimum (rightmost on
  * ties) — guaranteeing any shared substring of length ≥ k+w−1 contributes
  * at least one common print. Output is the SORTED DISTINCT selected hashes:
  * a compact sketch (~len/w prints) on which [[JaccardSim]] measures
  * document overlap. One JVM loop per row, map-side, linear in bytes.
  */
case class WinnowingFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 2 && w >= 1, s"need k >= 2 and w >= 1, got k=$k w=$w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val B = 1000003L
  private val Bk1 = { var p = 1L; var i = 0; while (i < k - 1) { p *= B; i += 1 }; p }

  // splitmix64 finalizer: raw polynomial hashes of nearby grams correlate,
  // which would bias the window-min selection
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    val selected = new java.util.TreeSet[java.lang.Long]()
    if (n < k) {
      var h = 0L
      var i = 0
      while (i < n) { h = h * B + (bytes(i) & 0xFFL); i += 1 }
      selected.add(mix(h))
    } else {
      val grams = n - k + 1
      val hs = new Array[Long](grams)
      var h = 0L
      var i = 0
      while (i < k) { h = h * B + (bytes(i) & 0xFFL); i += 1 }
      hs(0) = mix(h)
      i = 1
      while (i < grams) {
        h = (h - (bytes(i - 1) & 0xFFL) * Bk1) * B + (bytes(i + k - 1) & 0xFFL)
        hs(i) = mix(h)
        i += 1
      }
      // winnow: rightmost minimum of each full w-window (unsigned order);
      // a doc shorter than one window contributes its single global min
      if (grams <= w) {
        var minPos = 0
        var j = 1
        while (j < grams) {
          if (java.lang.Long.compareUnsigned(hs(j), hs(minPos)) <= 0) minPos = j
          j += 1
        }
        selected.add(hs(minPos))
      } else {
        var start = 0
        var lastPos = -1
        while (start + w <= grams) {
          val end = start + w
          var minPos = start
          var j = start + 1
          while (j < end) {
            if (java.lang.Long.compareUnsigned(hs(j), hs(minPos)) <= 0) minPos = j
            j += 1
          }
          if (minPos != lastPos) { selected.add(hs(minPos)); lastPos = minPos }
          start += 1
        }
      }
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    // TreeSet orders boxed longs SIGNED, which is also JaccardSim's
    // sorted-distinct contract — consistent on both sides
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WinnowingFingerprints = copy(child = c)
}

/** Adjacent token pairs of a token array as (w1, w2) structs — one JVM pass.
  * Exists because the declarative spelling
  * `transform(sequence(0, n-2), i -> struct(element_at(t,i+1), element_at(t,i+2)))`
  * runs ~20× slower: higher-order functions interpret their lambda per
  * element and `sequence` materializes an index array per row (measured at
  * sf0.1: 6.7 s vs 0.5 s for the whole bigram explode). Fewer than two
  * tokens yield an empty array.
  */
case class TokenBigrams(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("w1", StringType), StructField("w2", StringType))),
    containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val t = arr.numElements()
    if (t < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](t - 1)
    // clone: the UTF8Strings may view a reused row buffer, and these
    // references outlive this eval via the returned array
    var prev = arr.getUTF8String(0).clone()
    var i = 0
    while (i < t - 1) {
      val next = arr.getUTF8String(i + 1).clone()
      out(i) = org.apache.spark.sql.catalyst.InternalRow(prev, next)
      prev = next
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): TokenBigrams = copy(child = c)
}

object TextHashExpressions {
  def tokenBigrams(tokens: Column): Column =
    GraftBridge.column(TokenBigrams(GraftBridge.expression(tokens)))
  def tokenSetFingerprint(tokens: Column): Column =
    GraftBridge.column(TokenSetFingerprint(GraftBridge.expression(tokens)))
  def shingleHashes(tokens: Column, n: Int): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(tokens), n))
  def minHashSig(hashes: Column, k: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(hashes), k))
  def jaccardSim(a: Column, b: Column): Column =
    GraftBridge.column(JaccardSim(GraftBridge.expression(a), GraftBridge.expression(b)))
  def simHash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))
  def winnowingFingerprints(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowingFingerprints(GraftBridge.expression(text), k, w))
}
