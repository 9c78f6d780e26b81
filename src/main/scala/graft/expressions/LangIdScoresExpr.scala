package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** All C language-ID class scores in ONE compiled pass over the string —
  * the scoring core of [[graft.functions.LangId.predict]].
  *
  * The built-in spelling (charGrams → aggregate fold with zip_with) is a
  * chain of higher-order functions, every one of which is interpreted
  * (`CodegenFallback`): per document it allocates ~280 gram strings, an
  * array per zip_with step, and walks three transform/filter lambdas —
  * measured 2.1 s warm for 5k docs at sf0.1, ~0.4 ms/doc of pure
  * interpreter overhead on what is arithmetically a byte scan. This
  * expression does the same arithmetic — lowercase the ≤`maxChars`-char
  * prefix, hash every char 2/3/4-gram with Spark's xxhash64 (seed 42,
  * UTF-8 bytes), bucket with pmod, accumulate each class's weight — in
  * one JVM loop with zero per-gram allocation (grams are hashed as byte
  * SLICES of the prefix; char-start byte offsets make the slices
  * multibyte-safe). The per-gram hash values are bit-identical to
  * `xxhash64(substring(...))`, so the DuckDB oracle restatement is
  * untouched.
  *
  * Codegen: participates via the reference-call pattern (the weight
  * matrix is far too large to inline as source) — `doGenCode` emits one
  * virtual call on the expression instance, so the surrounding stage
  * stays whole-stage-compiled rather than falling back to the
  * interpreted-iterator path (the round-11 lesson: an expression that
  * BREAKS the enclosing codegen can cost more than it saves).
  *
  * Returns `array<long>` of length C: `score_c = Σ_grams w_c[bucket] +
  * bias_c` — exactly the trainer's averaged-score contract.
  */
case class LangIdScoresExpr(
    child: Expression,
    weights: Array[Array[Long]],
    biases: Array[Long],
    buckets: Int,
    maxChars: Int) extends UnaryExpression {

  require(weights.nonEmpty && weights.length == biases.length,
    "one weight vector and one bias per class")
  require(weights.forall(_.length == buckets), "weight vectors must have `buckets` slots")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"langIdScores expects STRING, got ${child.dataType.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(v: UTF8String): ArrayData = {
    val c = weights.length
    val sums = java.util.Arrays.copyOf(biases, c)
    // char-based prefix, then Unicode lowercase — the charGrams order
    val t = v.substring(0, maxChars).toLowerCase
    val bytes = t.getBytes
    val nBytes = bytes.length
    // char-start byte offsets (UTF-8 lead bytes are NOT 10xxxxxx)
    val offs = new Array[Int](nBytes + 1)
    var nChars = 0
    var i = 0
    while (i < nBytes) {
      if ((bytes(i) & 0xC0) != 0x80) { offs(nChars) = i; nChars += 1 }
      i += 1
    }
    offs(nChars) = nBytes
    val bLong = buckets.toLong
    var n = 2
    while (n <= 4) {
      var p = 0
      val last = nChars - n
      while (p <= last) {
        val start = offs(p)
        val h = XXH64.hashUnsafeBytes(
          bytes, Platform.BYTE_ARRAY_OFFSET + start, offs(p + n) - start, 42L)
        val b = (((h % bLong) + bLong) % bLong).toInt
        var ci = 0
        while (ci < c) { sums(ci) += weights(ci)(b); ci += 1 }
        p += 1
      }
      n += 1
    }
    new GenericArrayData(sums)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("langIdScorer", this,
        classOf[LangIdScoresExpr].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): LangIdScoresExpr =
    copy(child = newChild)
}

object LangIdScoresExpr {
  def scores(text: Column, weights: Array[Array[Long]], biases: Array[Long],
      buckets: Int, maxChars: Int): Column =
    GraftBridge.column(LangIdScoresExpr(
      GraftBridge.expression(text), weights, biases, buckets, maxChars))
}
