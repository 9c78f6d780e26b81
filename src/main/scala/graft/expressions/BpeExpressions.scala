package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Map-side BPE encode of a token array with a trained merge table.
  *
  * Same design rationale as [[TextHashExpressions]]: the iterative merge
  * apply is a per-word JVM loop no higher-order function can express, and
  * one `eval` per row (CodegenFallback) beats any per-element interpreted
  * tree by orders of magnitude. The merge table rides in the expression as
  * a literal — model-scale, exactly like the IVF centroid literals — and
  * the per-word memo makes the common case (Zipf-distributed words) a hash
  * lookup. The memo is per-partition state: expressions are deserialized
  * per task, and a ConcurrentHashMap keeps the local[n] shared-instance
  * case safe.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[UTF8String]]()

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](n * 2)
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i).toString
      var enc = memo.get(w)
      if (enc == null) {
        enc = graft.functions.BpeTokenizer.encodeWord(w, ranks)
          .map(UTF8String.fromString).toArray
        // bound the memo: a pathological corpus of unique words must not
        // grow executor memory without limit
        if (memo.size < (1 << 20)) memo.put(w, enc)
      }
      out ++= enc
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): BpeEncode = copy(child = c)
}

object BpeExpressions {
  def bpeEncode(tokens: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeEncode(GraftBridge.expression(tokens), merges))
}
