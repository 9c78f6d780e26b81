package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Map-side Viterbi segmentation stats under a unigram-LM piece vocabulary
  * (the SentencePiece inference step, Kudo 2018). Same design rationale as
  * [[BpeEncode]]: the per-word DP is a JVM loop no higher-order function
  * can express efficiently; the cost table rides as a literal (model-scale,
  * the IVF-centroid/BPE-merge precedent) and a per-partition memo makes the
  * Zipf-common word a hash lookup.
  *
  * DP contract (mirrored exactly by the q137 DuckDB oracle): words truncate
  * to [[graft.functions.UnigramLm.MaxWordLen]] CODEPOINTS; dp[i] minimizes
  * (total_cost, n_pieces) lexicographically over pieces of length
  * 1..MaxPieceLen codepoints ending at i; a single codepoint absent from
  * the vocabulary costs [[graft.functions.UnigramLm.UnkCost]] (the OOV
  * floor), so every word segments. Lengths and offsets are CODEPOINT
  * units end to end — Spark's `substring` (the trainer) and DuckDB's
  * `substr` (the oracle) both count codepoints, so a UTF-16-unit DP here
  * would truncate and segment supplementary characters differently from
  * the model it scores under. Returns struct(n_words, n_pieces,
  * total_cost).
  */
case class UnigramStats(child: Expression, costs: Map[String, Long])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false),
    StructField("total_cost", LongType, nullable = false)))

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  private def viterbi(word: String): (Long, Long) = {
    val maxLen = graft.functions.UnigramLm.MaxWordLen
    val maxPiece = graft.functions.UnigramLm.MaxPieceLen
    val unk = graft.functions.UnigramLm.UnkCost
    val cpsAll = word.codePoints().toArray
    val cps = if (cpsAll.length > maxLen)
      java.util.Arrays.copyOf(cpsAll, maxLen) else cpsAll
    val n = cps.length
    val dpC = new Array[Long](n + 1)
    val dpN = new Array[Long](n + 1)
    var i = 1
    while (i <= n) {
      var bestC = Long.MaxValue
      var bestN = Long.MaxValue
      var l = 1
      while (l <= maxPiece && l <= i) {
        val piece = new String(cps, i - l, l)
        val c = costs.getOrElse(piece, if (l == 1) unk else -1L)
        if (c >= 0L) {
          val nc = dpC(i - l) + c
          val nn = dpN(i - l) + 1L
          if (nc < bestC || (nc == bestC && nn < bestN)) { bestC = nc; bestN = nn }
        }
        l += 1
      }
      dpC(i) = bestC; dpN(i) = bestN
      i += 1
    }
    (dpC(n), dpN(n))
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var pieces = 0L
    var cost = 0L
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i).toString
      var st = memo.get(w)
      if (st == null) {
        st = viterbi(w)
        if (memo.size < (1 << 20)) memo.put(w, st)
      }
      cost += st._1
      pieces += st._2
      i += 1
    }
    InternalRow(n.toLong, pieces, cost)
  }

  override protected def withNewChildInternal(c: Expression): UnigramStats =
    copy(child = c)
}

object UnigramExpressions {
  def unigramStats(tokens: Column, costs: Map[String, Long]): Column =
    GraftBridge.column(UnigramStats(GraftBridge.expression(tokens), costs))
}
