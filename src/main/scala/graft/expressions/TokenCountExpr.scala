package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace token count as ONE codegen'd byte scan.
  *
  * Replaces `size(filter(split(text, "\\s+"), len > 0))` — which compiles
  * a regex, allocates a String per token, an array per row, and then walks
  * a higher-order filter — with a branch-per-byte loop counting
  * whitespace→non-whitespace transitions. Byte-for-byte the same contract:
  * Java's `\s` is the ASCII set `[ \t\n\x0B\f\r]` (no UNICODE flag in
  * `split`), and in UTF-8 every continuation/lead byte of a multi-byte
  * character is >= 0x80, so scanning BYTES can never split or miscount a
  * multi-byte character; the count of non-empty split segments equals the
  * count of maximal non-whitespace runs. NULL in → NULL out, like
  * `size(split(NULL))` under the non-legacy sizeOfNull.
  *
  * The expression participates in whole-stage codegen (no virtual calls,
  * no allocation beyond the byte-array view), which matters because
  * tokenCount sits in the scan stage of the packing/sampling/gating
  * plane (q28, q69, q92, q98, q103, q110, q118, q120): at 100 TB it runs
  * once per document on the hottest path the engine has.
  */
case class TokenCountExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"tokenCount expects STRING, got ${child.dataType.catalogString}")
  }
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[UTF8String].getBytes
    var cnt = 0
    var prevWs = true
    var i = 0
    while (i < b.length) {
      val x = b(i)
      val ws = x == ' ' || (x >= 9 && x <= 13)
      if (!ws && prevWs) cnt += 1
      prevWs = ws
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val ws = ctx.freshName("ws")
      val prevWs = ctx.freshName("prevWs")
      val cnt = ctx.freshName("cnt")
      s"""
         |byte[] $b = $c.getBytes();
         |int $cnt = 0;
         |boolean $prevWs = true;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  byte $x = $b[$i];
         |  boolean $ws = $x == 32 || ($x >= 9 && $x <= 13);
         |  if (!$ws && $prevWs) $cnt++;
         |  $prevWs = $ws;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenCountExpr =
    copy(child = newChild)
}

object TokenCountExpr {
  def tokenCount(text: Column): Column =
    GraftBridge.column(TokenCountExpr(GraftBridge.expression(text)))
}
