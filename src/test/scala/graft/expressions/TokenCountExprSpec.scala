package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TokenCountExprSpec extends SparkSpec {
  import spark.implicits._

  /** The contract being replaced, spelled out longhand. */
  private def oldCount(text: org.apache.spark.sql.Column) =
    size(filter(split(text, "\\s+"), t => length(t) > 0))

  private val adversarial: Seq[String] = Seq(
    null, "", " ", "  ", "a", " a", "a ", " a ", "a b", "a  b",
    "\t", "\n", "", "\f", "\r", "\t\n\f\r",
    "a\tb\ncd\fe\rf",
    "héllo wörld",          // 2-byte UTF-8 in-token
    " ",                         // NBSP is NOT Java \s: one token
    "a b",                       // NBSP joins, not splits
    "  ",                   // unicode line seps: NOT Java \s
    "日本語 テスト", // 3-byte UTF-8, one space
    "😀 😁",      // surrogate pairs (4-byte UTF-8)
    " \t mixed runs \r\n end")

  test("byte-scan count matches size(filter(split)) on adversarial strings") {
    val df = adversarial.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "text")
    val got = df.select(col("id"), TokenCountExpr.tokenCount(col("text")).as("n"),
        oldCount(col("text")).as("o"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    got.foreach { case (id, n, o) =>
      assert(n == o, s"id=$id: new=$n old=$o text=${adversarial(id.toInt)}")
    }
  }

  test("fuzz parity: 2000 random strings over a ws-heavy unicode alphabet") {
    val rnd = new scala.util.Random(42)
    val alphabet = " \t\n\f\r" + "ab9" + "é 日 "
    val rows = (0 until 2000).map { i =>
      val n = rnd.nextInt(40)
      (i.toLong, (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val df = rows.toDF("id", "text")
    val mismatch = df.select(TokenCountExpr.tokenCount(col("text")).as("n"),
        oldCount(col("text")).as("o"))
      .filter(not(col("n") <=> col("o"))).count()
    assert(mismatch == 0L)
  }

  test("participates in whole-stage codegen (no fallback on the scan path)") {
    val df = spark.range(100).select(concat(lit("w "), col("id").cast("string")).as("text"))
      .select(TokenCountExpr.tokenCount(col("text")).as("n"))
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen
    // stage; the Project carrying the expression must be inside one (an
    // expression without doGenCode would force the whole Project out)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    val stages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }
    assert(stages.nonEmpty, plan)
    assert(df.agg(sum("n")).collect().head.getLong(0) == 200L)
  }
}
