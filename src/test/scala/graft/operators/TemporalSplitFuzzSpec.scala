package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded randomized equivalence for the purged K-fold assignment: on
  * random (clustered and sparse) timestamp sets with random nFolds and
  * embargo — including configurations where ceil-width leaves trailing
  * folds with empty validation blocks — the operator must equal an
  * independent driver-side reference (plain Scala, no Spark) implementing
  * the documented semantics: ceil-width blocks over [lo, hi+1), valid
  * inside the block, purged within the embargo band of a NON-EMPTY block,
  * train otherwise.
  */
class TemporalSplitFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def reference(
      ts: Seq[Long], nFolds: Int, embargo: Long): Map[(Long, Long), String] = {
    val lo = ts.min
    val hiEx = ts.max + 1
    val width = math.max(1L, (hiEx - lo + nFolds - 1) / nFolds)
    (for {
      k <- 0 until nFolds
      fs = lo + k.toLong * width
      fe = math.min(hiEx, fs + width)
      t <- ts
    } yield {
      val role =
        if (fs < fe && t >= fs && t < fe) "valid"
        else if (fs < fe && t >= fs - embargo && t < fe + embargo) "purged"
        else "train"
      ((t, k.toLong), role)
    }).toMap
  }

  test("randomized timestamp sets x (nFolds, embargo) == driver-side reference") {
    val rnd = new scala.util.Random(24681L)
    for (trial <- 1 to 8) {
      val n = 5 + rnd.nextInt(60)
      // mix dense clusters with far outliers so fold widths vary wildly and
      // small ranges force the degenerate trailing-fold regime
      val ts = Seq.fill(n) {
        if (rnd.nextInt(4) == 0) rnd.nextInt(1000000).toLong
        else 500 + rnd.nextInt(50).toLong
      }.distinct
      val nFolds = 2 + rnd.nextInt(8)
      val embargo = rnd.nextInt(3) match {
        case 0 => 0L
        case 1 => 1 + rnd.nextInt(20).toLong
        case _ => 1 + rnd.nextInt(100000).toLong
      }
      val df = ts.map(t => (t, t)).toDF("id", "us")
        .select(col("id"), timestamp_micros(col("us")).as("ts"))
      val got = TemporalSplit.assignPurgedFolds(df, "ts", nFolds, embargo)
        .select(col("id"), col("fold"), col("role"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getString(2))).toMap
      val want = reference(ts, nFolds, embargo)
      assert(got == want,
        s"trial $trial (n=$n nFolds=$nFolds embargo=$embargo): " +
          s"mismatches=${(got.toSet diff want.toSet).take(5)} " +
          s"missing=${(want.toSet diff got.toSet).take(5)}")
    }
  }
}
