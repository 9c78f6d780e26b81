package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketedLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def withConf(k: String, v: String)(body: => Unit): Unit = {
    val old = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body finally old match {
      case Some(o) => spark.conf.set(k, o)
      case None => spark.conf.unset(k)
    }
  }

  test("same-key same-count bucketed join: NO Exchange, NO Sort in the executed plan") {
    val root = tmp("bkt_plan_")
    val a = (0L until 2000L).map(i => (i % 97, i)).toDF("k", "va")
    val b = (0L until 500L).map(i => (i % 97, s"d$i")).toDF("k", "vb")
    BucketedLayout.writeBucketed(a, "bkt_a", s"$root/a", "k", 8)
    BucketedLayout.writeBucketed(b, "bkt_b", s"$root/b", "k", 8)
    // force SortMergeJoin (a broadcast would trivially have no exchange)
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val j = BucketedLayout.colocatedJoin(spark, "bkt_a", "bkt_b", "k")
      val got = j.groupBy(col("k")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // plan: no shuffle on either join side, no per-bucket sort either
      // (sortBy pre-sorted the files)
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
      // correctness: equals the plain join of the raw data
      val want = a.join(b, "k").groupBy(col("k")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want)
    }
  }

  test("mismatched bucket counts still answer correctly (plan falls back to shuffle)") {
    val root = tmp("bkt_mis_")
    val a = (0L until 300L).map(i => (i % 11, i)).toDF("k", "va")
    val b = (0L until 300L).map(i => (i % 11, i * 2)).toDF("k", "vb")
    BucketedLayout.writeBucketed(a, "bkt_m_a", s"$root/a", "k", 8)
    BucketedLayout.writeBucketed(b, "bkt_m_b", s"$root/b", "k", 4)
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val n = BucketedLayout.colocatedJoin(spark, "bkt_m_a", "bkt_m_b", "k").count()
      assert(n == a.join(b, "k").count())
    }
  }

  test("bucket pruning: an equality filter on the bucket key scans one bucket's files") {
    val root = tmp("bkt_prune_")
    val a = (0L until 4000L).map(i => (i, s"v$i")).toDF("k", "v")
    BucketedLayout.writeBucketed(a, "bkt_p", s"$root/p", "k", 16)
    // autoBucketedScan downgrades a lone filter to a plain scan (no
    // operator "needs" the distribution) — force the bucketed read so
    // the pruning contract is visible
    withConf("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false") {
      val q = spark.table("bkt_p").filter(col("k") === 1234L)
      assert(q.collect().map(_.getString(1)).toSeq == Seq("v1234"))
      // SelectedBucketsCount appears when the scan prunes buckets
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 16"), plan)
    }
  }
}
