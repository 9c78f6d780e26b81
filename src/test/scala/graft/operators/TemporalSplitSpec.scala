package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Purged K-fold semantics on a hand fixture small enough to reason about
  * exactly: fold boundaries from the ceil-width cut of [min, max+1), the
  * embargo band purges BOTH sides of the validation block, and every
  * (row, fold) pair gets exactly one role.
  */
class TemporalSplitSpec extends SparkSpec {
  import spark.implicits._

  // 10 events at micros 0..9 → with nFolds=2: width 5, fold 0 = [0,5),
  // fold 1 = [5,10)
  private lazy val events = (0L until 10L).map(us => (us, us)).toDF("id", "us")
    .select(col("id"), timestamp_micros(col("us")).as("ts"))

  test("roles: valid inside the block, purged within embargo, train beyond") {
    val out = TemporalSplit.assignPurgedFolds(events, "ts", nFolds = 2,
      embargoMicros = 2L)
    assert(out.count() == 20) // 10 rows x 2 folds
    val roleOf = out.select(col("id"), col("fold"), col("role"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getString(2))).toMap
    // fold 0 = [0,5): ids 0-4 valid; embargo 2 purges 5,6; 7-9 train
    (0L to 4L).foreach(i => assert(roleOf((i, 0L)) == "valid", s"id=$i fold=0"))
    Seq(5L, 6L).foreach(i => assert(roleOf((i, 0L)) == "purged", s"id=$i fold=0"))
    (7L to 9L).foreach(i => assert(roleOf((i, 0L)) == "train", s"id=$i fold=0"))
    // fold 1 = [5,10): ids 5-9 valid; embargo purges 3,4; 0-2 train
    (5L to 9L).foreach(i => assert(roleOf((i, 1L)) == "valid", s"id=$i fold=1"))
    Seq(3L, 4L).foreach(i => assert(roleOf((i, 1L)) == "purged", s"id=$i fold=1"))
    (0L to 2L).foreach(i => assert(roleOf((i, 1L)) == "train", s"id=$i fold=1"))
  }

  test("zero embargo purges nothing; every fold's valid blocks partition the rows") {
    val out = TemporalSplit.assignPurgedFolds(events, "ts", nFolds = 3,
      embargoMicros = 0L)
    assert(out.filter(col("role") === "purged").count() == 0)
    // each row is valid in exactly one fold
    val validPerRow = out.filter(col("role") === "valid")
      .groupBy(col("id")).count().select(col("count")).distinct().collect()
    assert(validPerRow.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("fold-k filter prunes the broadcast fold table before the join") {
    val one = TemporalSplit.assignPurgedFolds(events, "ts", nFolds = 4,
      embargoMicros = 1L).filter(col("fold") === 2L)
    assert(one.count() == 10)
    // pin the PLAN, not just the result: Catalyst must fold the fold-id
    // filter into the local fold relation, so the broadcast side carries
    // exactly one row before the join (not all nFolds copies post-join)
    // the events fixture is itself a 10-row LocalRelation; the fold table
    // must show up pruned to 1 row, never at its full 4 rows
    val localSizes = one.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l.data.size
    }
    assert(localSizes.contains(1) && !localSizes.contains(4),
      s"fold filter did not prune the local fold table: $localSizes\n" +
        one.queryExecution.optimizedPlan.toString)
  }

  test("folds beyond the time range have empty validation blocks that purge nothing") {
    // 3 events at micros 0,1,2 (range 3) with nFolds=4 → width 1, fold 3's
    // block is empty; every row must be train there, never purged
    val tiny = Seq(0L, 1L, 2L).map(us => (us, us)).toDF("id", "us")
      .select(col("id"), timestamp_micros(col("us")).as("ts"))
    val out = TemporalSplit.assignPurgedFolds(tiny, "ts", nFolds = 4,
      embargoMicros = 10L)
    val f3 = out.filter(col("fold") === 3L)
      .select(col("role")).distinct().collect().map(_.getString(0)).toSeq
    assert(f3 == Seq("train"), s"phantom fold 3 produced roles: $f3")
    // folds 0..2 each hold exactly one valid row
    assert(out.filter(col("role") === "valid").count() == 3)
  }
}
