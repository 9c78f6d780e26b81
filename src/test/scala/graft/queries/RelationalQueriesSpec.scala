package graft.queries

import java.nio.file.Files

import graft.SparkSpec

class RelationalQueriesSpec extends SparkSpec {

  test("q53 pivot emits 0 (not NULL) counts and NULL sums for an unpopulated combo") {
    import spark.implicits._
    // URGENT priority has no 'P' (pending) orders — the combo the pivot
    // must render as count=0 / total=NULL, matching SQL's
    // `count(*) FILTER` / `sum(...) FILTER` convention.
    val dir = Files.createTempDirectory("graft-pivot").toFile
    dir.deleteOnExit()
    Seq(
      ("1-URGENT", "O", 10.0), ("1-URGENT", "F", 20.0),
      ("2-HIGH", "O", 30.0), ("2-HIGH", "F", 40.0), ("2-HIGH", "P", 50.0))
      .toDF("o_orderpriority", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/orders.parquet")

    val out = graft.SparkEntry.queries("q53_pivot")(spark, dir.getAbsolutePath)
      .collect().map(r => r.getString(0) -> r).toMap
    val urgent = out("1-URGENT")
    assert(urgent.getAs[Long]("n_pending") == 0L, "empty combo count must be 0, not NULL")
    assert(urgent.isNullAt(urgent.fieldIndex("total_pending")),
      "empty combo sum must be NULL (SQL sum of empty set)")
    val high = out("2-HIGH")
    assert(high.getAs[Long]("n_pending") == 1L)
    assert(high.getAs[Double]("total_pending") == 50.0)
    // populated combos unaffected by the coalesce
    assert(urgent.getAs[Long]("n_open") == 1L && urgent.getAs[Double]("total_open") == 10.0)
  }
}
