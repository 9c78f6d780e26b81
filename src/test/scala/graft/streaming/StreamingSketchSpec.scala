package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.functions.SketchFunctions

/** The sketch aggregates are mergeable bounded state, so they run as
  * Structured Streaming complete-mode aggregations unchanged. What each
  * one guarantees across the stream/batch boundary differs and is pinned
  * here:
  *  - bloom: merge is a word-wise OR (commutative, associative,
  *    idempotent) — the streamed filter must equal the batch filter
  *    BIT-FOR-BIT regardless of micro-batch slicing;
  *  - Misra–Gries: summary CONTENT is merge-order-dependent by design, but
  *    the undercount bound and heavy-item completeness hold over the union
  *    of all micro-batches — the property the exact two-pass pipeline
  *    builds on.
  */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  private def zipf(distinct: Int, scale: Int): Seq[String] =
    (1 to distinct).flatMap(i => Seq.fill(scale / i)(s"w$i"))

  test("streamed bloom filter is bit-identical to the batch filter") {
    implicit val sqlCtx = spark.sqlContext
    val items = (0 until 300).map(i => s"key$i")
    val src = MemoryStream[String]
    val ckpt = Files.createTempDirectory("graft_bloom_ckpt_").toString
    val agg = src.toDF().toDF("item")
      .agg(SketchFunctions.bloomAgg(col("item"), numBits = 1L << 13, numHashes = 4).as("bloom"))
    val q = agg.writeStream.format("memory").queryName("bloom_stream")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
    items.grouped(100).foreach(src.addData(_: _*))
    val run = q.start()
    run.awaitTermination(120000)
    val streamed = spark.table("bloom_stream").head.getAs[Array[Byte]](0)
    val batch = items.toDF("item")
      .agg(SketchFunctions.bloomAgg(col("item"), numBits = 1L << 13, numHashes = 4))
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(streamed, batch),
      "bloom OR-merge must make micro-batch slicing invisible")
  }

  test("streamed MG summary keeps the bound and heavy-item completeness") {
    implicit val sqlCtx = spark.sqlContext
    val items = zipf(distinct = 40, scale = 300)
    val n = items.size.toLong
    val capacity = 6
    val bound = n / (capacity + 1)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val src = MemoryStream[String]
    val ckpt = Files.createTempDirectory("graft_mg_ckpt_").toString
    val agg = src.toDF().toDF("item")
      .agg(SketchFunctions.heavyHittersSketch(col("item"), capacity).as("hh"))
    val q = agg.writeStream.format("memory").queryName("mg_stream")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
    items.grouped(75).foreach(src.addData(_: _*))
    val run = q.start()
    run.awaitTermination(120000)
    val est = spark.table("mg_stream")
      .select(explode(col("hh")).as("e")).select(col("e.item"), col("e.est_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size <= capacity)
    est.foreach { case (item, e) =>
      assert(e <= exact(item) && exact(item) - e <= bound, s"bound broken for $item")
    }
    exact.filter(_._2 > bound).keys.foreach(item =>
      assert(est.contains(item), s"heavy item $item missing from streamed summary"))
  }

  test("streamed HLL registers equal the batch registers (max-merge across micro-batches)") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(17)
    val items = Seq.fill(3000)(rnd.nextLong())
    val src = MemoryStream[Long]
    val ckpt = Files.createTempDirectory("graft_hll_ckpt_").toString
    // register table as a complete-mode grouped max — the HLL merge IS
    // Spark's aggregation, so micro-batch slicing must be invisible
    val (bucket, rho) = SketchFunctions.hllRho(col("value"), 8)
    val agg = src.toDF().toDF("value")
      .select(bucket.as("bucket"), rho.as("rho"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("m"))
    val q = agg.writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
    items.grouped(500).foreach(src.addData(_: _*))
    val run = q.start()
    run.awaitTermination(120000)
    val streamed = spark.table("hll_stream").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = SketchFunctions.hllBuckets(items.toDF("value"), col("value"), 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }
}
