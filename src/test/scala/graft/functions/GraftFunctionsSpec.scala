package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {

  test("registered SQL functions evaluate (vec_dot, simhash64, token_fingerprint, jaccard_sim)") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  simhash64(array('spark', 'join')) AS sh,
        |  token_fingerprint(array('b', 'a', 'b')) AS fp,
        |  jaccard_sim(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
        |  minhash_sig(shingle_hashes(array('a','b','c','d'), 2), 4) AS sig
        |""".stripMargin).collect()(0)
    assert(r.getAs[Double]("d") == 11.0)
    assert(r.getAs[Double]("j") == 0.5)
    // md5("a b") — order-insensitive, deduplicated
    assert(r.getAs[String]("fp") == java.security.MessageDigest.getInstance("MD5")
      .digest("a b".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(r.getAs[scala.collection.Seq[Long]]("sig").length == 4)
  }

  test("extensions class injects functions into a fresh session") {
    val base = spark  // force base session creation first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // new session over the same SparkContext; builder applies extensions
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne base)
      val d = s2.sql("SELECT vec_dot(array(1.0D, 1.0D), array(2.0D, 5.0D)) AS d")
        .collect()(0).getDouble(0)
      assert(d == 7.0)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("vec_dot matches the interpreted higher-order formulation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = graft.Tables.embeddings(spark, sfDir).limit(50)
    val both = df.select(
      Similarity.dot(col("embedding"), col("embedding")).as("fast"),
      aggregate(zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("slow")).collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }
}
