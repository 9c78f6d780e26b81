package graft.sources

import java.nio.file.Files

import graft.{SparkSpec, Tables}

/** Every supported landing format must round-trip the corpus content
  * exactly, and the scale guardrails (no schema inference on text formats,
  * no nested columns in csv) must refuse early with readable messages.
  */
class FormatIOSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.selectExpr(df.columns.sorted.map(c => s"CAST($c AS STRING) AS $c").toIndexedSeq: _*)
      .collect().map(_.mkString("|")).sorted.toSeq

  test("documents round-trip bit-identically through every supported format") {
    val docs = Tables.documents(spark, sfDir)
    val expected = canon(docs)
    FormatIO.Supported.foreach { fmt =>
      val dir = Files.createTempDirectory(s"graft_fmt_$fmt").resolve("t").toString
      FormatIO.write(docs, dir, fmt)
      val back = FormatIO.read(spark, dir, fmt, Some(docs.schema))
      assert(canon(back) == expected, s"format $fmt did not round-trip")
    }
  }

  test("nested columns (embeddings) round-trip through parquet/orc/json; csv refuses") {
    val emb = Tables.embeddings(spark, sfDir).limit(50)
    val expected = canon(emb)
    Seq("parquet", "orc", "json").foreach { fmt =>
      val dir = Files.createTempDirectory(s"graft_fmt_$fmt").resolve("e").toString
      FormatIO.write(emb, dir, fmt)
      assert(canon(FormatIO.read(spark, dir, fmt, Some(emb.schema))) == expected,
        s"format $fmt did not round-trip the embedding array")
    }
    val e = intercept[IllegalArgumentException] {
      FormatIO.write(emb, Files.createTempDirectory("graft_fmt_csv").toString, "csv")
    }
    assert(e.getMessage.contains("csv cannot encode nested columns"), e.getMessage)
  }

  test("text-format reads without a schema are refused (no inference at scale)") {
    val docs = Tables.documents(spark, sfDir).limit(5)
    val dir = Files.createTempDirectory("graft_fmt_noschema").resolve("t").toString
    FormatIO.write(docs, dir, "json")
    val e = intercept[IllegalArgumentException] {
      FormatIO.read(spark, dir, "json")
    }
    assert(e.getMessage.contains("requires an explicit schema"), e.getMessage)
    // columnar formats carry their own schema: no requirement
    val pdir = Files.createTempDirectory("graft_fmt_p").resolve("t").toString
    FormatIO.write(docs, pdir, "parquet")
    assert(FormatIO.read(spark, pdir, "parquet").count() == 5)
    // unknown format: readable refusal
    val u = intercept[IllegalArgumentException] {
      FormatIO.read(spark, pdir, "xml")
    }
    assert(u.getMessage.contains("unsupported format"), u.getMessage)
  }
}
