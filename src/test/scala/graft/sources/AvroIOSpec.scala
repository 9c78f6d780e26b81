package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class AvroIOSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_avro_spec_").toString + "/ocf"

  test("all supported types round-trip bit-exactly, including nulls") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("i", IntegerType, nullable = true),
      StructField("b", BooleanType, nullable = true),
      StructField("f", FloatType, nullable = true),
      StructField("d", DoubleType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("bin", BinaryType, nullable = true),
      StructField("dt", DateType, nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("arr", ArrayType(FloatType, containsNull = true), nullable = true)))
    val ts = java.sql.Timestamp.valueOf("2026-01-02 03:04:05.123456")
    val rows = Seq(
      Row(1L, 7, true, 1.5f, 2.25, "héllo", Array[Byte](0, 1, -2),
        java.sql.Date.valueOf("2026-02-28"), ts, Seq(1.0f, null, -3.5f)),
      Row(2L, null, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmp()
    assert(AvroIO.writeAvro(df, dir) == 2)
    val back = AvroIO.readAvro(spark, dir)
    assert(back.schema == schema)
    val got = back.orderBy("id").collect()
    assert(got.length == 2)
    val r0 = got(0)
    assert(r0.getLong(0) == 1L && r0.getInt(1) == 7 && r0.getBoolean(2))
    assert(r0.getFloat(3) == 1.5f && r0.getDouble(4) == 2.25)
    assert(r0.getString(5) == "héllo")
    assert(r0.getAs[Array[Byte]](6).toSeq == Seq[Byte](0, 1, -2))
    assert(r0.getDate(7) == java.sql.Date.valueOf("2026-02-28"))
    // timestamp-micros: the full microsecond survives
    assert(r0.getTimestamp(8) == ts)
    assert(r0.getSeq[Any](9) == Seq(1.0f, null, -3.5f))
    val r1 = got(1)
    (1 to 9).foreach(i => assert(r1.isNullAt(i), s"field $i should be null"))
  }

  test("empty partitions write no file; file count = non-empty partitions") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L).toDF("id")
      .repartition(6, col("id")) // 6 partitions, at most 3 non-empty
    val dir = tmp()
    val n = AvroIO.writeAvro(df, dir)
    val files = {
      val s = Files.list(java.nio.file.Paths.get(dir))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString).toSeq
      } finally s.close()
    }
    assert(files.count(_.endsWith(".avro")) == n && n <= 3 && n >= 1)
    assert(!files.exists(_.endsWith(".tmp")), "no temp litter after commit")
    assert(AvroIO.readAvro(spark, dir).as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L))
  }

  test("nested records round-trip: two levels, nullable inner record, array of structs") {
    val inner = StructType(Seq(
      StructField("kind", StringType, nullable = false),
      StructField("amount", LongType, nullable = true)))
    val meta = StructType(Seq(
      StructField("uid", LongType, nullable = false),
      StructField("detail", inner, nullable = true)))
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("meta", meta, nullable = true),
      StructField("tags", ArrayType(inner, containsNull = true), nullable = true)))
    val rows = Seq(
      Row(1L, Row(10L, Row("buy", 250L)), Seq(Row("a", 1L), null, Row("b", null))),
      Row(2L, Row(20L, null), null), // inner record NULL via the union
      Row(3L, null, Seq.empty[Row])) // outer struct NULL
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmp()
    AvroIO.writeAvro(df, dir)
    // the emitted Avro schema nests real RECORDs with path-unique names
    val avro = AvroIO.toAvroSchema(schema)
    val metaField = avro.getField("meta").schema().getTypes.get(1)
    assert(metaField.getType == org.apache.avro.Schema.Type.RECORD)
    assert(metaField.getField("detail").schema().getTypes.get(1).getName
      == "graft_row_meta_detail")
    val back = AvroIO.readAvro(spark, dir)
    assert(back.schema == schema)
    assert(back.orderBy("id").collect().toSeq == rows)
  }

  test("out-of-scope Spark types refuse loudly, naming the field") {
    import spark.implicits._
    // Avro maps are string-keyed by definition: an int-keyed map refuses
    val df = Seq((1L, Map(1 -> "a"))).toDF("id", "m")
    val e = intercept[IllegalArgumentException] {
      AvroIO.writeAvro(df, tmp())
    }
    assert(e.getMessage.contains("'m'") && e.getMessage.contains("string-keyed"))
    val df2 = Seq((1L, BigDecimal(1))).toDF("id", "d")
    val e2 = intercept[IllegalArgumentException] {
      AvroIO.writeAvro(df2, tmp())
    }
    assert(e2.getMessage.contains("'d'"))
  }

  test("string-keyed maps round-trip, nullable values and record values included") {
    import spark.implicits._
    val rows = Seq(
      Row(1L, Map("a" -> "x", "b" -> null)),
      Row(2L, Map.empty[String, String]),
      Row(3L, null))
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("m", MapType(StringType, StringType, valueContainsNull = true))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val dir = tmp()
    AvroIO.writeAvro(df, dir)
    val back = AvroIO.readAvro(spark, dir)
    assert(back.schema == schema)
    val got = back.collect().map(r =>
      (r.getLong(0), Option(r.getMap[String, String](1)).map(_.toMap))).toSet
    assert(got == Set((1L, Some(Map("a" -> "x", "b" -> null))),
      (2L, Some(Map.empty[String, String])), (3L, None)))
    // map of RECORDS: values are nested structs (the Kafka header shape)
    val rows2 = Seq(Row(1L, Map("u" -> Row("en", 10L), "v" -> Row("de", 20L))))
    val inner = StructType(Seq(StructField("lang", StringType),
      StructField("n", LongType)))
    val schema2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("m", MapType(StringType, inner, valueContainsNull = false))))
    val dir2 = tmp()
    AvroIO.writeAvro(spark.createDataFrame(
      spark.sparkContext.parallelize(rows2, 1), schema2), dir2)
    val b2 = AvroIO.readAvro(spark, dir2)
      .select(col("id"), element_at(col("m"), "v").getField("n").as("vn"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b2 == Set((1L, 20L)))
  }

  test("enum reads as its symbol string, fixed reads as binary (externally-written OCF)") {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.file.DataFileWriter
    val s = new Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":"long"},
        |{"name":"color","type":{"type":"enum","name":"Color",
        |  "symbols":["RED","GREEN","BLUE"]}},
        |{"name":"fp","type":{"type":"fixed","name":"Fp8","size":8}}]}"""
        .stripMargin)
    val dir = tmp()
    Files.createDirectories(java.nio.file.Paths.get(dir))
    val f = new java.io.File(dir, "part-00000.avro")
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](s))
    w.create(s, f)
    val colorSchema = s.getField("color").schema()
    val fpSchema = s.getField("fp").schema()
    try (0 until 6).foreach { i =>
      val rec = new GenericData.Record(s)
      rec.put("id", i.toLong)
      rec.put("color", new GenericData.EnumSymbol(colorSchema,
        Seq("RED", "GREEN", "BLUE")(i % 3)))
      rec.put("fp", new GenericData.Fixed(fpSchema,
        java.nio.ByteBuffer.allocate(8).putLong(i.toLong * 7).array()))
      w.append(rec)
    } finally w.close()
    val back = AvroIO.readAvro(spark, dir)
    assert(back.schema("color").dataType == StringType)
    assert(back.schema("fp").dataType == BinaryType)
    val got = back.collect().map { r =>
      (r.getLong(0), r.getString(1),
        java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](2)).getLong)
    }.toSet
    assert(got == (0 until 6).map(i =>
      (i.toLong, Seq("RED", "GREEN", "BLUE")(i % 3), i.toLong * 7)).toSet)
  }

  test("illegal Avro field names refuse rather than silently rewrite") {
    import spark.implicits._
    val df = Seq(1L).toDF("id").withColumnRenamed("id", "bad name")
    val e = intercept[IllegalArgumentException] {
      AvroIO.writeAvro(df, tmp())
    }
    assert(e.getMessage.contains("bad name"))
  }

  test("heterogeneous directory (schema drift across files) refuses on read") {
    import spark.implicits._
    val dir = tmp()
    AvroIO.writeAvro(Seq(1L).toDF("id").coalesce(1), dir)
    // second file under a different schema, renamed in beside the first
    val dir2 = tmp()
    AvroIO.writeAvro(Seq("x").toDF("s").coalesce(1), dir2)
    Files.move(
      java.nio.file.Paths.get(dir2, "part-00000.avro"),
      java.nio.file.Paths.get(dir, "part-00001.avro"))
    val e = intercept[org.apache.spark.SparkException] {
      AvroIO.readAvro(spark, dir).count()
    }
    assert(e.getMessage.contains("heterogeneous")
      || Option(e.getCause).exists(_.getMessage.contains("heterogeneous")))
  }

  test("non-nullable union and exotic avro types refuse on schema import") {
    val s = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"u","type":["int","string"]}]}""".stripMargin)
    val e = intercept[IllegalArgumentException] { AvroIO.toSparkSchema(s) }
    assert(e.getMessage.contains("'u'"))
    // enum/fixed are IN scope since round 16: enum narrows to its symbol
    // string, fixed to binary — both stated in the schema mapping
    val s2 = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"e","type":{"type":"enum","name":"en","symbols":["A"]}},
        |{"name":"f","type":{"type":"fixed","name":"fx","size":4}}]}""".stripMargin)
    val st2 = AvroIO.toSparkSchema(s2)
    assert(st2("e").dataType == StringType && st2("f").dataType == BinaryType)
  }

  test("deflate actually compresses: OCF bytes well under the raw payload") {
    import spark.implicits._
    val df = (0 until 2000).map(i => (i.toLong, "the quick brown fox " * 10))
      .toDF("id", "text").coalesce(1)
    val dir = tmp()
    AvroIO.writeAvro(df, dir)
    val sz = Files.size(java.nio.file.Paths.get(dir, "part-00000.avro"))
    assert(sz < 2000L * 50, s"deflate should crush repeated text, got $sz bytes")
    assert(AvroIO.readAvro(spark, dir).count() == 2000)
  }
}
