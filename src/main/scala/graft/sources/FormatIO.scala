package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Uniform batch ingestion/landing across the formats this Spark build
  * supports natively: columnar (parquet, orc) and text-line (json = JSONL,
  * csv with header).
  *
  * Scale rules encoded here rather than left to callers:
  *  - text formats REQUIRE an explicit schema on read — schema inference
  *    is a second full pass over 100 TB before the real scan, and a
  *    type-drifting one (a single "NaN" cell re-types a column);
  *  - csv refuses nested columns up front (arrays/structs/maps have no
  *    portable csv encoding; silently stringifying them poisons round
  *    trips) — land nested data as parquet/orc/jsonl;
  *  - timestamps round-trip as ISO-8601 micros in text formats, matching
  *    the engine's TIMESTAMP_NTZ convention.
  */
object FormatIO {

  val Columnar = Set("parquet", "orc")
  val TextLine = Set("json", "csv")
  val Supported: Set[String] = Columnar ++ TextLine

  private def requireSupported(format: String): Unit =
    require(Supported.contains(format),
      s"unsupported format '$format' (supported: ${Supported.toSeq.sorted.mkString(", ")})")

  private def nestedCols(schema: StructType): Seq[String] =
    schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[StructType] || f.dataType.isInstanceOf[MapType] => f.name
    }.toSeq

  def write(df: DataFrame, path: String, format: String,
      mode: String = "overwrite"): Unit = {
    requireSupported(format)
    if (format == "csv") {
      val nested = nestedCols(df.schema)
      require(nested.isEmpty,
        s"csv cannot encode nested columns ${nested.mkString("[", ", ", "]")} — " +
          "land as parquet/orc/jsonl instead")
    }
    val w = df.write.mode(mode)
    format match {
      case "csv" => w.option("header", "true")
        .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").csv(path)
      case "json" => w.option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").json(path)
      case other => w.format(other).save(path)
    }
  }

  def read(spark: SparkSession, path: String, format: String,
      schema: Option[StructType] = None): DataFrame = {
    requireSupported(format)
    if (TextLine.contains(format))
      require(schema.isDefined,
        s"$format read requires an explicit schema: inference is a second full " +
          "scan of the data and is type-unstable — pass the landed schema")
    val r = spark.read
    val r2 = schema.fold(r)(r.schema)
    format match {
      case "csv" => r2.option("header", "true")
        .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").csv(path)
      case "json" => r2.option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").json(path)
      case other => r2.format(other).load(path)
    }
  }
}
