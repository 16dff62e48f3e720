package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink format matrix beyond parquet: CSV, JSON-lines, and ORC with
  * explicit-schema readers (no `inferSchema` in the engine — inference is
  * a second full scan and produces drifting types; SURVEY.md §1.3's
  * "explicit StructType constants" rule).
  *
  * Timestamps round-trip via ISO-8601 strings in the text formats (the
  * reference's own API boundary encoding, `api/app/main.py:139-141`).
  */
object Formats {

  private val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("timestampFormat", tsFmt)
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true").option("timestampFormat", tsFmt)
      .csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("timestampFormat", tsFmt).json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("timestampFormat", tsFmt).json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
