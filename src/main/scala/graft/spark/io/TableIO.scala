package graft.spark.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Table access with the production/Iceberg seam (SURVEY.md §7.4): locally
  * everything is parquet (no iceberg-spark-runtime jar ships in this
  * sandbox); in production set `spark.graft.table.format=iceberg` and paths
  * become catalog table names — nothing else changes, because the engine only
  * ever consumes a DataFrame with the pages schema.
  */
object TableIO {
  /** The Common-Crawl-style pages schema (BASELINE.json input_hint). */
  val pagesSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  private def format(spark: SparkSession): String =
    spark.conf.get("spark.graft.table.format", "parquet")

  def readPages(spark: SparkSession, pathOrTable: String): DataFrame = format(spark) match {
    case "iceberg" => spark.read.format("iceberg").load(pathOrTable)
    case "parquet" => spark.read.parquet(pathOrTable)
    case other     => spark.read.format(other).load(pathOrTable)
  }

  def writePages(df: DataFrame, pathOrTable: String, mode: String = "overwrite"): Unit =
    format(df.sparkSession) match {
      case "iceberg" => df.writeTo(pathOrTable).createOrReplace()
      case _         => df.write.mode(mode).parquet(pathOrTable)
    }
}
