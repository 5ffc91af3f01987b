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

  /** Parquet write with NATIVE parquet bloom filters on the given columns —
    * the storage-level sibling of the engine's Bloom sketches: point-lookup
    * filters (`url = ...`) skip whole row groups at the scan, before any
    * Spark filter runs. `ndv` sizes each filter (split-block bloom,
    * parquet-format spec). */
  def writeParquetWithBloom(df: DataFrame, path: String, bloomCols: Seq[String],
                            ndv: Long = 1000000L, mode: String = "overwrite"): Unit = {
    val w = bloomCols.foldLeft(df.write.mode(mode)) { (wr, c) =>
      wr.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }
    w.parquet(path)
  }

  /** True iff the parquet footer of `path` carries a bloom filter for
    * `column` (verification hook; uses parquet-hadoop directly). */
  def parquetHasBloom(spark: SparkSession, path: String, column: String): Boolean = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    val part = fs.listStatus(new Path(path))
      .map(_.getPath).find(p => p.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalArgumentException(s"no parquet part files in $path"))
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(part, conf))
    try {
      val rg = reader.getFooter.getBlocks.get(0)
      import scala.jdk.CollectionConverters._
      rg.getColumns.asScala.exists { cc =>
        cc.getPath.toDotString == column && cc.getBloomFilterOffset >= 0 &&
          reader.readBloomFilter(cc) != null
      }
    } finally reader.close()
  }
}
