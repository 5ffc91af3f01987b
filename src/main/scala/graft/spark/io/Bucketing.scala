package graft.spark.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins — the 100 TB answer to "this
  * join shuffles both sides every night": pay one hash-partitioned write per
  * table, then every subsequent equi-join or aggregation on the bucket key
  * runs shuffle-free (Spark's bucketed scan reports its hash partitioning to
  * the planner, so the Exchange is elided; BucketingSpec pins the plan
  * shape).
  *
  * Locally the catalog is Spark's embedded one and buckets are parquet files
  * under the warehouse dir; on a cluster the same calls target the
  * production catalog (the TableIO Iceberg seam applies — Iceberg's
  * bucket-transform partitioning is the equivalent layout).
  */
object Bucketing {

  /** Write df hash-bucketed (and sorted within buckets) by keyCol. Joins
    * between tables written with the SAME key and bucket count co-locate. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    numBuckets: Int, mode: String = "overwrite"): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    saveTableWithStaleLocationRetry(spark, table) {
      df.write.mode(mode).format("parquet")
        .bucketBy(numBuckets, keyCol).sortBy(keyCol)
        .saveAsTable(table)
    }
  }

  /** Run a `saveAsTable`-shaped write, recovering ONCE from a stale
    * warehouse directory: the embedded in-memory catalog forgets table
    * METADATA between JVMs but leaves the warehouse DIRECTORY behind, so a
    * fresh session's saveAsTable fails with LOCATION_ALREADY_EXISTS (a
    * SparkRuntimeException in Spark 4, not an AnalysisException). Only then
    * clear the stale location and retry — deleting up-front would race a
    * concurrent session legitimately owning the directory (unqualified names
    * land in the default database: <warehouse>/<table>). */
  def saveTableWithStaleLocationRetry(spark: SparkSession, table: String)
                                     (save: => Unit): Unit =
    try save
    catch {
      case e: Exception
          if e.getMessage != null &&
            e.getMessage.contains("LOCATION_ALREADY_EXISTS") && !table.contains(".") =>
        val loc = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
        save
    }

  /** Append rows to an EXISTING bucketed table with the same layout (the
    * per-batch ingestion path of the persisted indexes): no drop, no
    * location cleanup — Spark validates the bucket spec against the
    * catalog's and fails loudly on a mismatch. */
  def appendBucketed(df: DataFrame, table: String, keyCol: String,
                     numBuckets: Int): Unit =
    df.write.mode("append").format("parquet")
      .bucketBy(numBuckets, keyCol).sortBy(keyCol)
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  def dropTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")
}
