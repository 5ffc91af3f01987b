package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.io.TableIO

/** Parquet NATIVE bloom filters (storage-level row-group pruning) — written,
  * present in the footer, and the data still reads back exactly. */
class ParquetBloomSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]").appName("pqbloom")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("writeParquetWithBloom puts a bloom filter in the footer; reads are unchanged") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pqbloom").toString + "/t"
    val df = (0L until 5000L).map(i => (s"https://d${i % 97}.example.com/p/$i", i))
      .toDF("url", "v").coalesce(1)
    TableIO.writeParquetWithBloom(df, dir, Seq("url"), ndv = 10000L)
    assert(TableIO.parquetHasBloom(spark, dir, "url"))
    assert(!TableIO.parquetHasBloom(spark, dir, "v"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 5000)
    assert(back.filter(col("url") === "https://d5.example.com/p/5").count() == 1)
    import scala.reflect.io.Directory
    new Directory(new java.io.File(dir)).deleteRecursively()
  }
}
