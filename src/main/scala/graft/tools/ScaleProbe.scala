package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.spark.aggs.SketchUdafs

/** Dev tool: isolate which phase of the sketch-build job limits thread
  * scaling (scan vs each aggregator vs the final merge). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/graft_bench_pages"
    Seq(8, 32).foreach { cpus =>
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val pages = spark.read.parquet(dir)

      def t(name: String)(f: => Any): Unit = {
        f // warm
        val best = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          f
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"[probe] cpus=$cpus $name%-22s $best%.2f s (min of 3)")
      }

      t("count")(pages.count())
      t("scan+lensum")(pages.select(sum(length(col("text")))).collect())
      t("exact-groupby")(pages.groupBy("lang").agg(count(lit(1)), approx_count_distinct(col("url"))).collect())
      t("hll-only")(pages.groupBy("lang").agg(SketchUdafs.hllCount(14)(col("url"))).collect())
      t("hll-native")(pages.groupBy("lang").agg(
        graft.spark.aggs.NativeHllCountAgg.hllCountNative(col("url"), 14)).collect())
      t("bloom-only")(pages.groupBy("lang").agg(SketchUdafs.bloom(1000000, 0.01)(col("url"))).collect())
      t("kll-only")(pages.groupBy("lang").agg(SketchUdafs.kll(200)(length(col("text")).cast("double"))).collect())
      t("hh-only")(pages.groupBy("lang").agg(SketchUdafs.heavyHitters(5, 4096, 5)(
        regexp_extract(col("url"), "https://([^/]+)/", 1), lit(1L))).collect())
      spark.stop()
    }
  }
}
