package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.spark.SparkQueries

/** Driver-run benchmark: headline queries on SPARK_GRAFT_SF_DIR, one JSON
  * line on stdout. The heavy sketch-build path also reports pages/sec
  * (the north-rule metric) via the synthetic pages battery.
  */
object Bench {
  // headline subset: the shapes that dominate at scale — scan+agg, sketch
  // builds, semi-join pruning, dedup joins
  val headline: Seq[String] = Seq(
    "q_lineitem_pricing", "q_dedup_exact", "q_token_stats", "q_events_hourly",
    "q_bloom_semijoin", "q_hll_distinct", "q_cms_heavy_hitters",
    "q_kll_quantiles", "q_tdigest_quantiles", "q_minhash_pairs",
    "q_simhash_pairs", "q_ann_topk", "q_heavy_domains_exact", "q_quality")

  val benchPages = 200000L

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Long): Double = {
      f // warm-up: JIT + codegen + parquet footer caches
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    headline.foreach { name =>
      val fn = SparkEntry.queries(name)
      results(name) = try time(fn(spark, sfDir).count()) catch { case _: Throwable => -1.0 }
    }
    // the north-rule workload: full sketch battery over synthetic pages
    val pagesSec = time(SparkQueries.pagesSketchBattery(spark, benchPages).count())
    results("pages_sketch_battery") = pagesSec
    val pagesRate = benchPages / pagesSec

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"pages_per_sec":$pagesRate%.0f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
