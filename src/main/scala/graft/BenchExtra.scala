package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.spark.SparkQueries

/** Noop-sink isolation bench (guide §1.4) — NOT the driver artifact:
  * `graft.Bench` stays the frozen harness; this main exists so the
  * optimization notes can cite per-query COMPUTE times with every column of
  * every row materialized (`.count()` lets the optimizer prune aggregate
  * expressions that don't affect the row count) and with jobs labeled for
  * the UI. Same session configuration, warm-up + min-of-3, one JSON line.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... runMain graft.BenchExtra
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def time(name: String, mk: => DataFrame): Double = {
      spark.sparkContext.setJobDescription(s"bench-extra: $name")
      noop(mk) // warm-up (JIT + codegen + parquet footers + index builds)
      val t = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        noop(mk)
        (System.nanoTime() - t0) / 1e9
      }.min
      spark.sparkContext.setJobDescription(null)
      t
    }

    val qs: Seq[(String, () => DataFrame)] = Seq(
      "q_lineitem_pricing" -> (() => SparkQueries.lineitemPricing(spark, sfDir)),
      "q_dedup_exact" -> (() => SparkQueries.dedupExact(spark, sfDir)),
      "q_minhash_pairs" -> (() => SparkQueries.minhashPairsBench(spark, sfDir)),
      "q_simhash_pairs" -> (() => SparkQueries.simhashPairs(spark, sfDir)),
      "q_bloom_semijoin" -> (() => SparkQueries.bloomSemiJoin(spark, sfDir)),
      "q_domain_cap" -> (() => SparkQueries.domainCapStats(spark, sfDir)),
      "q_token_budget" -> (() => SparkQueries.tokenBudgetStats(spark, sfDir)),
      "q_topk_select" -> (() => SparkQueries.topkSelect(spark, sfDir)),
      "q_pipeline" -> (() => SparkQueries.pipelineStats(spark, sfDir)),
      "q_pipeline_incremental" -> (() => SparkQueries.pipelineIncremental(spark, sfDir)),
      "q_dsir" -> (() => SparkQueries.dsirResample(spark, sfDir)),
      "q_classifier_train" -> (() => SparkQueries.classifierTrain(spark, sfDir)),
      "q_semdedup" -> (() => SparkQueries.semDedup(spark, sfDir)),
      "q_ann_ivfpq_recall" -> (() => SparkQueries.annIvfPqRecall(spark, sfDir)),
      "pages_sketch_battery" -> (() => SparkQueries.pagesSketchBattery(spark, Bench.benchPages)))

    val results = qs.map { case (name, mk) =>
      name -> (try time(name, mk()) catch { case _: Throwable => -1.0 })
    }
    val json = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{\"sink\":\"noop\",\"sf\":\"" + sfDir + "\",\"queries\":{", ",", "}}")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/graft_bench_extra.json"), json)
    catch { case _: Throwable => }
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(json)
  }
}
