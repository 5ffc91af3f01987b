package graft.tools

import org.apache.spark.sql.SparkSession

import graft.spark.SparkQueries

/** Round-7 plan capture: writes `plans/r07/<query>_<suffix>.txt` with the
  * formatted physical plan of every query touched by the optimization round
  * (run with suffix `before` at the pre-change commit, `after` at the end).
  * Uses the Bench session configuration so the captured plans are the ones
  * the driver's bench actually executes. Queries with EAGER prefixes
  * (training loops, persisted-state builds) run those parts at construction
  * time; the captured plan is the final lazy action plan, which is what the
  * timed `count()` executes last.
  */
object R07Plans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: R07Plans <before|after> [sfDir]")
    val suffix = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = java.nio.file.Paths.get("plans/r07")
    java.nio.file.Files.createDirectories(out)
    val qs: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "q_pipeline" -> (() => SparkQueries.pipelineStats(spark, dir)),
      "q_domain_cap" -> (() => SparkQueries.domainCapStats(spark, dir)),
      "q_token_budget" -> (() => SparkQueries.tokenBudgetStats(spark, dir)),
      "q_topk_select" -> (() => SparkQueries.topkSelect(spark, dir)),
      "q_dsir" -> (() => SparkQueries.dsirResample(spark, dir)),
      "q_simhash_pairs" -> (() => SparkQueries.simhashPairs(spark, dir)),
      "q_classifier_train" -> (() => SparkQueries.classifierTrain(spark, dir)),
      "q_semdedup" -> (() => SparkQueries.semDedup(spark, dir)),
      "q_ann_ivfpq_recall" -> (() => SparkQueries.annIvfPqRecall(spark, dir)),
      "q_pipeline_incremental" -> (() => SparkQueries.pipelineIncremental(spark, dir)),
      "pages_sketch_battery" -> (() => SparkQueries.pagesSketchBattery(spark, 20000L)))
    qs.foreach { case (name, mk) =>
      try {
        val df = mk()
        // EXECUTE first (noop sink), so the dumped plan is the FINAL
        // adaptive plan — AQE's runtime exchange/stage reuse (the round-7
        // shared-exchange claims) is invisible in the pre-execution plan
        df.write.format("noop").mode("overwrite").save()
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(out.resolve(s"${name}_$suffix.txt"), plan)
        println(s"[r07plans] wrote ${name}_$suffix.txt")
      } catch {
        case t: Throwable =>
          println(s"[r07plans] $name FAILED: ${t.getMessage}")
      }
    }
    spark.stop()
  }
}
