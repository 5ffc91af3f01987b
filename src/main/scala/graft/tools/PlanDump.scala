package graft.tools

import org.apache.spark.sql.SparkSession

import graft.spark.SparkQueries

/** Dev tool: print formatted physical plans of the headline queries so scan
  * pruning / pushdown / join strategies can be reviewed. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "docsStats" -> SparkQueries.docsStats(spark, dir),
      "bloomSemiJoin" -> SparkQueries.bloomSemiJoin(spark, dir),
      "hllDistinct" -> SparkQueries.hllDistinct(spark, dir),
      "heavyDomainsExact" -> SparkQueries.heavyDomainsExact(spark, dir),
      "minhashPairs" -> SparkQueries.minhashPairs(spark, dir),
      "annBruteForce" -> SparkQueries.annBruteForce(spark, dir),
      "semDedup" -> SparkQueries.semDedup(spark, dir),
      "dsirResample" -> SparkQueries.dsirResample(spark, dir))
    qs.foreach { case (name, df) =>
      println(s"\n=================== $name ===================")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
