package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.io.Bucketing

/** Pins the scale claim of the bucketed layout: equi-joins and aggregations
  * on the bucket key run with NO Exchange (shuffle) in the physical plan,
  * and produce the same rows as the shuffled baseline. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]").appName("bucketing")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("same-key same-count bucketed tables join and aggregate shuffle-free") {
    import spark.implicits._
    val left = (0L until 5000L).map(i => (i % 997, s"l-$i")).toDF("k", "lv")
    val right = (0L until 3000L).map(i => (i % 997, s"r-$i")).toDF("k", "rv")
    Bucketing.writeBucketed(left, "graft_bkt_left", "k", 8)
    Bucketing.writeBucketed(right, "graft_bkt_right", "k", 8)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      // force a sort-merge join and a deterministic (non-adaptive) plan so
      // the Exchange assertion reads the real shape
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val l = Bucketing.readTable(spark, "graft_bkt_left")
      val r = Bucketing.readTable(spark, "graft_bkt_right")
      val joined = l.join(r, "k").groupBy("k").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

      // baseline (shuffled) produces identical results
      val baseline = left.join(right, "k").groupBy("k").agg(count(lit(1)).as("n"))
      assert(joined.collect().sortBy(_.getLong(0)).toSeq ==
        baseline.collect().sortBy(_.getLong(0)).toSeq)

      // aggregation alone on the bucket key is also exchange-free
      val aggPlan = l.groupBy("k").agg(count(lit(1)))
        .queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"), s"bucketed agg must not shuffle:\n$aggPlan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      Bucketing.dropTable(spark, "graft_bkt_left")
      Bucketing.dropTable(spark, "graft_bkt_right")
    }
  }
}
