package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.aggs.{NativeSketchAggs, SketchUdafs}

/** Native TypedImperativeAggregates (Bloom/KLL/HH) vs the udaf paths: same
  * bytes / same outputs under identical partitioning, partition invariance
  * where the algebra guarantees it. */
class NativeParitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def urls(parts: Int) =
    spark.range(0, 20000, 1, parts)
      .select(concat(lit("https://d"), col("id") % 37, lit(".example.com/p/"), col("id") % 6000)
        .as("k"))

  test("native Bloom == udaf Bloom bytes; partition invariant (OR algebra)") {
    val n8 = urls(8).agg(NativeSketchAggs.bloomNative(col("k"), 100000, 0.01))
      .head().getAs[Array[Byte]](0)
    val u8 = urls(8).agg(SketchUdafs.bloom(100000, 0.01)(col("k")))
      .head().getAs[Array[Byte]](0)
    assert(n8.toSeq == u8.toSeq)
    val n1 = urls(1).agg(NativeSketchAggs.bloomNative(col("k"), 100000, 0.01))
      .head().getAs[Array[Byte]](0)
    assert(n1.toSeq == n8.toSeq)
    // non-ascii fallback path
    import spark.implicits._
    val uni = (0 until 1000).map(i => s"ключ-$i").toDF("k").repartition(4)
    val nu = uni.agg(NativeSketchAggs.bloomNative(col("k"), 10000, 0.01)).head().getAs[Array[Byte]](0)
    val uu = uni.agg(SketchUdafs.bloom(10000, 0.01)(col("k"))).head().getAs[Array[Byte]](0)
    assert(nu.toSeq == uu.toSeq)
  }

  test("native KLL == udaf KLL bytes under identical partitioning") {
    val vals = spark.range(0, 30000, 1, 8)
      .select(((col("id") * 2654435761L) % 100000).cast("double").as("v"))
    val n = vals.agg(NativeSketchAggs.kllNative(col("v"), 200)).head().getAs[Array[Byte]](0)
    val u = vals.agg(SketchUdafs.kll(200)(col("v"))).head().getAs[Array[Byte]](0)
    assert(n.toSeq == u.toSeq)
    // quantiles agree with exact ranks regardless of partitioning
    val kll = graft.ext.Kll.fromBytes(n)
    val q50 = kll.quantile(0.5)
    assert(math.abs(q50 - 50000) < 5000, s"p50=$q50")
  }

  test("native HH == udaf HH top-k map on a zipf stream") {
    val keys = spark.range(0, 50000, 1, 8)
      .select(concat(lit("d"),
        floor(pow(col("id") % 1000 + 1, 0.5)).cast("int")).as("k"), lit(1L).as("c"))
    val n = keys.agg(NativeSketchAggs.heavyHittersNative(col("k"), col("c"), 5, 4096, 5))
      .head().getMap[String, Long](0)
    val u = keys.agg(SketchUdafs.heavyHitters(5, 4096, 5)(col("k"), col("c")))
      .head().getMap[String, Long](0)
    assert(Map(n.toSeq: _*) == Map(u.toSeq: _*))
    assert(n.size == 5)
  }
}
