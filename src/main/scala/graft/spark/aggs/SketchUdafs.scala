package graft.spark.aggs

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udaf

/** udaf-wrapped sketch aggregators — the DataFrame-facing registry.
  *
  * `functions.udaf` lowers each typed Aggregator to a `ScalaAggregator`
  * (a Catalyst `TypedImperativeAggregate`): partial aggregation runs
  * per-partition with the live sketch object as the buffer, and only the
  * shuffle boundary serializes it. Multi-column inputs ((key, count)) map to
  * the flattened tuple encoder, so `cms(...)($"key", $"cnt")` works directly.
  */
object SketchUdafs {
  private val keyCountEnc: Encoder[(String, Long)] =
    Encoders.tuple(Encoders.STRING, Encoders.scalaLong)

  def bloom(estElements: Long, fpr: Double): UserDefinedFunction =
    udaf(new BloomAgg(estElements, fpr), Encoders.STRING)

  def cbf(estElements: Long, fpr: Double): UserDefinedFunction =
    udaf(new CbfAgg(estElements, fpr), keyCountEnc)

  def cms(width: Int, depth: Int): UserDefinedFunction =
    udaf(new CmsAgg(width, depth), keyCountEnc)

  def heavyHitters(numHitters: Int, width: Int, depth: Int): UserDefinedFunction =
    udaf(new HeavyHittersAgg(numHitters, width, depth), keyCountEnc)

  def streamThreshold(threshold: Long, width: Int, depth: Int): UserDefinedFunction =
    udaf(new StreamThresholdAgg(threshold, width, depth), keyCountEnc)

  def cuckoo(capacity: Int, bucketSize: Int, fingerprintBits: Int): UserDefinedFunction =
    udaf(new CuckooAgg(capacity, bucketSize, fingerprintBits), Encoders.STRING)

  def countingCuckoo(capacity: Int, bucketSize: Int, fingerprintBits: Int): UserDefinedFunction =
    udaf(new CountingCuckooAgg(capacity, bucketSize, fingerprintBits), Encoders.STRING)

  def quotientFilter(quotient: Int): UserDefinedFunction =
    udaf(new QuotientFilterAgg(quotient), Encoders.STRING)

  def ebf(estElements: Long, fpr: Double): UserDefinedFunction =
    udaf(new EbfAgg(estElements, fpr), Encoders.STRING)

  def hll(p: Int): UserDefinedFunction =
    udaf(new HllAgg(p), Encoders.STRING)

  def hllCount(p: Int): UserDefinedFunction =
    udaf(new HllCountAgg(p), Encoders.STRING)

  def kll(k: Int): UserDefinedFunction =
    udaf(new KllAgg(k), Encoders.scalaDouble)

  def tdigest(compression: Double): UserDefinedFunction =
    udaf(new TDigestAgg(compression), Encoders.scalaDouble)

  /** Register every sketch aggregate for SQL use:
    * `SELECT lang, hll_count(url) FROM pages GROUP BY lang`. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("bloom_agg", bloom(1000000, 0.01))
    spark.udf.register("cbf_agg", cbf(1000000, 0.01))
    spark.udf.register("cms_agg", cms(2048, 5))
    spark.udf.register("heavy_hitters", heavyHitters(10, 4096, 5))
    spark.udf.register("stream_threshold", streamThreshold(100, 4096, 5))
    spark.udf.register("cuckoo_agg", cuckoo(100000, 4, 32))
    spark.udf.register("counting_cuckoo_agg", countingCuckoo(100000, 4, 32))
    spark.udf.register("qf_agg", quotientFilter(18))
    spark.udf.register("ebf_agg", ebf(10000, 0.01))
    spark.udf.register("hll_agg", hll(14))
    spark.udf.register("hll_count", hllCount(14))
    spark.udf.register("kll_agg", kll(200))
    spark.udf.register("tdigest_agg", tdigest(100.0))
  }
}
