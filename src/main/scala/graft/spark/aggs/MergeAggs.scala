package graft.spark.aggs

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{col, pmod, udaf, xxhash64}

import graft.core._
import graft.ext._
import SketchEncoders._

/** Sketch-MERGE aggregators: fold a column of serialized sketches into one.
  * These are the second level of two-level (salted) aggregation and the
  * reducers for checkpoint tables — the distributed form of the reference's
  * driver-side `union`/`join`/`merge` API.
  */
final class BloomUnionAgg extends Aggregator[Array[Byte], BloomFilter, Array[Byte]] {
  def zero: BloomFilter = null
  def reduce(b: BloomFilter, in: Array[Byte]): BloomFilter =
    if (in == null) b
    else if (b == null) BloomFilter.fromBytes(in)
    else b.orInPlace(BloomFilter.fromBytes(in))
  def merge(a: BloomFilter, b: BloomFilter): BloomFilter =
    if (a == null) b else if (b == null) a else a.orInPlace(b)
  def finish(b: BloomFilter): Array[Byte] = if (b == null) null else b.toBytes
  def bufferEncoder: Encoder[BloomFilter] = bloomEnc
  def outputEncoder: Encoder[Array[Byte]] = binaryEnc
}

final class HllUnionAgg extends Aggregator[Array[Byte], Hll, Array[Byte]] {
  def zero: Hll = null
  def reduce(b: Hll, in: Array[Byte]): Hll =
    if (in == null) b else if (b == null) Hll.fromBytes(in) else b.merge(Hll.fromBytes(in))
  def merge(a: Hll, b: Hll): Hll = if (a == null) b else if (b == null) a else a.merge(b)
  def finish(b: Hll): Array[Byte] = if (b == null) null else b.toBytes
  def bufferEncoder: Encoder[Hll] = hllEnc
  def outputEncoder: Encoder[Array[Byte]] = binaryEnc
}

final class CmsJoinAgg extends Aggregator[Array[Byte], CountMinSketch, Array[Byte]] {
  def zero: CountMinSketch = null
  def reduce(b: CountMinSketch, in: Array[Byte]): CountMinSketch =
    if (in == null) b
    else if (b == null) CountMinSketch.fromBytes(in)
    else b.join(CountMinSketch.fromBytes(in))
  def merge(a: CountMinSketch, b: CountMinSketch): CountMinSketch =
    if (a == null) b else if (b == null) a else a.join(b)
  def finish(b: CountMinSketch): Array[Byte] = if (b == null) null else b.toBytes
  def bufferEncoder: Encoder[CountMinSketch] = cmsEnc
  def outputEncoder: Encoder[Array[Byte]] = binaryEnc
}

final class KllMergeAgg extends Aggregator[Array[Byte], Kll, Array[Byte]] {
  def zero: Kll = null
  def reduce(b: Kll, in: Array[Byte]): Kll =
    if (in == null) b else if (b == null) Kll.fromBytes(in) else b.merge(Kll.fromBytes(in))
  def merge(a: Kll, b: Kll): Kll = if (a == null) b else if (b == null) a else a.merge(b)
  def finish(b: Kll): Array[Byte] = if (b == null) null else b.toBytes
  def bufferEncoder: Encoder[Kll] = kllEnc
  def outputEncoder: Encoder[Array[Byte]] = binaryEnc
}

final class TDigestMergeAgg extends Aggregator[Array[Byte], TDigest, Array[Byte]] {
  def zero: TDigest = null
  def reduce(b: TDigest, in: Array[Byte]): TDigest =
    if (in == null) b else if (b == null) TDigest.fromBytes(in) else b.merge(TDigest.fromBytes(in))
  def merge(a: TDigest, b: TDigest): TDigest =
    if (a == null) b else if (b == null) a else a.merge(b)
  def finish(b: TDigest): Array[Byte] = if (b == null) null else b.toBytes
  def bufferEncoder: Encoder[TDigest] = tdEnc
  def outputEncoder: Encoder[Array[Byte]] = binaryEnc
}

/** Explicit two-level (salted) aggregation for skewed keys (SURVEY.md §7.4;
  * the north rule's "salted-key skew handling"). Legal because every sketch
  * merge is associative + commutative:
  *
  *   stage 1: groupBy(key, salt = pmod(xxhash64(saltCol), S)) building
  *            partial sketches — a skewed key's load spreads over S reducers;
  *   stage 2: groupBy(key) folding the S partials with the merge aggregator.
  *
  * Equivalent to the direct single-level aggregate (asserted byte-exactly for
  * Bloom/HLL in SaltedAggSpec), at the cost of one extra small exchange.
  */
object SaltedAgg {
  val bloomUnion = udaf(new BloomUnionAgg, Encoders.BINARY)
  val hllUnion = udaf(new HllUnionAgg, Encoders.BINARY)
  val cmsJoin = udaf(new CmsJoinAgg, Encoders.BINARY)
  val kllMerge = udaf(new KllMergeAgg, Encoders.BINARY)
  val tdigestMerge = udaf(new TDigestMergeAgg, Encoders.BINARY)

  /** Two-level HLL + Bloom battery over a skewed key. `saltCol` should be a
    * high-cardinality column (e.g. the url) so salting splits the hot key. */
  def hllBloomTwoLevel(df: DataFrame, groupKey: Column, valueCol: Column,
                       saltBuckets: Int, hllP: Int = 14,
                       bloomEst: Long = 1000000L, bloomFpr: Double = 0.01): DataFrame = {
    val stage1 = df
      .groupBy(groupKey.as("k"),
        pmod(xxhash64(valueCol), org.apache.spark.sql.functions.lit(saltBuckets)).as("salt"))
      .agg(
        SketchUdafs.hll(hllP)(valueCol).as("hll_part"),
        SketchUdafs.bloom(bloomEst, bloomFpr)(valueCol).as("bloom_part"))
    stage1
      .groupBy(col("k"))
      .agg(hllUnion(col("hll_part")).as("hll"),
        bloomUnion(col("bloom_part")).as("bloom"))
  }
}
