package graft.spark.aggs

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.core._
import graft.ext._
import graft.hash.Fnv1aHasher

/** Mergeable sketch aggregators.
  *
  * Each is a typed `Aggregator[IN, SKETCH, OUT]` exposed through
  * `functions.udaf(...)` (see [[SketchUdafs]]). Spark lowers these to
  * `ScalaAggregator`, a `TypedImperativeAggregate`: the mutable sketch object
  * lives in the hash-aggregate buffer per partition (zero per-row
  * serialization), crosses the partial→final shuffle boundary in the
  * REFERENCE export format (the [[SketchEncoders]] TransformingEncoder
  * codecs), and `merge` is exactly the reference's union/join semantics —
  * associative + commutative, so partition count and ordering cannot change
  * the result (property-tested in SparkAggSpec).
  *
  * `finish` emits the reference-format bytes ([[graft.core]] codecs), so a
  * checkpointed sketch column is directly loadable by the reference library.
  */
/** Buffer encoders that serialize aggregation state in the REFERENCE export
  * format (BASELINE.json: "Catalyst-friendly binary state encoders") — so
  * shuffle bytes == checkpoint bytes == reference-loadable exports. Built on
  * Catalyst's TransformingEncoder over the BinaryEncoder. */
object SketchEncoders {
  import scala.reflect.ClassTag
  import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoders, Codec, ExpressionEncoder}

  def refEncoder[T](enc: T => Array[Byte], dec: Array[Byte] => T)(
      implicit ct: ClassTag[T]): Encoder[T] =
    ExpressionEncoder(
      new AgnosticEncoders.TransformingEncoder[T, Array[Byte]](
        ct,
        AgnosticEncoders.BinaryEncoder,
        () => new Codec[T, Array[Byte]] {
          override def encode(t: T): Array[Byte] = enc(t)
          override def decode(b: Array[Byte]): T = dec(b)
        },
        false))

  implicit val bloomEnc: Encoder[BloomFilter] =
    refEncoder[BloomFilter](_.toBytes, BloomFilter.fromBytes(_))
  implicit val cbfEnc: Encoder[CountingBloomFilter] =
    refEncoder[CountingBloomFilter](_.toBytes, CountingBloomFilter.fromBytes(_))
  implicit val cmsEnc: Encoder[CountMinSketch] =
    refEncoder[CountMinSketch](_.toBytes, CountMinSketch.fromBytes(_))
  implicit val hhEnc: Encoder[HeavyHitters] =
    refEncoder[HeavyHitters](_.toBytes, HeavyHitters.fromBytes(_))
  implicit val stEnc: Encoder[StreamThreshold] =
    refEncoder[StreamThreshold](_.toBytes, StreamThreshold.fromBytes(_))
  implicit val qfEnc: Encoder[QuotientFilter] =
    refEncoder[QuotientFilter](_.toBytes, QuotientFilter.fromBytes(_))
  implicit val ebfEnc: Encoder[ExpandingBloomFilter] =
    refEncoder[ExpandingBloomFilter](_.toBytes, ExpandingBloomFilter.fromBytes(_))
  implicit val hllEnc: Encoder[Hll] = refEncoder[Hll](_.toBytes, Hll.fromBytes)
  implicit val kllEnc: Encoder[Kll] = refEncoder[Kll](_.toBytes, Kll.fromBytes)
  implicit val tdEnc: Encoder[TDigest] = refEncoder[TDigest](_.toBytes, TDigest.fromBytes)

  /** The cuckoo byte format omits (expansionRate, autoExpand, fp bits) —
    * the per-aggregator encoders below close over those params. */
  def cuckooEncoder(expansionRate: Int, autoExpand: Boolean, fpBits: Int): Encoder[CuckooFilter] =
    refEncoder[CuckooFilter](_.toBytes, CuckooFilter.fromBytes(_, expansionRate, autoExpand, fpBits))
  def ccfEncoder(expansionRate: Int, autoExpand: Boolean, fpBits: Int): Encoder[CountingCuckooFilter] =
    refEncoder[CountingCuckooFilter](_.toBytes, CountingCuckooFilter.fromBytes(_, expansionRate, autoExpand, fpBits))

  val binaryEnc: Encoder[Array[Byte]] = Encoders.BINARY
}

import SketchEncoders._

final class BloomAgg(estElements: Long, fpr: Double)
    extends Aggregator[String, BloomFilter, Array[Byte]] {
  def zero: BloomFilter = BloomFilter.empty(estElements, fpr, Fnv1aHasher)
  def reduce(b: BloomFilter, key: String): BloomFilter = { if (key != null) b.add(key); b }
  def merge(a: BloomFilter, b: BloomFilter): BloomFilter = a.orInPlace(b)
  def finish(b: BloomFilter): Array[Byte] = b.toBytes
  def bufferEncoder: Encoder[BloomFilter] = bloomEnc
  def outputEncoder: Encoder[Array[Byte]] = binaryEnc
}

/** Weighted counting bloom: IN = (key, count). */
final class CbfAgg(estElements: Long, fpr: Double)
    extends Aggregator[(String, Long), CountingBloomFilter, Array[Byte]] {
  def zero: CountingBloomFilter = CountingBloomFilter.empty(estElements, fpr, Fnv1aHasher)
  def reduce(b: CountingBloomFilter, in: (String, Long)): CountingBloomFilter = {
    // negative counts are removals (the reference's remove(), with its own
    // clamping rules) — not negative adds
    if (in._1 != null) {
      if (in._2 >= 0) b.add(in._1, in._2) else b.remove(in._1, -in._2)
    }
    b
  }
  def merge(a: CountingBloomFilter, b: CountingBloomFilter): CountingBloomFilter = a.addInPlace(b)
  def finish(b: CountingBloomFilter): Array[Byte] = b.toBytes
  def bufferEncoder: Encoder[CountingBloomFilter] = cbfEnc
  def outputEncoder: Encoder[Array[Byte]] = binaryEnc
}

final class CmsAgg(width: Int, depth: Int)
    extends Aggregator[(String, Long), CountMinSketch, Array[Byte]] {
  def zero: CountMinSketch = CountMinSketch.empty(width, depth, CmsQueryType.Min, Fnv1aHasher)
  def reduce(b: CountMinSketch, in: (String, Long)): CountMinSketch = {
    if (in._1 != null) {
      if (in._2 >= 0) b.add(in._1, in._2) else b.remove(in._1, -in._2)
    }
    b
  }
  def merge(a: CountMinSketch, b: CountMinSketch): CountMinSketch = a.join(b)
  def finish(b: CountMinSketch): Array[Byte] = b.toBytes
  def bufferEncoder: Encoder[CountMinSketch] = cmsEnc
  def outputEncoder: Encoder[Array[Byte]] = binaryEnc
}

/** Distributed heavy hitters: per-partition HH (CMS + candidate set), merged
  * via the two-phase candidate-union documented in SURVEY.md §7.7.1. OUT is
  * the final top-k map. */
final class HeavyHittersAgg(numHitters: Int, width: Int, depth: Int)
    extends Aggregator[(String, Long), HeavyHitters, Map[String, Long]] {
  // track extra candidates per partition so the merged top-k is a superset
  // of the exact top-k whenever the per-partition tails don't conspire
  private val slack = math.max(numHitters * 4, numHitters + 16)
  def zero: HeavyHitters = HeavyHitters.empty(slack, width, depth, Fnv1aHasher)
  def reduce(b: HeavyHitters, in: (String, Long)): HeavyHitters = {
    if (in._1 != null) b.add(in._1, in._2); b
  }
  def merge(a: HeavyHitters, b: HeavyHitters): HeavyHitters = a.merge(b)
  def finish(b: HeavyHitters): Map[String, Long] =
    b.heavyHitters.toSeq.sortBy { case (k, v) => (-v, k) }.take(numHitters).toMap
  def bufferEncoder: Encoder[HeavyHitters] = hhEnc
  def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

final class StreamThresholdAgg(threshold: Long, width: Int, depth: Int)
    extends Aggregator[(String, Long), StreamThreshold, Map[String, Long]] {
  def zero: StreamThreshold = StreamThreshold.empty(threshold, width, depth, Fnv1aHasher)
  def reduce(b: StreamThreshold, in: (String, Long)): StreamThreshold = {
    if (in._1 != null) b.add(in._1, in._2); b
  }
  def merge(a: StreamThreshold, b: StreamThreshold): StreamThreshold = a.merge(b)
  def finish(b: StreamThreshold): Map[String, Long] = b.meetsThreshold
  def bufferEncoder: Encoder[StreamThreshold] = stEnc
  def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

final class CuckooAgg(capacity: Int, bucketSize: Int, fingerprintBits: Int)
    extends Aggregator[String, CuckooFilter, Array[Byte]] {
  def zero: CuckooFilter =
    new CuckooFilter(capacity, bucketSize, 500, 2, true, fingerprintBits)
  def reduce(b: CuckooFilter, key: String): CuckooFilter = { if (key != null) b.add(key); b }
  def merge(a: CuckooFilter, b: CuckooFilter): CuckooFilter =
    if (a.elementsAdded >= b.elementsAdded) a.mergeFrom(b) else b.mergeFrom(a)
  def finish(b: CuckooFilter): Array[Byte] = b.toBytes
  def bufferEncoder: Encoder[CuckooFilter] =
    SketchEncoders.cuckooEncoder(2, autoExpand = true, fingerprintBits)
  def outputEncoder: Encoder[Array[Byte]] = binaryEnc
}

final class CountingCuckooAgg(capacity: Int, bucketSize: Int, fingerprintBits: Int)
    extends Aggregator[String, CountingCuckooFilter, Array[Byte]] {
  def zero: CountingCuckooFilter =
    new CountingCuckooFilter(capacity, bucketSize, 500, 2, true, fingerprintBits)
  def reduce(b: CountingCuckooFilter, key: String): CountingCuckooFilter = {
    if (key != null) b.add(key); b
  }
  def merge(a: CountingCuckooFilter, b: CountingCuckooFilter): CountingCuckooFilter =
    if (a.insertedElements >= b.insertedElements) a.mergeFrom(b) else b.mergeFrom(a)
  def finish(b: CountingCuckooFilter): Array[Byte] = b.toBytes
  def bufferEncoder: Encoder[CountingCuckooFilter] =
    SketchEncoders.ccfEncoder(2, autoExpand = true, fingerprintBits)
  def outputEncoder: Encoder[Array[Byte]] = binaryEnc
}

final class QuotientFilterAgg(quotient: Int)
    extends Aggregator[String, QuotientFilter, Array[Byte]] {
  def zero: QuotientFilter = QuotientFilter(quotient, autoExpand = true)
  def reduce(b: QuotientFilter, key: String): QuotientFilter = { if (key != null) b.add(key); b }
  def merge(a: QuotientFilter, b: QuotientFilter): QuotientFilter = {
    if (a.elementsAdded >= b.elementsAdded) { a.merge(b); a } else { b.merge(a); b }
  }
  def finish(b: QuotientFilter): Array[Byte] = b.toBytes
  def bufferEncoder: Encoder[QuotientFilter] = qfEnc
  def outputEncoder: Encoder[Array[Byte]] = binaryEnc
}

/** Expanding bloom built with force=true adds (the commutative mode,
  * SURVEY.md §7.7.1); merge concatenates sub-bloom lists. */
final class EbfAgg(estElements: Long, fpr: Double)
    extends Aggregator[String, ExpandingBloomFilter, Array[Byte]] {
  def zero: ExpandingBloomFilter = ExpandingBloomFilter(estElements, fpr, Fnv1aHasher)
  def reduce(b: ExpandingBloomFilter, key: String): ExpandingBloomFilter = {
    if (key != null) b.add(key, force = true); b
  }
  def merge(a: ExpandingBloomFilter, b: ExpandingBloomFilter): ExpandingBloomFilter = a.mergeFrom(b)
  def finish(b: ExpandingBloomFilter): Array[Byte] = b.toBytes
  def bufferEncoder: Encoder[ExpandingBloomFilter] = ebfEnc
  def outputEncoder: Encoder[Array[Byte]] = binaryEnc
}

final class HllAgg(p: Int) extends Aggregator[String, Hll, Array[Byte]] {
  def zero: Hll = Hll(p)
  def reduce(b: Hll, key: String): Hll = { if (key != null) b.add(key); b }
  def merge(a: Hll, b: Hll): Hll = a.merge(b)
  def finish(b: Hll): Array[Byte] = b.toBytes
  def bufferEncoder: Encoder[Hll] = hllEnc
  def outputEncoder: Encoder[Array[Byte]] = binaryEnc
}

/** HLL with a Long estimate as output — the common "distinct count" shape. */
final class HllCountAgg(p: Int) extends Aggregator[String, Hll, Long] {
  def zero: Hll = Hll(p)
  def reduce(b: Hll, key: String): Hll = { if (key != null) b.add(key); b }
  def merge(a: Hll, b: Hll): Hll = a.merge(b)
  def finish(b: Hll): Long = b.estimate
  def bufferEncoder: Encoder[Hll] = hllEnc
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

final class KllAgg(k: Int) extends Aggregator[Double, Kll, Array[Byte]] {
  def zero: Kll = Kll(k)
  def reduce(b: Kll, v: Double): Kll = { b.update(v); b }
  def merge(a: Kll, b: Kll): Kll = a.merge(b)
  def finish(b: Kll): Array[Byte] = b.toBytes
  def bufferEncoder: Encoder[Kll] = kllEnc
  def outputEncoder: Encoder[Array[Byte]] = binaryEnc
}

final class TDigestAgg(compression: Double) extends Aggregator[Double, TDigest, Array[Byte]] {
  def zero: TDigest = TDigest(compression)
  def reduce(b: TDigest, v: Double): TDigest = { b.update(v); b }
  def merge(a: TDigest, b: TDigest): TDigest = a.merge(b)
  def finish(b: TDigest): Array[Byte] = b.toBytes
  def bufferEncoder: Encoder[TDigest] = tdEnc
  def outputEncoder: Encoder[Array[Byte]] = binaryEnc
}
