package graft.spark.fns

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

import graft.core._
import graft.ext._

/** Probe-side and sketch-algebra functions.
  *
  * Probe functions take the **deserialized** sketch at construction time:
  * the driver deserializes once, the object ships inside the task binary and
  * is deserialized once per executor, and every row probe is then a pure
  * in-memory lookup (map-side only, no shuffle) — the Spark-native analogue
  * of the reference's `check(key)` path over an in-process structure
  * (SURVEY.md §3.2).
  *
  * Sketch-algebra functions (`bfUnion` etc.) operate on serialized sketch
  * columns — the Spark analogue of the reference's union/intersection/
  * jaccard/join driver-side API (bloom.py:371-460, countminsketch.py:356-399).
  */
object SketchFunctions extends Serializable {

  // ---- probes over a broadcast-style fixed sketch ----

  def bloomContains(bytes: Array[Byte]): UserDefinedFunction = {
    lazy val blm = BloomFilter.fromBytes(bytes)
    udf((key: String) => key != null && blm.check(key))
  }

  def cbfCount(bytes: Array[Byte]): UserDefinedFunction = {
    lazy val cbf = CountingBloomFilter.fromBytes(bytes)
    udf((key: String) => if (key == null) 0L else cbf.check(key))
  }

  def cmsCount(bytes: Array[Byte]): UserDefinedFunction = {
    lazy val cms = CountMinSketch.fromBytes(bytes)
    udf((key: String) => if (key == null) 0L else cms.check(key))
  }

  def cmsCountMean(bytes: Array[Byte]): UserDefinedFunction = {
    lazy val cms = CountMinSketch.fromBytes(bytes, CmsQueryType.Mean)
    udf((key: String) => if (key == null) 0L else cms.check(key))
  }

  def cmsCountMeanMin(bytes: Array[Byte]): UserDefinedFunction = {
    lazy val cms = CountMinSketch.fromBytes(bytes, CmsQueryType.MeanMin)
    udf((key: String) => if (key == null) 0L else cms.check(key))
  }

  def cuckooContains(bytes: Array[Byte], fingerprintBits: Int): UserDefinedFunction = {
    lazy val cf = CuckooFilter.fromBytes(bytes, fingerprintBits = fingerprintBits)
    udf((key: String) => key != null && cf.check(key))
  }

  def qfContains(bytes: Array[Byte]): UserDefinedFunction = {
    lazy val qf = QuotientFilter.fromBytes(bytes)
    udf((key: String) => key != null && qf.check(key))
  }

  def ebfContains(bytes: Array[Byte]): UserDefinedFunction = {
    lazy val ebf = ExpandingBloomFilter.fromBytes(bytes)
    udf((key: String) => key != null && ebf.check(key))
  }

  // ---- sketch-column algebra (binary -> value / binary) ----

  val bfEstimate: UserDefinedFunction =
    udf((b: Array[Byte]) => BloomFilter.fromBytes(b).estimateElements)

  val bfCurrentFpr: UserDefinedFunction =
    udf((b: Array[Byte]) => BloomFilter.fromBytes(b).currentFalsePositiveRate)

  val bfUnion: UserDefinedFunction =
    udf((a: Array[Byte], b: Array[Byte]) =>
      BloomFilter.fromBytes(a).union(BloomFilter.fromBytes(b)).toBytes)

  val bfIntersect: UserDefinedFunction =
    udf((a: Array[Byte], b: Array[Byte]) =>
      BloomFilter.fromBytes(a).intersection(BloomFilter.fromBytes(b)).toBytes)

  val bfJaccard: UserDefinedFunction =
    udf((a: Array[Byte], b: Array[Byte]) =>
      BloomFilter.fromBytes(a).jaccardIndex(BloomFilter.fromBytes(b)))

  val cmsJoin: UserDefinedFunction =
    udf((a: Array[Byte], b: Array[Byte]) =>
      CountMinSketch.fromBytes(a).join(CountMinSketch.fromBytes(b)).toBytes)

  val hllEstimate: UserDefinedFunction =
    udf((b: Array[Byte]) => Hll.fromBytes(b).estimate)

  val hllMerge: UserDefinedFunction =
    udf((a: Array[Byte], b: Array[Byte]) => Hll.fromBytes(a).merge(Hll.fromBytes(b)).toBytes)

  /** KLL quantiles at the given ranks. */
  val kllQuantiles: UserDefinedFunction =
    udf((b: Array[Byte], qs: Seq[Double]) => {
      val k = Kll.fromBytes(b)
      qs.map(k.quantile)
    })

  val tdigestQuantiles: UserDefinedFunction =
    udf((b: Array[Byte], qs: Seq[Double]) => {
      val t = TDigest.fromBytes(b)
      qs.map(t.quantile)
    })

  val tdigestCdf: UserDefinedFunction =
    udf((b: Array[Byte], v: Double) => TDigest.fromBytes(b).cdf(v))

  /** The quotient filter's lossless hash enumeration (quotientfilter.py:208-245)
    * — the one generator/UDTF-shaped operator in the reference: sketch → rows.
    * Use with explode(): `df.select(explode(qfHashes($"qf")))`. */
  val qfHashes: UserDefinedFunction =
    udf((b: Array[Byte]) => QuotientFilter.fromBytes(b).hashes().toArray)

  /** Reference hash kernel as column functions (golden-vector parity with
    * hashes.py; see HashesSpec). */
  val fnv1a64: UserDefinedFunction =
    udf((s: String, seed: Int) => graft.hash.Fnv.fnv1a64(s, seed))

  val fnv1a32: UserDefinedFunction =
    udf((s: String, seed: Int) => graft.hash.Fnv.fnv1a32(s, seed) & 0xffffffffL)

  val fnv1a64Depth: UserDefinedFunction =
    udf((s: String, depth: Int) => graft.hash.Fnv1aHasher.hashes(s, depth))

  /** Register the scalar sketch functions for SQL use. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("bf_estimate", bfEstimate)
    spark.udf.register("bf_current_fpr", bfCurrentFpr)
    spark.udf.register("bf_union", bfUnion)
    spark.udf.register("bf_intersect", bfIntersect)
    spark.udf.register("bf_jaccard", bfJaccard)
    spark.udf.register("cms_join", cmsJoin)
    spark.udf.register("hll_estimate", hllEstimate)
    spark.udf.register("hll_merge", hllMerge)
    spark.udf.register("kll_quantiles", kllQuantiles)
    spark.udf.register("tdigest_quantiles", tdigestQuantiles)
    spark.udf.register("tdigest_cdf", tdigestCdf)
    spark.udf.register("qf_hashes", qfHashes)
    spark.udf.register("fnv1a64", fnv1a64)
    spark.udf.register("fnv1a32", fnv1a32)
    spark.udf.register("fnv1a64_depth", fnv1a64Depth)
  }
}
