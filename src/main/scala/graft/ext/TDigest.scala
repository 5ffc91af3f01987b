package graft.ext

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable.ArrayBuffer

/** Merging t-digest (Dunning & Ertl, "Computing Extremely Accurate Quantiles
  * Using t-Digests"; see PAPERS.md). Array-backed, fully mergeable, no
  * per-add allocation beyond the staging buffer. Scale function k1:
  * k(q) = δ/(2π)·asin(2q−1), which bounds each centroid to k-size 1 and
  * concentrates resolution at the tails.
  *
  * Merge = concatenate centroid lists + recompress: associative within the
  * digest's rank-accuracy bound.
  */
final class TDigest(val compression: Double) extends Serializable {
  require(compression >= 20, s"t-digest compression must be >= 20; got $compression")

  // compressed centroids, sorted by mean
  var means: ArrayBuffer[Double] = new ArrayBuffer[Double]()
  var weights: ArrayBuffer[Double] = new ArrayBuffer[Double]()
  var totalWeight: Double = 0.0
  var min: Double = Double.PositiveInfinity
  var max: Double = Double.NegativeInfinity

  private val bufferSize = math.max(64, (5 * compression).toInt)
  private val bufMeans = new ArrayBuffer[Double](bufferSize)
  private val bufWeights = new ArrayBuffer[Double](bufferSize)

  def update(v: Double, w: Double = 1.0): Unit = {
    bufMeans += v
    bufWeights += w
    if (v < min) min = v
    if (v > max) max = v
    if (bufMeans.size >= bufferSize) compress()
  }

  private def kScale(q: Double): Double =
    compression / (2.0 * math.Pi) * math.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0)

  def compress(): Unit = {
    if (bufMeans.isEmpty) return
    // gather all centroids, sort by mean
    val allM = (means ++ bufMeans).toArray
    val allW = (weights ++ bufWeights).toArray
    bufMeans.clear(); bufWeights.clear()
    val order = allM.indices.sortBy(allM)
    val total = allW.sum
    totalWeight = total

    val outM = new ArrayBuffer[Double]()
    val outW = new ArrayBuffer[Double]()
    var curM = allM(order.head)
    var curW = allW(order.head)
    var wSoFar = 0.0
    var kLeft = kScale(0.0)
    var i = 1
    while (i < order.length) {
      val m = allM(order(i))
      val w = allW(order(i))
      val proposed = (wSoFar + curW + w) / total
      if (kScale(proposed) - kLeft <= 1.0) {
        // absorb into current centroid
        curM = curM + (m - curM) * w / (curW + w)
        curW += w
      } else {
        outM += curM; outW += curW
        wSoFar += curW
        kLeft = kScale(wSoFar / total)
        curM = m; curW = w
      }
      i += 1
    }
    outM += curM; outW += curW
    means = outM
    weights = outW
  }

  def merge(second: TDigest): TDigest = {
    require(compression == second.compression,
      s"t-digest compression mismatch: $compression vs ${second.compression}")
    second.compress()
    var i = 0
    while (i < second.means.size) {
      bufMeans += second.means(i)
      bufWeights += second.weights(i)
      if (bufMeans.size >= bufferSize) compress()
      i += 1
    }
    if (second.min < min) min = second.min
    if (second.max > max) max = second.max
    compress()
    this
  }

  def quantile(q: Double): Double = {
    compress()
    if (means.isEmpty) return Double.NaN
    if (means.size == 1) return means(0)
    val target = q * totalWeight
    var cum = 0.0
    var i = 0
    while (i < means.size) {
      val half = weights(i) / 2.0
      if (cum + half >= target) {
        if (i == 0) return math.max(min, means(0) - (means(1) - means(0)) / 2)
        // interpolate between centroid i-1 and i midpoints
        val prevMid = cum - weights(i - 1) / 2.0
        val frac = (target - prevMid) / (cum + half - prevMid)
        return means(i - 1) + (means(i) - means(i - 1)) * math.min(1.0, math.max(0.0, frac))
      }
      cum += weights(i)
      i += 1
    }
    max
  }

  /** CDF: estimated fraction of mass <= v. */
  def cdf(v: Double): Double = {
    compress()
    if (means.isEmpty) return Double.NaN
    if (v < min) return 0.0
    if (v >= max) return 1.0
    var cum = 0.0
    var i = 0
    while (i < means.size) {
      if (means(i) >= v) {
        if (i == 0) return 0.0
        val frac = (v - means(i - 1)) / (means(i) - means(i - 1))
        return (cum - weights(i - 1) / 2.0 + frac * (weights(i - 1) + weights(i)) / 2.0) / totalWeight
      }
      cum += weights(i)
      i += 1
    }
    1.0
  }

  def toBytes: Array[Byte] = {
    compress()
    val nc = means.size
    val bb = ByteBuffer.allocate(8 + 8 + 8 + 4 + nc * 16).order(ByteOrder.LITTLE_ENDIAN)
    bb.putDouble(compression)
    bb.putDouble(min)
    bb.putDouble(max)
    bb.putInt(nc)
    var i = 0
    while (i < nc) { bb.putDouble(means(i)); bb.putDouble(weights(i)); i += 1 }
    bb.array()
  }
}

object TDigest {
  def apply(compression: Double = 100.0): TDigest = new TDigest(compression)

  def fromBytes(b: Array[Byte]): TDigest = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val comp = bb.getDouble
    val mn = bb.getDouble
    val mx = bb.getDouble
    val nc = bb.getInt
    val td = new TDigest(comp)
    td.min = mn
    td.max = mx
    var i = 0
    var tw = 0.0
    while (i < nc) {
      td.means += bb.getDouble
      td.weights += bb.getDouble
      tw += td.weights(i)
      i += 1
    }
    td.totalWeight = tw
    td
  }
}
