package graft.core

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable.ArrayBuffer

import graft.hash.{BitUtil, Fnv}

class CuckooFilterFullException(msg: String) extends ProbablesBaseException(msg)

/** Deterministic splitmix64 stream used for cuckoo kick randomness. The
  * reference uses Python's global `random` (cuckoo.py:373-377); its golden
  * exports are only deterministic because no kick fires at the pinned loads.
  * A seeded counter-based stream keeps the same no-kick byte layouts while
  * making kicks reproducible across partitions and reruns (SURVEY.md §7.7.2).
  */
final class SplitMix64(seed: Long) extends Serializable {
  private var state = seed
  def nextLong(): Long = {
    state += 0x9e3779b97f4a7c15L
    var z = state
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def nextInt(boundExclusive: Int): Int =
    java.lang.Long.remainderUnsigned(nextLong(), boundExclusive.toLong).toInt
  def nextBoolean(): Boolean = (nextLong() & 1L) == 1L
}

/** Cuckoo filter (/root/reference/probables/cuckoo/cuckoo.py).
  *
  * Layout notes (replicated):
  *   - fingerprint = **low** `fingerprintSizeBits` bits of fnv-1a-64(key)
  *     (cuckoo.py:492-506 via `get_x_bits(..., right_bits=True)`);
  *   - idx1 = fp % capacity; idx2 = fnv-1a-64(decimalString(fp)) % capacity —
  *     both indices derive from the fingerprint alone, which is what makes
  *     expansion (and our distributed merge) possible (cuckoo.py:483-490);
  *   - `add` is a no-op when the fingerprint is already present at either
  *     index (cuckoo.py:300-302) — near-set semantics;
  *   - export: each bin zero-padded to `bucketSize` u32-LE slots, footer
  *     `II` = (bucket_size, max_swaps); capacity is inferred from the file
  *     size on load (cuckoo.py:406-431).
  *
  * The reference has no merge; [[mergeFrom]] is the documented extension that
  * re-inserts every fingerprint of `second` (the same mechanism the
  * reference's own `_expand_logic` uses, cuckoo.py:455-481).
  */
final class CuckooFilter(
    var capacity: Int,
    val bucketSize: Int,
    val maxSwaps: Int,
    val expansionRate: Int,
    val autoExpand: Boolean,
    var fingerprintSizeBits: Int
) extends Serializable {
  if (capacity < 1 || bucketSize < 1 || maxSwaps < 1)
    throw new InitializationError(
      "CuckooFilter: capacity, bucket_size, and max_swaps must be an integer greater than 0")

  var buckets: Array[ArrayBuffer[Int]] = Array.fill(capacity)(new ArrayBuffer[Int](bucketSize))
  var insertedElements: Int = 0
  private val rng = new SplitMix64(0x5ca1ab1e5eedL)

  def elementsAdded: Int = insertedElements
  def loadFactor: Double = insertedElements.toDouble / (capacity.toDouble * bucketSize)
  def errorRate: Double =
    1.0 / math.pow(2.0, fingerprintSizeBits - (math.log(bucketSize.toDouble) / math.log(2.0) + 1))

  protected def hash64(key: String): Long = Fnv.fnv1a64(key, 0)

  def fingerprintInfo(key: String): (Int, Int, Int) = {
    val h = hash64(key)
    val fp = BitUtil.getXBits(h, 64, fingerprintSizeBits, rightBits = true)
    val (i1, i2) = indicesFromFingerprint(fp.toInt)
    (i1, i2, fp.toInt)
  }

  def indicesFromFingerprint(fp: Int): (Int, Int) = {
    val fpU = fp & 0xffffffffL
    val i1 = (fpU % capacity).toInt
    val i2 = java.lang.Long.remainderUnsigned(
      Fnv.fnv1a64(java.lang.Long.toString(fpU), 0), capacity.toLong).toInt
    (i1, i2)
  }

  def add(key: String): Unit = {
    val (i1, i2, fp) = fingerprintInfo(key)
    if (checkIfPresent(i1, i2, fp) >= 0) return // dedup (cuckoo.py:300-302)
    val homeless = insertFingerprint(fp, i1, i2)
    dealWithInsertion(homeless)
  }

  /** Add a bare fingerprint if absent — the merge/expansion primitive. */
  def addFingerprint(fp: Int): Unit = {
    val (i1, i2) = indicesFromFingerprint(fp)
    if (checkIfPresent(i1, i2, fp) >= 0) return
    val homeless = insertFingerprint(fp, i1, i2)
    dealWithInsertion(homeless)
  }

  def check(key: String): Boolean = {
    val (i1, i2, fp) = fingerprintInfo(key)
    checkIfPresent(i1, i2, fp) >= 0
  }

  def remove(key: String): Boolean = {
    val (i1, i2, fp) = fingerprintInfo(key)
    val idx = checkIfPresent(i1, i2, fp)
    if (idx < 0) return false
    buckets(idx).remove(buckets(idx).indexOf(fp))
    insertedElements -= 1
    true
  }

  private def checkIfPresent(i1: Int, i2: Int, fp: Int): Int =
    if (buckets(i1).contains(fp)) i1
    else if (buckets(i2).contains(fp)) i2
    else -1

  private def insertElement(fp: Int, idx: Int): Boolean = {
    if (buckets(idx).size < bucketSize) { buckets(idx) += fp; true } else false
  }

  /** Kick loop (cuckoo.py:361-392); returns Int.MinValue on success or the
    * homeless fingerprint. */
  private def insertFingerprint(fp0: Int, i1: Int, i2: Int): Int = {
    if (insertElement(fp0, i1)) { insertedElements += 1; return Int.MinValue }
    if (insertElement(fp0, i2)) { insertedElements += 1; return Int.MinValue }
    var fp = fp0
    var idx = if (rng.nextBoolean()) i1 else i2
    var swaps = 0
    while (swaps < maxSwaps) {
      val swapElm = rng.nextInt(bucketSize)
      val swb = buckets(idx)(swapElm)
      buckets(idx)(swapElm) = fp
      fp = swb
      val (n1, n2) = indicesFromFingerprint(fp)
      idx = if (idx == n1) n2 else n1
      if (insertElement(fp, idx)) { insertedElements += 1; return Int.MinValue }
      swaps += 1
    }
    fp
  }

  private def dealWithInsertion(homeless: Int): Unit = {
    if (homeless == Int.MinValue) return
    if (autoExpand) expandLogic(homeless)
    else throw new CuckooFilterFullException("The CuckooFilter is currently full")
  }

  def expand(): Unit = expandLogic(Int.MinValue)

  private def expandLogic(extra: Int): Unit = {
    val fps = new ArrayBuffer[Int]()
    if (extra != Int.MinValue) fps += extra
    var i = 0
    while (i < capacity) { fps ++= buckets(i); i += 1 }
    capacity = capacity * expansionRate
    buckets = Array.fill(capacity)(new ArrayBuffer[Int](bucketSize))
    insertedElements = 0
    fps.foreach { fp =>
      val (i1, i2) = indicesFromFingerprint(fp)
      if (insertFingerprint(fp, i1, i2) != Int.MinValue)
        throw new CuckooFilterFullException("The CuckooFilter failed to expand")
    }
  }

  /** Distributed-merge extension: re-insert every fingerprint of `second`. */
  def mergeFrom(second: CuckooFilter): CuckooFilter = {
    require(bucketSize == second.bucketSize && fingerprintSizeBits == second.fingerprintSizeBits,
      "CuckooFilter merge: bucket size / fingerprint bits mismatch")
    second.buckets.foreach(_.foreach(addFingerprint))
    this
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(capacity * bucketSize * 4 + 8).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < capacity) {
      val b = buckets(i)
      var j = 0
      while (j < bucketSize) {
        bb.putInt(if (j < b.size) b(j) else 0)
        j += 1
      }
      i += 1
    }
    bb.putInt(bucketSize)
    bb.putInt(maxSwaps)
    bb.array()
  }
}

object CuckooFilter {
  def apply(capacity: Int = 10000, bucketSize: Int = 4, maxSwaps: Int = 500,
            expansionRate: Int = 2, autoExpand: Boolean = true,
            fingerSizeBytes: Int = 4): CuckooFilter = {
    require(fingerSizeBytes >= 1 && fingerSizeBytes <= 4,
      "CuckooFilter: fingerprint size must be between 1 and 4")
    new CuckooFilter(capacity, bucketSize, maxSwaps, expansionRate, autoExpand, fingerSizeBytes * 8)
  }

  /** Fingerprint bits from target error rate:
    * `ceil(log2(1/ε) + log2(b) + 1)` (cuckoo.py:522-524). */
  def fingerprintBitsFor(errorRate: Double, bucketSize: Int): Int =
    math.ceil(math.log(1.0 / errorRate) / math.log(2.0) +
      math.log(bucketSize.toDouble) / math.log(2.0) + 1).toInt

  def withErrorRate(errorRate: Double, capacity: Int = 10000, bucketSize: Int = 4,
                    maxSwaps: Int = 500, expansionRate: Int = 2,
                    autoExpand: Boolean = true): CuckooFilter =
    new CuckooFilter(capacity, bucketSize, maxSwaps, expansionRate, autoExpand,
      fingerprintBitsFor(errorRate, bucketSize))

  def fromBytes(b: Array[Byte], expansionRate: Int = 2, autoExpand: Boolean = true,
                fingerprintBits: Int = 32): CuckooFilter = {
    val bb = ByteBuffer.wrap(b, b.length - 8, 8).order(ByteOrder.LITTLE_ENDIAN)
    val bucketSize = bb.getInt
    val maxSwaps = bb.getInt
    val capacity = (b.length - 8) / 4 / bucketSize
    val cf = new CuckooFilter(capacity, bucketSize, maxSwaps, expansionRate, autoExpand, fingerprintBits)
    val payload = ByteBuffer.wrap(b, 0, capacity * bucketSize * 4).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < capacity) {
      var j = 0
      while (j < bucketSize) {
        val fp = payload.getInt
        if (fp != 0) { cf.buckets(i) += fp; cf.insertedElements += 1 }
        j += 1
      }
      i += 1
    }
    cf
  }
}

/** Counting cuckoo filter (/root/reference/probables/cuckoo/countingcuckoo.py):
  * bins are (fingerprint, count) u32 pairs; a re-add of a present fingerprint
  * increments its count. Bins are packed as a Long (fp in the high 32 bits,
  * count in the low 32). Export: (fp,count) pairs zero-padded per bin + `II`
  * footer, matching countingcuckoo.py:216-228, 325-334. */
final class CountingCuckooFilter(
    var capacity: Int,
    val bucketSize: Int,
    val maxSwaps: Int,
    val expansionRate: Int,
    val autoExpand: Boolean,
    var fingerprintSizeBits: Int
) extends Serializable {

  // each bin: packed (fp:u32 << 32) | count:u32
  var buckets: Array[ArrayBuffer[Long]] = Array.fill(capacity)(new ArrayBuffer[Long](bucketSize))
  var insertedElements: Long = 0
  var uniqueElements: Int = 0
  private val rng = new SplitMix64(0xc01dc0ffeeL)

  @inline private def packed(fp: Int, count: Long): Long = ((fp & 0xffffffffL) << 32) | (count & 0xffffffffL)
  @inline private def fpOf(bin: Long): Int = (bin >>> 32).toInt
  @inline private def countOf(bin: Long): Long = bin & 0xffffffffL

  def loadFactor: Double = uniqueElements.toDouble / (capacity.toDouble * bucketSize)

  def fingerprintInfo(key: String): (Int, Int, Int) = {
    val h = Fnv.fnv1a64(key, 0)
    val fp = BitUtil.getXBits(h, 64, fingerprintSizeBits, rightBits = true).toInt
    val (i1, i2) = indicesFromFingerprint(fp)
    (i1, i2, fp)
  }

  def indicesFromFingerprint(fp: Int): (Int, Int) = {
    val fpU = fp & 0xffffffffL
    val i1 = (fpU % capacity).toInt
    val i2 = java.lang.Long.remainderUnsigned(
      Fnv.fnv1a64(java.lang.Long.toString(fpU), 0), capacity.toLong).toInt
    (i1, i2)
  }

  private def findBin(idx: Int, fp: Int): Int = {
    var i = 0
    while (i < buckets(idx).size) {
      if (fpOf(buckets(idx)(i)) == fp) return i
      i += 1
    }
    -1
  }

  private def checkIfPresent(i1: Int, i2: Int, fp: Int): Int =
    if (findBin(i1, fp) >= 0) i1
    else if (findBin(i2, fp) >= 0) i2
    else -1

  def add(key: String): Unit = addCount(key, 1L)

  def addCount(key: String, n: Long): Unit = {
    val (i1, i2, fp) = fingerprintInfo(key)
    var remaining = n
    while (remaining > 0) { // reference semantics are per-single-add
      val present = checkIfPresent(i1, i2, fp)
      if (present >= 0) {
        val bi = findBin(present, fp)
        buckets(present)(bi) = packed(fp, countOf(buckets(present)(bi)) + 1)
        insertedElements += 1
      } else {
        val homeless = insertFingerprint(fp, i1, i2, 1L)
        dealWithInsertion(homeless)
      }
      remaining -= 1
    }
  }

  /** Merge primitive: add `count` occurrences of a bare fingerprint at once. */
  def addFingerprintCount(fp: Int, count: Long): Unit = {
    val (i1, i2) = indicesFromFingerprint(fp)
    val present = checkIfPresent(i1, i2, fp)
    if (present >= 0) {
      val bi = findBin(present, fp)
      val merged = math.min(countOf(buckets(present)(bi)) + count, 0xffffffffL)
      buckets(present)(bi) = packed(fp, merged)
      insertedElements += count
    } else {
      val homeless = insertFingerprint(fp, i1, i2, count)
      dealWithInsertion(homeless)
    }
  }

  def check(key: String): Long = {
    val (i1, i2, fp) = fingerprintInfo(key)
    val present = checkIfPresent(i1, i2, fp)
    if (present < 0) 0L else countOf(buckets(present)(findBin(present, fp)))
  }

  def remove(key: String): Boolean = {
    val (i1, i2, fp) = fingerprintInfo(key)
    val idx = checkIfPresent(i1, i2, fp)
    if (idx < 0) return false
    val bi = findBin(idx, fp)
    val c = countOf(buckets(idx)(bi)) - 1
    insertedElements -= 1
    if (c == 0) { buckets(idx).remove(bi); uniqueElements -= 1 }
    else buckets(idx)(bi) = packed(fp, c)
    true
  }

  private def insertElement(fp: Int, idx: Int, count: Long): Boolean = {
    if (buckets(idx).size < bucketSize) { buckets(idx) += packed(fp, count); true } else false
  }

  /** Kick loop carrying (fp,count) bins (countingcuckoo.py:230-265); returns
    * -1 on success, else the homeless packed bin. */
  private def insertFingerprint(fp0: Int, i1: Int, i2: Int, count: Long): Long = {
    if (insertElement(fp0, i1, count)) { insertedElements += count; uniqueElements += 1; return -1L }
    if (insertElement(fp0, i2, count)) { insertedElements += count; uniqueElements += 1; return -1L }
    var prv = packed(fp0, count)
    var idx = if (rng.nextBoolean()) i1 else i2
    var swaps = 0
    while (swaps < maxSwaps) {
      val swapElm = rng.nextInt(bucketSize)
      val swapped = buckets(idx)(swapElm)
      buckets(idx)(swapElm) = prv
      prv = swapped
      val (n1, n2) = indicesFromFingerprint(fpOf(prv))
      idx = if (idx == n1) n2 else n1
      if (buckets(idx).size < bucketSize) {
        buckets(idx) += prv
        // charge the NEW element's count, not the relocated bin's — prv's
        // count was already charged when prv was first inserted; the
        // reference does `_inserted_elements += 1` here for the add call
        // (countingcuckoo.py:259-262), which for count==1 is the same thing.
        // DELIBERATE divergence for count > 1 (reachable only via
        // [[addFingerprintCount]] — the reference-absent merge extension —
        // and via expansion re-inserts): the reference's kick loop seeds
        // `CountingCuckooBin(fingerprint, 1)` (countingcuckoo.py:248), so a
        // multi-count newcomer that kicks LOSES count-1 occurrences and
        // charges +1; the engine keeps the full count in the relocated bin
        // (`prv = packed(fp0, count)` above) and charges `count`, because
        // the distributed merge depends on elements_added staying the total
        // occurrence count (same rationale as the expandLogic divergence
        // below; CuckooSpec pins the engine behavior).
        insertedElements += count
        uniqueElements += 1
        return -1L
      }
      swaps += 1
    }
    prv
  }

  private def dealWithInsertion(homeless: Long): Unit = {
    if (homeless == -1L) return
    if (autoExpand) expandLogic(homeless)
    else throw new CuckooFilterFullException("The CountingCuckooFilter is currently full")
  }

  def expand(): Unit = expandLogic(-1L)

  /** DELIBERATE divergence from the reference here: countingcuckoo.py's
    * `_expand_logic` resets `_inserted_elements` (via `_setup_expand`) and
    * then re-adds +1 per relocated BIN, so a reference filter holding
    * multi-count bins comes out of an expansion with `elements_added` ==
    * number of unique bins — the count-sum is silently lost. The engine
    * preserves the count-sum across expansion (`+= count` per re-inserted
    * bin after the reset) because the distributed merge extension
    * ([[mergeFrom]]/[[addFingerprintCount]]) depends on `elements_added`
    * staying the total occurrence count. Kick-path and add-path counting
    * match the reference exactly (q_export_parity / q_sketch_removes). */
  private def expandLogic(extra: Long): Unit = {
    val bins = new ArrayBuffer[Long]()
    if (extra != -1L) bins += extra
    buckets.foreach(bins ++= _)
    capacity = capacity * expansionRate
    buckets = Array.fill(capacity)(new ArrayBuffer[Long](bucketSize))
    insertedElements = 0
    uniqueElements = 0
    bins.foreach { bin =>
      val (i1, i2) = indicesFromFingerprint(fpOf(bin))
      if (insertFingerprint(fpOf(bin), i1, i2, countOf(bin)) != -1L)
        throw new CuckooFilterFullException("The CountingCuckooFilter failed to expand")
    }
  }

  def mergeFrom(second: CountingCuckooFilter): CountingCuckooFilter = {
    require(bucketSize == second.bucketSize && fingerprintSizeBits == second.fingerprintSizeBits,
      "CountingCuckooFilter merge: bucket size / fingerprint bits mismatch")
    second.buckets.foreach(_.foreach(bin => addFingerprintCount(fpOf(bin), countOf(bin))))
    this
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(capacity * bucketSize * 8 + 8).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < capacity) {
      val b = buckets(i)
      var j = 0
      while (j < bucketSize) {
        if (j < b.size) { bb.putInt(fpOf(b(j))); bb.putInt(countOf(b(j)).toInt) }
        else { bb.putInt(0); bb.putInt(0) }
        j += 1
      }
      i += 1
    }
    bb.putInt(bucketSize)
    bb.putInt(maxSwaps)
    bb.array()
  }
}

object CountingCuckooFilter {
  def apply(capacity: Int = 10000, bucketSize: Int = 4, maxSwaps: Int = 500,
            expansionRate: Int = 2, autoExpand: Boolean = true,
            fingerSizeBytes: Int = 4): CountingCuckooFilter =
    new CountingCuckooFilter(capacity, bucketSize, maxSwaps, expansionRate, autoExpand, fingerSizeBytes * 8)

  def withErrorRate(errorRate: Double, capacity: Int = 10000, bucketSize: Int = 4,
                    maxSwaps: Int = 500, expansionRate: Int = 2,
                    autoExpand: Boolean = true): CountingCuckooFilter =
    new CountingCuckooFilter(capacity, bucketSize, maxSwaps, expansionRate, autoExpand,
      CuckooFilter.fingerprintBitsFor(errorRate, bucketSize))

  def fromBytes(b: Array[Byte], expansionRate: Int = 2, autoExpand: Boolean = true,
                fingerprintBits: Int = 32): CountingCuckooFilter = {
    val bb = ByteBuffer.wrap(b, b.length - 8, 8).order(ByteOrder.LITTLE_ENDIAN)
    val bucketSize = bb.getInt
    val maxSwaps = bb.getInt
    val capacity = (b.length - 8) / 8 / bucketSize
    val cf = new CountingCuckooFilter(capacity, bucketSize, maxSwaps, expansionRate, autoExpand, fingerprintBits)
    val payload = ByteBuffer.wrap(b, 0, capacity * bucketSize * 8).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < capacity) {
      var j = 0
      while (j < bucketSize) {
        val fp = payload.getInt
        val count = payload.getInt & 0xffffffffL
        if (fp != 0) {
          cf.buckets(i) += (((fp & 0xffffffffL) << 32) | count)
          cf.insertedElements += count
          cf.uniqueElements += 1
        }
        j += 1
      }
      i += 1
    }
    cf
  }
}
