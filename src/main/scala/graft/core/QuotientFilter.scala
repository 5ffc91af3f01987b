package graft.core

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable.ArrayBuffer

import graft.hash.Fnv

class QuotientFilterException(msg: String) extends ProbablesBaseException(msg)

/** Long-backed bitset with the same LSB-first-within-byte addressing as the
  * reference Bitarray (/root/reference/probables/utilities.py:88-229). */
final class LongBitset(val size: Int) extends Serializable {
  val words = new Array[Long]((size + 63) >>> 6)
  @inline def get(i: Int): Int = ((words(i >>> 6) >>> (i & 63)) & 1L).toInt
  @inline def set(i: Int, v: Int): Unit = {
    if (v == 1) words(i >>> 6) |= (1L << (i & 63))
    else words(i >>> 6) &= ~(1L << (i & 63))
  }
  def clearAll(): Unit = java.util.Arrays.fill(words, 0L)
}

/** Quotient filter (/root/reference/probables/quotientfilter/quotientfilter.py),
  * a faithful re-expression of its cluster/run machinery:
  *
  *   - 32-bit fnv-1a hash split into q high bits (slot) + r = 32-q remainder;
  *   - 3 metadata bits per slot (occupied / continuation / shifted) + the
  *     remainder array, remainders kept sorted within a run;
  *   - dedup on insert (quotientfilter.py:165), auto-resize to q+1 at load
  *     factor 0.85 (161-162, 64);
  *   - `hashes()` losslessly re-enumerates every stored 32-bit hash
  *     ((quotient << r) + remainder, quotientfilter.py:208-238) — this is the
  *     merge/resize/serialization primitive.
  *
  * The reference has no byte export; [[toBytes]] is this engine's documented
  * extension: (q:u32, autoExpand:u32, count:u32, hashes u32-LE...). Because QF
  * layout is canonical for a given hash set (ordered linear probing), rebuild
  * by re-adding hashes reproduces the exact structure.
  */
final class QuotientFilter(quotient: Int, var autoExpand: Boolean) extends Serializable {
  if (quotient < 3 || quotient > 31)
    throw new QuotientFilterException(
      s"Invalid quotient setting; quotient must be between 3 and 31; $quotient was provided")

  var q: Int = 0
  var r: Int = 0
  var size: Int = 0
  private var modSize: Int = 0
  var elementsAdded: Int = 0
  var maxLoadFactor: Double = 0.85
  var isOccupied: LongBitset = _
  var isContinuation: LongBitset = _
  var isShifted: LongBitset = _
  var filter: Array[Int] = _

  setParams(quotient)

  private def setParams(quot: Int): Unit = {
    q = quot
    r = 32 - quot
    size = 1 << q
    modSize = size - 1
    elementsAdded = 0
    isOccupied = new LongBitset(size)
    isContinuation = new LongBitset(size)
    isShifted = new LongBitset(size)
    filter = new Array[Int](size)
  }

  def bitsPerElm: Int = if (r <= 8) 8 else if (r <= 16) 16 else 32
  def loadFactor: Double = elementsAdded.toDouble / size.toDouble

  private def hash32(key: String): Long = Fnv.fnv1a32(key, 0) & 0xffffffffL

  def add(key: String): Unit = addHash(hash32(key))

  def addHash(h: Long): Unit = {
    if (autoExpand && loadFactor >= maxLoadFactor) resize(-1)
    val kq = (h >>> r).toInt
    val kr = (h & ((1L << r) - 1)).toInt
    if (containedAtLoc(kq, kr) == -1) addInternal(kq, kr)
  }

  def check(key: String): Boolean = checkHash(hash32(key))

  def checkHash(h: Long): Boolean = {
    val kq = (h >>> r).toInt
    val kr = (h & ((1L << r) - 1)).toInt
    containedAtLoc(kq, kr) != -1
  }

  def remove(key: String): Unit = removeHash(hash32(key))

  def removeHash(h: Long): Unit = {
    val kq = (h >>> r).toInt
    val kr = (h & ((1L << r) - 1)).toInt
    removeElement(kq, kr)
  }

  /** Enumerate all stored 32-bit hashes (quotientfilter.py:208-238). */
  def hashes(): ArrayBuffer[Long] = {
    val out = new ArrayBuffer[Long](elementsAdded)
    if (elementsAdded == 0) return out
    val queue = new ArrayBuffer[Int]()
    // bound the empty-slot search: a completely full filter (reachable with
    // autoExpand=false) has no empty slot — anchor at a CLUSTER START
    // instead (its first element is unshifted at its canonical slot, so a
    // non-empty filter always has one); starting mid-run would decode wrong
    // quotients. The reference's unbounded scan would run past the bitset;
    // the guard matters here because hashes() sits on the toBytes/shuffle
    // path.
    var start = 0
    while (start < size && !isEmptyElement(start)) start += 1
    if (start == size) {
      start = 0
      while (start < size && !isClusterStart(start)) start += 1
      if (start == size)
        throw new QuotientFilterException(
          "Unable to enumerate hashes: full filter with no cluster start (corrupt metadata)")
    }
    var curQuot = 0
    var i = start
    val end = size + start
    while (i < end) {
      val idx = i & modSize
      val occ = isOccupied.get(idx)
      val cont = isContinuation.get(idx)
      val shf = isShifted.get(idx)
      if (occ + cont + shf != 0) {
        if (occ == 1) queue += idx
        if (isRunStart(idx)) { curQuot = queue.remove(0) }
        out += ((curQuot.toLong << r) + (filter(idx) & 0xffffffffL))
      }
      i += 1
    }
    out
  }

  def resize(newQuotient: Int): Unit = {
    val quot = if (newQuotient < 0) q + 1 else newQuotient
    if (elementsAdded >= (1 << quot))
      throw new QuotientFilterException(
        "Unable to shrink since there will be too many elements in the quotient filter")
    if (quot < 3 || quot > 31)
      throw new QuotientFilterException(
        s"Invalid quotient setting; quotient must be between 3 and 31; $quot was provided")
    val hs = hashes()
    setParams(quot)
    hs.foreach(addHash)
  }

  def merge(second: QuotientFilter): Unit = second.hashes().foreach(addHash)

  /** Debug helper mirroring quotientfilter.py:520-538: check the metadata
    * bits for the one combination ordered linear probing can never produce —
    * a continuation slot that is not shifted (a run continuation always sits
    * at or past its canonical slot's successor). NOTE the reference's own
    * implementation compares the whole bitarray object to 1 (a Python bug
    * that makes it always pass); this implements the documented intent. */
  def validateMetadata(verbose: Boolean = false): Boolean = {
    var ok = true
    var i = 0
    while (i < size) {
      if (isContinuation.get(i) == 1 && isShifted.get(i) == 0) {
        if (verbose) println(s"Row failed: $i")
        ok = false
      }
      i += 1
    }
    ok
  }

  /** Debug dump of slot status (quotientfilter.py:509-518). */
  def printLayout(out: java.io.PrintStream = System.out): Unit = {
    out.println("idx\t--\tO-C-S\tStatus")
    out.println("----------------------------------------")
    var i = 0
    while (i < size) {
      val status =
        if (isEmptyElement(i)) "Empty"
        else if (isClusterStart(i)) "Cluster Start"
        else if (isRunStart(i)) "Run Start"
        else "Continuation"
      out.println(s"$i\t--\t${isOccupied.get(i)}-${isContinuation.get(i)}-${isShifted.get(i)}\t$status")
      i += 1
    }
  }

  // ---- internal cluster machinery (quotientfilter.py:291-508) ----

  private def isEmptyElement(i: Int): Boolean =
    isOccupied.get(i) + isContinuation.get(i) + isShifted.get(i) == 0

  private def isClusterStart(i: Int): Boolean =
    isOccupied.get(i) == 1 && isContinuation.get(i) == 0 && isShifted.get(i) == 0

  private def isRunStart(i: Int): Boolean =
    isContinuation.get(i) != 1 && (isOccupied.get(i) == 1 || isShifted.get(i) == 1)

  private def isRunOrClusterStart(i: Int): Boolean = isClusterStart(i) || isRunStart(i)

  private def getStartIndex(quotIdx: Int): Int = {
    if (isEmptyElement(quotIdx)) return quotIdx
    var j = quotIdx
    var cnts = 0
    var looping = true
    while (looping) {
      if (j == quotIdx || isOccupied.get(j) == 1) cnts += 1
      if (isShifted.get(j) == 1) j = (j - 1) & modSize
      else looping = false
    }
    looping = true
    while (looping) {
      if (isContinuation.get(j) == 0) {
        if (cnts == 1) return j
        cnts -= 1
      }
      j = (j + 1) & modSize
    }
    j
  }

  private def shiftInsert(kq: Int, kr: Int, origIdx: Int, insertIdx0: Int, flag: Int): Unit = {
    val insertIdx = insertIdx0
    if (isEmptyElement(insertIdx)) {
      filter(insertIdx) = kr
      isOccupied.set(kq, 1)
      isContinuation.set(insertIdx, if (insertIdx != origIdx) 1 else 0)
      isShifted.set(insertIdx, if (insertIdx != kq) 1 else 0)
    } else {
      var nextIdx = (insertIdx + 1) & modSize
      var break = false
      while (!break) {
        val wasEmpty = isEmptyElement(nextIdx)
        val temp = isContinuation.get(nextIdx)
        isContinuation.set(nextIdx, isContinuation.get(insertIdx))
        isContinuation.set(insertIdx, temp)
        isShifted.set(nextIdx, 1)
        val tf = filter(nextIdx)
        filter(nextIdx) = filter(insertIdx)
        filter(insertIdx) = tf
        if (wasEmpty) break = true
        else nextIdx = (nextIdx + 1) & modSize
      }
      filter(insertIdx) = kr
      isOccupied.set(kq, 1)
      isContinuation.set(insertIdx, if (insertIdx != origIdx) 1 else 0)
      isShifted.set(insertIdx, if (insertIdx != kq) 1 else 0)
      if (flag == 1) isContinuation.set((insertIdx + 1) & modSize, 1)
    }
  }

  private def addInternal(kq: Int, kr: Int): Unit = {
    if (size == elementsAdded)
      throw new QuotientFilterException("Unable to insert the element due to insufficient space")
    if (isEmptyElement(kq)) {
      filter(kq) = kr
      isOccupied.set(kq, 1)
    } else {
      var startIdx = getStartIndex(kq)
      if (isOccupied.get(kq) == 0) {
        shiftInsert(kq, kr, startIdx, startIdx, 0)
      } else {
        val origStartIdx = startIdx
        var starts = 0
        var f = isOccupied.get(startIdx) + isContinuation.get(startIdx) + isShifted.get(startIdx)
        while (starts == 0 && f != 0 && kr > filter(startIdx)) {
          startIdx = (startIdx + 1) & modSize
          if (isContinuation.get(startIdx) == 0) starts += 1
          f = isOccupied.get(startIdx) + isContinuation.get(startIdx) + isShifted.get(startIdx)
        }
        if (starts == 1) shiftInsert(kq, kr, origStartIdx, startIdx, 0)
        else shiftInsert(kq, kr, origStartIdx, startIdx, 1)
      }
    }
    elementsAdded += 1
  }

  private def containedAtLoc(kq: Int, kr: Int): Int = {
    if (isOccupied.get(kq) == 0) return -1
    var startIdx = getStartIndex(kq)
    var starts = 0
    while (!isEmptyElement(startIdx)) {
      if (isContinuation.get(startIdx) == 0) starts += 1
      if (starts == 2 || filter(startIdx) > kr) return -1
      if (filter(startIdx) == kr) return startIdx
      startIdx = (startIdx + 1) & modSize
    }
    -1
  }

  private def removeElement(kq: Int, kr: Int): Unit = {
    var idx = containedAtLoc(kq, kr)
    if (idx == -1) return
    var nextIdx = (idx + 1) & modSize
    val removeOrigIdx = isRunOrClusterStart(idx) && isContinuation.get(nextIdx) == 0
    if (isEmptyElement(nextIdx) || isClusterStart(nextIdx)) {
      filter(idx) = 0
      isOccupied.set(idx, 0)
      isContinuation.set(idx, 0)
      isShifted.set(idx, 0)
      if (removeOrigIdx) isOccupied.set(kq, 0)
      // NOTE: the reference never decrements elements_added on remove
      // (quotientfilter.py:396-414); replicated for parity.
      return
    }
    val minIdx = findClusterStart(idx)
    // first move (quotientfilter.py:433-440)
    if (isRunOrClusterStart(idx) && isContinuation.get(nextIdx) == 1) {
      filter(idx) = filter(nextIdx)
      isContinuation.set(idx, 0)
      isShifted.set(idx, isShifted.get(nextIdx))
      idx = nextIdx
      nextIdx = (idx + 1) & modSize
    }
    // shift elements (442-449)
    while (!isClusterStart(nextIdx) && !isEmptyElement(nextIdx)) {
      filter(idx) = filter(nextIdx)
      isContinuation.set(idx, isContinuation.get(nextIdx))
      isShifted.set(idx, isShifted.get(nextIdx))
      idx = nextIdx
      nextIdx = (idx + 1) & modSize
    }
    // clear last (451-455)
    filter(idx) = 0
    isContinuation.set(idx, 0)
    isShifted.set(idx, 0)
    isOccupied.set(idx, 0)
    if (removeOrigIdx) isOccupied.set(kq, 0)
    fixupCluster(minIdx, nextIdx)
  }

  private def findClusterStart(idx0: Int): Int = {
    var minIdx = idx0
    while (!isClusterStart(minIdx)) minIdx = (minIdx - 1) & modSize
    minIdx
  }

  private def fixupCluster(minIdx0: Int, nextIdx: Int): Unit = {
    var curQuot = -1
    var minIdx = minIdx0
    val queue = new ArrayBuffer[Int]()
    while (minIdx != nextIdx) {
      if (isOccupied.get(minIdx) == 1) queue += minIdx
      if (isRunStart(minIdx)) curQuot = queue.remove(0)
      if (curQuot == minIdx) {
        isContinuation.set(minIdx, 0)
        isShifted.set(minIdx, 0)
        isOccupied.set(minIdx, 1)
      }
      minIdx = (minIdx + 1) & modSize
    }
  }

  /** Engine extension codec: (q, autoExpand, count, hashes...). */
  def toBytes: Array[Byte] = {
    val hs = hashes()
    val bb = ByteBuffer.allocate(12 + hs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(q)
    bb.putInt(if (autoExpand) 1 else 0)
    bb.putInt(hs.length)
    hs.foreach(h => bb.putInt(h.toInt))
    bb.array()
  }
}

object QuotientFilter {
  def apply(quotient: Int = 20, autoExpand: Boolean = true): QuotientFilter =
    new QuotientFilter(quotient, autoExpand)

  def fromBytes(b: Array[Byte]): QuotientFilter = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val q = bb.getInt
    val auto = bb.getInt == 1
    val n = bb.getInt
    val qf = new QuotientFilter(q, auto)
    var i = 0
    while (i < n) { qf.addHash(bb.getInt & 0xffffffffL); i += 1 }
    qf
  }
}
