package graft.core

import java.nio.{ByteBuffer, ByteOrder}

import graft.hash.{Fnv1aHasher, KeyHasher}

/** Counting Bloom filter: same (m,k) sizing as [[BloomFilter]] but one u32
  * counter per bit position (/root/reference/probables/blooms/countingbloom.py).
  * Cells are stored as `Array[Int]` carrying u32 bit patterns.
  *
  * Reference quirks replicated exactly:
  *   - `add` computes the projected values from the *pre-update* cells, then
  *     increments each index once per occurrence — a key whose k hashes collide
  *     on one cell increments it multiple times, while the returned min comes
  *     from the stale projections (countingbloom.py:143-155);
  *   - cells saturate at UINT32_MAX on add (149-153);
  *   - `remove` removes `min(num_els, min_val)` only from cells < UINT32_MAX
  *     (186-208);
  *   - `intersection` **sums** the counts where both cells are positive
  *     (235-238); `union` sums everywhere;
  *   - export layout: u32-LE cells + the same `QQf` footer as the plain Bloom.
  */
final class CountingBloomFilter private (
    val estElements: Long,
    val fpr: Float,
    val numHashes: Int,
    val numBits: Long, // == number of cells
    val cells: Array[Int],
    var elsAdded: Long,
    val hasher: KeyHasher
) extends Serializable {

  final val U32Max = 0xffffffffL

  def bloomLength: Int = cells.length

  def hashes(key: String): Array[Long] = hasher.hashes(key, numHashes)

  private def cellU(i: Int): Long = cells(i) & U32Max

  def add(key: String, numEls: Long = 1L): Long = addHashes(hashes(key), numEls)

  def addHashes(hs: Array[Long], numEls: Long = 1L): Long = {
    val n = numHashes
    val idxs = new Array[Int](n)
    val vals = new Array[Long](n)
    var i = 0
    while (i < n) {
      idxs(i) = java.lang.Long.remainderUnsigned(hs(i), numBits).toInt
      vals(i) = cellU(idxs(i)) + numEls
      i += 1
    }
    i = 0
    while (i < n) {
      val k = idxs(i)
      if (vals(i) > U32Max) {
        cells(k) = -1 // u32 max
        vals(i) = U32Max
      } else {
        val nv = cellU(k) + numEls
        cells(k) = (if (nv > U32Max) U32Max else nv).toInt
      }
      i += 1
    }
    elsAdded = math.min(saturatedAdd(elsAdded, numEls), Long.MaxValue)
    vals.min
  }

  private def saturatedAdd(a: Long, b: Long): Long = {
    val s = a + b
    if (((a ^ s) & (b ^ s)) < 0) Long.MaxValue else s
  }

  def check(key: String): Long = checkHashes(hashes(key))

  def checkHashes(hs: Array[Long]): Long = {
    var m = Long.MaxValue
    var i = 0
    while (i < numHashes) {
      val v = cellU(java.lang.Long.remainderUnsigned(hs(i), numBits).toInt)
      if (v < m) m = v
      i += 1
    }
    m
  }

  def remove(key: String, numEls: Long = 1L): Long = removeHashes(hashes(key), numEls)

  def removeHashes(hs: Array[Long], numEls: Long = 1L): Long = {
    val n = numHashes
    val idxs = new Array[Int](n)
    var minVal = Long.MaxValue
    var i = 0
    while (i < n) {
      idxs(i) = java.lang.Long.remainderUnsigned(hs(i), numBits).toInt
      val v = cellU(idxs(i))
      if (v < minVal) minVal = v
      i += 1
    }
    if (minVal == U32Max) return U32Max
    if (minVal == 0L) return 0L
    val toRemove = if (minVal > numEls) numEls else minVal
    i = 0
    while (i < n) {
      val k = idxs(i)
      if (cellU(k) < U32Max) cells(k) = (cellU(k) - toRemove).toInt
      i += 1
    }
    elsAdded -= toRemove
    minVal - toRemove
  }

  def clear(): Unit = { java.util.Arrays.fill(cells, 0); elsAdded = 0 }

  /** Cells > 0, the counting analogue of popcount (countingbloom.py:302-304). */
  def setCellsCount: Long = {
    var c = 0L; var i = 0
    while (i < cells.length) { if (cells(i) != 0) c += 1; i += 1 }
    c
  }

  def estimateElements: Long = BloomMath.estimateElements(setCellsCount, numBits, numHashes)

  def currentFalsePositiveRate: Double =
    BloomMath.currentFalsePositiveRate(elsAdded, numBits, numHashes)

  private def requireSimilar(second: CountingBloomFilter): Unit = {
    val ok = numHashes == second.numHashes && numBits == second.numBits &&
      hasher.name == second.hasher.name
    if (!ok)
      throw new SimilarityError(
        "Counting Bloom Filters are not similar enough to calculate similarity")
  }

  def union(second: CountingBloomFilter): CountingBloomFilter = {
    requireSimilar(second)
    val res = CountingBloomFilter.empty(estElements, fpr.toDouble, hasher)
    var i = 0
    while (i < cells.length) {
      val s = cellU(i) + second.cellU(i)
      res.cells(i) = (if (s > U32Max) U32Max else s).toInt
      i += 1
    }
    res.elsAdded = res.estimateElements
    res
  }

  /** In-place elementwise saturating sum — the distributed merge primitive. */
  def addInPlace(second: CountingBloomFilter): CountingBloomFilter = {
    requireSimilar(second)
    var i = 0
    while (i < cells.length) {
      val s = cellU(i) + second.cellU(i)
      cells(i) = (if (s > U32Max) U32Max else s).toInt
      i += 1
    }
    elsAdded = saturatedAdd(elsAdded, second.elsAdded)
    this
  }

  def intersection(second: CountingBloomFilter): CountingBloomFilter = {
    requireSimilar(second)
    val res = CountingBloomFilter.empty(estElements, fpr.toDouble, hasher)
    var i = 0
    while (i < cells.length) {
      if (cells(i) != 0 && second.cells(i) != 0) {
        val s = cellU(i) + second.cellU(i)
        res.cells(i) = (if (s > U32Max) U32Max else s).toInt
      }
      i += 1
    }
    res.elsAdded = res.estimateElements
    res
  }

  def jaccardIndex(second: CountingBloomFilter): Double = {
    requireSimilar(second)
    var cntUnion = 0L; var cntInt = 0L; var i = 0
    while (i < cells.length) {
      val a = cells(i) != 0
      val b = second.cells(i) != 0
      if (a || b) cntUnion += 1
      if (a && b) cntInt += 1
      i += 1
    }
    if (cntUnion == 0) 1.0 else cntInt.toDouble / cntUnion.toDouble
  }

  def exportSize: Int = cells.length * 4 + 20

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(exportSize).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < cells.length) { bb.putInt(cells(i)); i += 1 }
    bb.putLong(estElements)
    bb.putLong(elsAdded)
    bb.putFloat(fpr)
    bb.array()
  }

  def toHex: String = {
    val payload = ByteBuffer.allocate(cells.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < cells.length) { payload.putInt(cells(i)); i += 1 }
    val footer = ByteBuffer.allocate(20).order(ByteOrder.BIG_ENDIAN)
    footer.putLong(estElements)
    footer.putLong(elsAdded)
    footer.putFloat(fpr)
    Codec.hex(payload.array()) + Codec.hex(footer.array())
  }

  /** Reference `__str__` stats block (countingbloom.py:99-123) byte-for-byte:
    * "CountingBloom:" header, fullness in Python '.6' general format
    * ([[PyFmt.g6]]), max-usage cell with FIRST index on ties, and
    * `calculated elements` = total counts floor-divided by k. */
  override def toString: String = {
    // reference quirk (countingbloom.py:103): `cnt` SUMS the positive cell
    // VALUES (`sum(x for x in bloom if x > 0)`), it does not count cells —
    // so "index fullness" can exceed 1.0; kept verbatim
    var cnt = 0L; var total = 0L; var largest = 0L; var largestIdx = 0
    var i = 0
    while (i < cells.length) {
      val v = cellU(i)
      if (v > 0) cnt += v
      total += v
      if (v > largest) { largest = v; largestIdx = i }
      i += 1
    }
    val fullness = cnt.toDouble / numBits.toDouble
    val calcEls = total / numHashes
    // '\n' literals + Locale.ROOT decimals: the reference __str__ always
    // emits LF and '.' — f"...%n"/%f would follow platform/locale instead
    def f6(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))
    "CountingBloom:\n" +
      s"\tbits: $numBits\n" +
      s"\testimated elements: $estElements\n" +
      s"\tnumber hashes: $numHashes\n" +
      s"\tmax false positive rate: ${f6(fpr.toDouble)}\n" +
      s"\telements added: $elsAdded\n" +
      s"\tcurrent false positive rate: ${f6(currentFalsePositiveRate)}\n" +
      "\tis on disk: no\n" +
      s"\tindex fullness: ${PyFmt.g6(fullness)}\n" +
      s"\tmax index usage: $largest\n" +
      s"\tmax index id: $largestIdx\n" +
      s"\tcalculated elements: $calcEls\n"
  }
}

object CountingBloomFilter {
  def empty(estElements: Long, falsePositiveRate: Double, hasher: KeyHasher = Fnv1aHasher): CountingBloomFilter = {
    val p = BloomMath.optimizedParams(estElements, falsePositiveRate)
    // one u32 cell per bit position (countingbloom.py:77)
    new CountingBloomFilter(estElements, p.fpr, p.numHashes, p.numBits,
      new Array[Int](p.numBits.toInt), 0L, hasher)
  }

  def fromBytes(b: Array[Byte], hasher: KeyHasher = Fnv1aHasher): CountingBloomFilter = {
    val bb = ByteBuffer.wrap(b, b.length - 20, 20).order(ByteOrder.LITTLE_ENDIAN)
    val est = bb.getLong
    val added = bb.getLong
    val fpr = bb.getFloat
    val blm = empty(est, fpr.toDouble, hasher)
    val payload = ByteBuffer.wrap(b, 0, blm.cells.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < blm.cells.length) { blm.cells(i) = payload.getInt; i += 1 }
    blm.elsAdded = added
    blm
  }

  def fromHex(s: String, hasher: KeyHasher = Fnv1aHasher): CountingBloomFilter = {
    val all = Codec.unhex(s)
    val bb = ByteBuffer.wrap(all, all.length - 20, 20).order(ByteOrder.BIG_ENDIAN)
    val est = bb.getLong
    val added = bb.getLong
    val fpr = bb.getFloat
    val blm = empty(est, fpr.toDouble, hasher)
    val payload = ByteBuffer.wrap(all, 0, blm.cells.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < blm.cells.length) { blm.cells(i) = payload.getInt; i += 1 }
    blm.elsAdded = added
    blm
  }
}
