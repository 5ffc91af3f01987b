package graft.ext

import java.nio.{ByteBuffer, ByteOrder}

import graft.hash.Fnv

/** HyperLogLog (Flajolet et al. 2007) with the standard small-range linear
  * counting correction (the HLL++ dense path, Heule et al. 2013, without the
  * empirical bias tables — the linear-counting switch covers the same regime
  * within the tested tolerance). Not in the reference library; required by the
  * north rule (BASELINE.json) for distinct-url counting.
  *
  * The raw fnv-1a-64 hash is passed through a splitmix64 finalizer before
  * register indexing: fnv-1a's low bits have weak avalanche, and HLL needs
  * uniformly distributed bits. Standard error ≈ 1.04/sqrt(m).
  *
  * Merge = elementwise register max — associative, commutative, idempotent.
  */
final class Hll(val p: Int) extends Serializable {
  require(p >= 4 && p <= 18, s"HLL precision must be in [4,18]; got $p")
  val m: Int = 1 << p
  val registers: Array[Byte] = new Array[Byte](m)

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def add(key: String): Unit = addHash64(Fnv.fnv1a64(key, 0))
  def add(key: Long): Unit = addHash64(key)

  def addHash64(raw: Long): Unit = {
    val h = mix(raw)
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    val rho = (if (w == 0) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rho > registers(idx)) registers(idx) = rho.toByte
  }

  private def alpha: Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  def estimate: Long = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = registers(i) & 0xff
      sum += java.lang.Double.longBitsToDouble((1023L - r) << 52) // 2^-r
      if (r == 0) zeros += 1
      i += 1
    }
    val e = alpha * m.toDouble * m.toDouble / sum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else e
    math.round(corrected)
  }

  def merge(second: Hll): Hll = {
    require(p == second.p, s"HLL precision mismatch: $p vs ${second.p}")
    var i = 0
    while (i < m) {
      if ((second.registers(i) & 0xff) > (registers(i) & 0xff)) registers(i) = second.registers(i)
      i += 1
    }
    this
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + m).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(p)
    bb.put(registers)
    bb.array()
  }
}

object Hll {
  def apply(p: Int = 14): Hll = new Hll(p)

  def fromBytes(b: Array[Byte]): Hll = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val p = bb.getInt
    val h = new Hll(p)
    bb.get(h.registers)
    h
  }
}
