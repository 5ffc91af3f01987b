package graft.hash

import java.security.MessageDigest

/** FNV-1a hash kernel.
  *
  * Semantics match the reference hash kernel (/root/reference/probables/hashes.py)
  * exactly so that every sketch byte layout and golden test vector carries over:
  *
  *   - 64-bit fnv-1a with a seeded offset basis `14695981039346656037 + 31*seed`
  *     (mod 2^64) and prime `1099511628211` (hashes.py:86-103). JVM `Long`
  *     arithmetic wraps mod 2^64 natively, so no masking is needed.
  *   - Strings are folded **per Unicode code point** (Python `ord`, hashes.py:98),
  *     NOT per UTF-8 byte. For ASCII the two coincide; for non-Latin-1 they do not.
  *   - Byte inputs fold per (unsigned) byte.
  *   - 32-bit variant uses offset `0x811C9DC5 + 31*seed` and prime `0x01000193`
  *     (hashes.py:106-122); JVM `Int` wraps mod 2^32.
  */
object Fnv {
  final val Prime64 = 1099511628211L
  // 14695981039346656037 mod 2^64 as a signed Long
  final val Offset64 = -3750763034362895579L
  final val Prime32 = 0x01000193
  final val Offset32 = 0x811c9dc5

  def fnv1a64(key: String, seed: Int): Long = {
    var h = Offset64 + 31L * seed
    var i = 0
    val n = key.length
    while (i < n) {
      val cp = key.codePointAt(i)
      h ^= cp
      h *= Prime64
      i += Character.charCount(cp)
    }
    h
  }

  def fnv1a64(key: Array[Byte], seed: Int): Long = {
    var h = Offset64 + 31L * seed
    var i = 0
    while (i < key.length) {
      h ^= (key(i) & 0xff)
      h *= Prime64
      i += 1
    }
    h
  }

  /** 32-bit fnv-1a; the returned Int carries the u32 bit pattern. */
  def fnv1a32(key: String, seed: Int): Int = {
    var h = Offset32 + 31 * seed
    var i = 0
    val n = key.length
    while (i < n) {
      val cp = key.codePointAt(i)
      h ^= cp
      h *= Prime32
      i += Character.charCount(cp)
    }
    h
  }

  def fnv1a32(key: Array[Byte], seed: Int): Int = {
    var h = Offset32 + 31 * seed
    var i = 0
    while (i < key.length) {
      h ^= (key(i) & 0xff)
      h *= Prime32
      i += 1
    }
    h
  }
}

/** A multi-depth key hasher: `hashes(key, depth)` returns `depth` 64-bit hashes.
  * Mirrors the reference's `HashFuncT` contract (hashes.py:14). Implementations
  * must be deterministic and serializable (they ship inside Spark Aggregators).
  */
trait KeyHasher extends Serializable {
  def hashes(key: String, depth: Int): Array[Long]
  def hashes(key: Array[Byte], depth: Int): Array[Long]

  /** Stable identifier used for merge-compatibility guards (the Scala analogue
    * of the reference's `hashes("test") != second.hashes("test")` check,
    * countminsketch.py:376). */
  def name: String
}

/** Default hasher: independent-seed fnv-1a 64, seeds 0..depth-1
  * (reference `default_fnv_1a`, hashes.py:71-83). */
object Fnv1aHasher extends KeyHasher {
  override def hashes(key: String, depth: Int): Array[Long] = {
    val res = new Array[Long](depth)
    var i = 0
    while (i < depth) { res(i) = Fnv.fnv1a64(key, i); i += 1 }
    res
  }
  override def hashes(key: Array[Byte], depth: Int): Array[Long] = {
    val res = new Array[Long](depth)
    var i = 0
    while (i < depth) { res(i) = Fnv.fnv1a64(key, i); i += 1 }
    res
  }
  override def name: String = "fnv1a-64"
}

/** Chained-digest hasher (reference `hash_with_depth_bytes` decorator,
  * hashes.py:18-41): digest the key (strings are UTF-8 encoded first), take the
  * little-endian u64 of the first 8 digest bytes, then feed the whole digest
  * back in as the next round's input. `default_md5` / `default_sha256`
  * (hashes.py:125-150) are instances with algo = MD5 / SHA-256.
  */
final class ChainedDigestHasher(algo: String) extends KeyHasher {
  override def hashes(key: String, depth: Int): Array[Long] =
    hashes(key.getBytes(java.nio.charset.StandardCharsets.UTF_8), depth)

  override def hashes(key: Array[Byte], depth: Int): Array[Long] = {
    val md = MessageDigest.getInstance(algo)
    val res = new Array[Long](depth)
    var tmp = key
    var i = 0
    while (i < depth) {
      md.reset()
      tmp = md.digest(tmp)
      res(i) = leU64(tmp)
      i += 1
    }
    res
  }

  private def leU64(b: Array[Byte]): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(i) & 0xffL); i -= 1 }
    v
  }
  override def name: String = s"chained-$algo"
}

/** Hex-chain depth hasher (reference `hash_with_depth_int`, hashes.py:44-68):
  * depth 0 hashes the key; depth i>0 hashes the LOWERCASE HEX STRING of the
  * previous value (Python `f"{tmp:x}"` of an unsigned value ==
  * `java.lang.Long.toHexString`). Wraps any single-shot u64 hash.
  */
final class ChainedIntHasher(f: (String, Int) => Long, val name: String) extends KeyHasher {
  override def hashes(key: String, depth: Int): Array[Long] = {
    val res = new Array[Long](depth)
    var tmp = f(key, 0)
    res(0) = tmp
    var i = 1
    while (i < depth) {
      tmp = f(java.lang.Long.toHexString(tmp), i)
      res(i) = tmp
      i += 1
    }
    res
  }
  override def hashes(key: Array[Byte], depth: Int): Array[Long] =
    hashes(new String(key, java.nio.charset.StandardCharsets.UTF_8), depth)
}

object Hashers {
  val default: KeyHasher = Fnv1aHasher
  val md5: KeyHasher = new ChainedDigestHasher("MD5")
  val sha256: KeyHasher = new ChainedDigestHasher("SHA-256")

  def byName(n: String): KeyHasher = n match {
    case "fnv1a-64"           => Fnv1aHasher
    case "chained-MD5"        => md5
    case "chained-SHA-256"    => sha256
    case other                => throw new IllegalArgumentException(s"unknown hasher: $other")
  }
}

object BitUtil {
  /** Reference `get_x_bits` (utilities.py:32-36): the low (`rightBits=true`) or
    * high `numBits` of a `maxBits`-wide unsigned value. */
  def getXBits(num: Long, maxBits: Int, numBits: Int, rightBits: Boolean): Long = {
    val mask = if (numBits >= 64) -1L else (1L << numBits) - 1L
    if (rightBits) num & mask
    else mask & (num >>> (maxBits - numBits))
  }
}
