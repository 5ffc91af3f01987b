package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.hash._

/** Golden vectors from /root/reference/tests/hashes_test.py (also listed in
  * FIXTURES.md §3.1) — they pin the hash kernel that every sketch layout
  * depends on. Python's unsigned u64 literals map to the same Long bit
  * patterns via java.lang.Long.parseUnsignedLong.
  */
class HashesSpec extends AnyFunSuite {
  private def u(s: String): Long = java.lang.Long.parseUnsignedLong(s)

  test("fnv-1a 64 depth-5 golden vectors (hashes_test.py:27-46)") {
    val expected1 = Array(
      "4040040117721899264", "3916497180155386777", "468410530588793106",
      "13781401791305604595", "321382271269641900").map(u)
    assert(Fnv1aHasher.hashes("this is a test", 5).toSeq == expected1.toSeq)

    val expected2 = Array(
      "7925790280716546811", "13347851945403505568", "17775584719969392601",
      "10279404995231728046", "13802534855964835503").map(u)
    assert(Fnv1aHasher.hashes("this is also a test", 5).toSeq == expected2.toSeq)
  }

  test("fnv-1a 32 golden values (hashes_test.py:57-62)") {
    assert((Fnv.fnv1a32("this is a test", 0) & 0xffffffffL) == 2139996864L)
    assert((Fnv.fnv1a32("this is also a test", 0) & 0xffffffffL) == 1462718619L)
  }

  test("chained md5 depth-5 golden vectors (hashes_test.py:64-83)") {
    val expected = Array(
      "12174049463882854484", "10455450501617390806", "3838261292881602234",
      "12102952520950148619", "12126605867972429202").map(u)
    assert(Hashers.md5.hashes("this is a test", 5).toSeq == expected.toSeq)
  }

  test("chained sha256 depth-5 golden vectors (hashes_test.py:85-104)") {
    val expected = Array(
      "10244166640140130606", "5650905005272240665", "14215057275609328422",
      "5952353080197385534", "4990779931033217093").map(u)
    assert(Hashers.sha256.hashes("this is a test", 5).toSeq == expected.toSeq)
  }

  test("fnv collision pair diverges at depth > 0 (hashes_test.py:48-55)") {
    val a = Fnv1aHasher.hashes("gMPflVXtwGDXbIhP73TX", 5)
    val b = Fnv1aHasher.hashes("LtHf1prlU1bCeYZEdqWf", 5)
    assert(a(0) == b(0))
    (1 until 5).foreach(i => assert(a(i) != b(i)))
  }

  test("bytes keys hash identically to ASCII string keys (hashes_test.py:148-209)") {
    val s = "this is a test"
    val b = s.getBytes("UTF-8")
    assert(Fnv1aHasher.hashes(s, 5).toSeq == Fnv1aHasher.hashes(b, 5).toSeq)
    assert(Hashers.md5.hashes(s, 5).toSeq == Hashers.md5.hashes(b, 5).toSeq)
    assert(Fnv.fnv1a32(s, 0) == Fnv.fnv1a32(b, 0))
  }

  test("non-Latin-1 strings fold per codepoint, not per UTF-8 byte") {
    // Python ord('中') = 20013 — one fold step, unlike 3 UTF-8 bytes
    val cp = Fnv.fnv1a64("中", 0)
    var h = Fnv.Offset64
    h ^= 20013
    h *= Fnv.Prime64
    assert(cp == h)
    assert(cp != Fnv.fnv1a64("中".getBytes("UTF-8"), 0))
  }

  test("get_x_bits (test_utilities.py:39-60)") {
    // 2**64-1 = all ones
    assert(BitUtil.getXBits(-1L, 64, 32, rightBits = true) == 0xffffffffL)
    assert(BitUtil.getXBits(-1L, 64, 32, rightBits = false) == 0xffffffffL)
    assert(BitUtil.getXBits(0x0123456789abcdefL, 64, 8, rightBits = true) == 0xefL)
    assert(BitUtil.getXBits(0x0123456789abcdefL, 64, 8, rightBits = false) == 0x01L)
  }
}
