package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core._

object TestUtil {
  def md5hex(b: Array[Byte]): String =
    Codec.hex(java.security.MessageDigest.getInstance("MD5").digest(b))
}

/** Golden values from /root/reference/tests/bloom_test.py (FIXTURES.md §3). */
class BloomSpec extends AnyFunSuite {
  import TestUtil._

  test("optimized params (10, 0.05): float32 fpr, k=4, m=63, 8 bytes (bloom_test.py:27-36)") {
    val b = BloomFilter.empty(10, 0.05)
    assert(b.fpr.toDouble == 0.05000000074505806)
    assert(b.numHashes == 4)
    assert(b.numBits == 63)
    assert(b.bloomLength == 8)
  }

  test("C-logl sizing compat: n=16e6, p=0.001 (bloom_test.py:134-140)") {
    val b = BloomFilter.empty(16000000L, 0.001)
    assert(b.numBits == 230041400L)
    assert(b.bloomLength == 28755175)
  }

  test("hex export golden (bloom_test.py:256-265)") {
    val b = BloomFilter.empty(10, 0.05)
    (0 until 10).foreach(i => b.add(s"this is a test $i"))
    assert(b.toHex == "6da491461a6bba4d000000000000000a000000000000000a3d4ccccd")
  }

  test("bytes export md5 golden (bloom_test.py:323-341)") {
    val b = BloomFilter.empty(10, 0.05)
    b.add("this is a test")
    assert(md5hex(b.toBytes) == "8d27e30e1c5875b0edcf7413c7bdb221")
  }

  test("membership: no false negatives, check/add round trip") {
    val b = BloomFilter.empty(10, 0.05)
    (0 until 10).foreach(i => b.add(s"this is a test $i"))
    (0 until 10).foreach(i => assert(b.check(s"this is a test $i")))
    assert(b.elsAdded == 10)
  }

  test("fromBytes / fromHex round trip") {
    val b = BloomFilter.empty(10, 0.05)
    (0 until 10).foreach(i => b.add(s"this is a test $i"))
    val b2 = BloomFilter.fromBytes(b.toBytes)
    assert(b2.toBytes.toSeq == b.toBytes.toSeq)
    assert(b2.elsAdded == 10)
    val b3 = BloomFilter.fromHex(b.toHex)
    assert(b3.toHex == b.toHex)
    (0 until 10).foreach(i => assert(b2.check(s"this is a test $i")))
  }

  test("union / intersection / jaccard (bloom_test.py:76-161)") {
    val b1 = BloomFilter.empty(100, 0.05)
    val b2 = BloomFilter.empty(100, 0.05)
    (0 until 10).foreach(i => b1.add(s"key-$i"))
    (5 until 15).foreach(i => b2.add(s"key-$i"))
    val u = b1.union(b2)
    (0 until 15).foreach(i => assert(u.check(s"key-$i")))
    val in = b1.intersection(b2)
    (5 until 10).foreach(i => assert(in.check(s"key-$i")))
    val j = b1.jaccardIndex(b2)
    assert(j > 0.1 && j < 0.75)
    // estimates in a plausible band
    assert(math.abs(u.estimateElements - 15) <= 2)
    assert(math.abs(in.estimateElements - 5) <= 2)
  }

  test("estimate −1 when all bits set (bloom_test.py:371-377)") {
    val b = BloomFilter.empty(10, 0.05)
    java.util.Arrays.fill(b.bloom, 0xff.toByte)
    assert(b.estimateElements == -1)
  }

  test("current false positive rate formula (bloom_test.py:233-254)") {
    val b = BloomFilter.empty(10, 0.05)
    (0 until 10).foreach(i => b.add(s"this is a test $i"))
    assert(math.abs(b.currentFalsePositiveRate - 0.048806) < 1e-5)
  }

  test("orInPlace merge is associative and commutative on bytes") {
    def mk(r: Range): BloomFilter = {
      val b = BloomFilter.empty(1000, 0.01)
      r.foreach(i => b.add(s"u$i"))
      b
    }
    val abc1 = mk(0 until 100).orInPlace(mk(100 until 200).orInPlace(mk(200 until 300)))
    val abc2 = mk(0 until 100).orInPlace(mk(100 until 200)).orInPlace(mk(200 until 300))
    val abc3 = mk(200 until 300).orInPlace(mk(0 until 100)).orInPlace(mk(100 until 200))
    assert(abc1.toBytes.toSeq == abc2.toBytes.toSeq)
    assert(abc1.toBytes.toSeq == abc3.toBytes.toSeq)
  }

  test("empty-filter FPR bound holds on absent probes") {
    val b = BloomFilter.empty(10000, 0.01)
    (0 until 10000).foreach(i => b.add(s"present-$i"))
    var fp = 0
    val probes = 20000
    (0 until probes).foreach(i => if (b.check(s"absent-$i")) fp += 1)
    assert(fp.toDouble / probes < 0.02, s"FPR ${fp.toDouble / probes} above 2x bound")
  }
}

class CountingBloomSpec extends AnyFunSuite {
  import TestUtil._

  test("export md5 golden with duplicate adds (countingbloom_test.py:106-144)") {
    val b = CountingBloomFilter.empty(10, 0.01)
    Seq("test", "out", "the", "counting", "bloom", "filter",
        "test", "Test", "out", "test").foreach(w => b.add(w))
    assert(md5hex(b.toBytes) == "0b83c837da30e25f768f0527c039d341")
  }

  test("export size 404 bytes for (10, 0.01) (countingbloom_test.py:305-308)") {
    val b = CountingBloomFilter.empty(10, 0.01)
    assert(b.exportSize == 404)
  }

  test("hex export golden (countingbloom_test.py:200-222)") {
    val expected =
      "01000000000000000100000002000000000000000100000001000000" +
      "00000000000000000000000001000000000000000000000002000000" +
      "00000000010000000200000000000000000000000000000001000000" +
      "00000000000000000200000000000000010000000200000000000000" +
      "00000000000000000100000000000000000000000100000000000000" +
      "01000000020000000000000000000000000000000100000001000000" +
      "00000000010000000000000001000000020000000000000000000000" +
      "01000000000000000100000001000000010000000000000001000000" +
      "03000000000000000100000001000000000000000000000001000000" +
      "000000000000000a000000000000000a3d4ccccd"
    val b = CountingBloomFilter.empty(10, 0.05)
    (0 until 10).foreach(i => b.add(s"this is a test $i"))
    assert(b.toHex == expected)
  }

  test("add returns min count; remove decrements (countingbloom.py:125-208)") {
    val b = CountingBloomFilter.empty(100, 0.05)
    assert(b.add("k") == 1)
    assert(b.add("k") == 2)
    assert(b.check("k") == 2)
    assert(b.remove("k") == 1)
    assert(b.check("k") == 1)
    assert(b.remove("k") == 0)
    assert(b.remove("k") == 0) // removing at zero is a no-op
  }

  test("union sums counts; intersection sums where both positive") {
    val a = CountingBloomFilter.empty(100, 0.05)
    val b = CountingBloomFilter.empty(100, 0.05)
    a.add("x", 3); a.add("y", 2)
    b.add("x", 4); b.add("z", 7)
    val u = a.union(b)
    assert(u.check("x") == 7)
    val i = a.intersection(b)
    assert(i.check("x") == 7) // reference sums in intersection too (countingbloom.py:235-238)
    assert(i.check("z") == 0)
  }

  test("bytes round trip") {
    val b = CountingBloomFilter.empty(10, 0.05)
    (0 until 10).foreach(i => b.add(s"this is a test $i"))
    val b2 = CountingBloomFilter.fromBytes(b.toBytes)
    assert(b2.toBytes.toSeq == b.toBytes.toSeq)
    val b3 = CountingBloomFilter.fromHex(b.toHex)
    assert(b3.toHex == b.toHex)
  }
}
