package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Error-surface parity: same hierarchy shape and exact messages the
  * reference's tests pin (exceptions.py; tests/bloom_test.py:384-473,
  * tests/countminsketch_test.py:379-433). */
class ExceptionsSpec extends AnyFunSuite {
  test("initialization errors carry the reference messages") {
    val e1 = intercept[InitializationError](BloomFilter.empty(0, 0.05))
    assert(e1.message == "Bloom: estimated elements must be greater than 0")
    val e2 = intercept[InitializationError](BloomFilter.empty(10, 1.5))
    assert(e2.message == "Bloom: false positive rate must be between 0.0 and 1.0")
    val e3 = intercept[InitializationError](CountMinSketch.empty(0, 5))
    assert(e3.message == "CountMinSketch: width and depth must be greater than 0")
    val e4 = intercept[InitializationError](CuckooFilter(capacity = 0))
    assert(e4.message ==
      "CuckooFilter: capacity, bucket_size, and max_swaps must be an integer greater than 0")
  }

  test("similarity / merge errors carry the reference messages") {
    val a = BloomFilter.empty(10, 0.05)
    val b = BloomFilter.empty(100, 0.05)
    val e = intercept[SimilarityError](a.union(b))
    assert(e.message == "Bloom Filters are not similar")
    val c1 = CountMinSketch.empty(1000, 5)
    val c2 = CountMinSketch.empty(1000, 4)
    val e2 = intercept[CountMinSketchError](c1.join(c2))
    assert(e2.message == "Unable to merge as the count-min sketches are mismatched")
  }

  test("full / rotation / quotient errors carry the reference messages") {
    val cf = CuckooFilter(capacity = 4, bucketSize = 2, maxSwaps = 3, autoExpand = false)
    val e = intercept[CuckooFilterFullException] {
      (0 until 50).foreach(i => cf.add(i.toString))
    }
    assert(e.getMessage == "The CuckooFilter is currently full")
    val r = RotatingBloomFilter(10, 0.05, maxQueueSize = 3)
    val e2 = intercept[RotatingBloomFilterException](r.pop())
    assert(e2.getMessage == "Popping a Bloom Filter will result in an unusable system!")
    val e3 = intercept[QuotientFilterException](QuotientFilter(2))
    assert(e3.getMessage ==
      "Invalid quotient setting; quotient must be between 3 and 31; 2 was provided")
    // all share the base type
    assert(e.isInstanceOf[ProbablesBaseException])
    assert(e2.isInstanceOf[ProbablesBaseException])
    assert(e3.isInstanceOf[ProbablesBaseException])
  }
}
