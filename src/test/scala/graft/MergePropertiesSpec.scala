package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.ext._

/** ScalaCheck properties: merge associativity + commutativity as BYTES for
  * every mergeable sketch, add-then-check no-false-negatives, and
  * partition-arrangement invariance — the algebra that makes distributed
  * aggregation legal under any re-grouping (BASELINE.json north_rule).
  */
class MergePropertiesSpec extends AnyFunSuite {
  /** scalacheck-core runner (no scalatestplus bridge in the offline cache) */
  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  private val keyGen: Gen[List[String]] =
    Gen.listOfN(120, Gen.chooseNum(0, 5000).map(i => s"key-$i"))

  private val threeKeySets: Gen[(List[String], List[String], List[String])] =
    for (a <- keyGen; b <- keyGen; c <- keyGen) yield (a, b, c)

  test("bloom: merge associative + commutative on bytes; no false negatives") {
    check(Prop.forAll(threeKeySets) { case (a, b, c) =>
      def mk(ks: List[String]): BloomFilter = {
        val f = BloomFilter.empty(2000, 0.01)
        ks.foreach(f.add)
        f
      }
      val left = mk(a).orInPlace(mk(b).orInPlace(mk(c)))
      val right = mk(a).orInPlace(mk(b)).orInPlace(mk(c))
      val perm = mk(c).orInPlace(mk(a)).orInPlace(mk(b))
      val assoc = left.toBytes.sameElements(right.toBytes)
      val comm = left.toBytes.sameElements(perm.toBytes)
      val noFn = (a ++ b ++ c).forall(left.check)
      assoc && comm && noFn
    })
  }

  test("cms: join associative + commutative on bytes; never undercounts") {
    check(Prop.forAll(threeKeySets) { case (a, b, c) =>
      def mk(ks: List[String]): CountMinSketch = {
        val s = CountMinSketch.empty(512, 5)
        ks.foreach(k => s.add(k))
        s
      }
      val left = mk(a).join(mk(b).join(mk(c)))
      val right = mk(a).join(mk(b)).join(mk(c))
      val perm = mk(b).join(mk(c)).join(mk(a))
      val all = a ++ b ++ c
      val trueCounts = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      left.toBytes.sameElements(right.toBytes) &&
        left.toBytes.sameElements(perm.toBytes) &&
        trueCounts.forall { case (k, n) => left.check(k) >= n }
    })
  }

  test("hll: merge associative + commutative + idempotent on bytes") {
    check(Prop.forAll(threeKeySets) { case (a, b, c) =>
      def mk(ks: List[String]): Hll = { val h = Hll(10); ks.foreach(h.add); h }
      val left = mk(a).merge(mk(b).merge(mk(c)))
      val right = mk(a).merge(mk(b)).merge(mk(c))
      val perm = mk(c).merge(mk(b)).merge(mk(a))
      val idem = mk(a).merge(mk(a))
      left.toBytes.sameElements(right.toBytes) &&
        left.toBytes.sameElements(perm.toBytes) &&
        idem.toBytes.sameElements(mk(a).toBytes)
    })
  }

  test("cbf: addInPlace associative + commutative; counts = sum of parts") {
    check(Prop.forAll(threeKeySets) { case (a, b, c) =>
      def mk(ks: List[String]): CountingBloomFilter = {
        val f = CountingBloomFilter.empty(2000, 0.01)
        ks.foreach(k => f.add(k))
        f
      }
      val left = mk(a).addInPlace(mk(b).addInPlace(mk(c)))
      val right = mk(a).addInPlace(mk(b)).addInPlace(mk(c))
      val all = a ++ b ++ c
      val trueCounts = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      left.toBytes.sameElements(right.toBytes) &&
        trueCounts.forall { case (k, n) => left.check(k) >= n }
    })
  }

  test("qf: merge is order-insensitive (canonical layout) and lossless") {
    check(Prop.forAll(Gen.listOfN(80, Gen.chooseNum(0, 2000).map(i => s"k$i"))) { ks =>
      val forward = QuotientFilter(12)
      ks.foreach(forward.add)
      val backward = QuotientFilter(12)
      ks.reverse.foreach(backward.add)
      forward.toBytes.sameElements(backward.toBytes) &&
        ks.forall(forward.check) &&
        forward.hashes().toSet == ks.map(k => graft.hash.Fnv.fnv1a32(k, 0) & 0xffffffffL).toSet
    })
  }

  test("ebf force-mode: mergeFrom is order-insensitive on membership; counters sum") {
    check(Prop.forAll(threeKeySets) { case (a, b, c) =>
      def mk(ks: List[String]): ExpandingBloomFilter = {
        val e = ExpandingBloomFilter(64, 0.01)
        ks.foreach(k => e.add(k, force = true))
        e
      }
      val left = mk(a).mergeFrom(mk(b).mergeFrom(mk(c)))
      val right = mk(c).mergeFrom(mk(b)).mergeFrom(mk(a))
      val all = a ++ b ++ c
      left.elementsAdded == all.size && right.elementsAdded == all.size &&
        all.forall(left.check) && all.forall(right.check)
    })
  }

  test("kll/tdigest: merged quantiles stay within rank error regardless of split") {
    check(Prop.forAll(Gen.chooseNum(2, 7), Gen.chooseNum(1000, 4000)) { (splits, n) =>
      val data = Array.tabulate(n)(i => (i * 37 % n).toDouble)
      val klls = Array.fill(splits)(Kll(200))
      val tds = Array.fill(splits)(TDigest(100))
      data.zipWithIndex.foreach { case (v, i) => klls(i % splits).update(v); tds(i % splits).update(v) }
      val kll = klls.reduce((x, y) => x.merge(y))
      val td = tds.reduce((x, y) => x.merge(y))
      val sorted = data.sorted
      Seq(0.25, 0.5, 0.9).forall { q =>
        val kr = sorted.count(_ <= kll.quantile(q)).toDouble / n
        val tr = sorted.count(_ <= td.quantile(q)).toDouble / n
        math.abs(kr - q) < 0.05 && math.abs(tr - q) < 0.05
      }
    })
  }
}
