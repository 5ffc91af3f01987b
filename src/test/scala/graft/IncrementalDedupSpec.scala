package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.dedup.{Dedup, EmbedIndex, SimHashIndex}

/** Round-5 incremental dedup variants (round-4 verdict next-round #7): the
  * simhash and embedding incremental operators must equal their FULL
  * operators restricted to new-touching pairs, and the persisted index
  * forms ([[SimHashIndex]], [[EmbedIndex]]) must equal the incremental
  * operators on the same split — including across appends (a batch must see
  * previously appended batches as history).
  */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  // ---------- simhash fixtures ----------

  /** 8 groups of 5 docs sharing a long token tail; within a group the
    * variants flip 1-2 tokens, so many within-group pairs land at small
    * hamming distance; across groups the vocabularies are disjoint. */
  private def shDocs: DataFrame = {
    import spark.implicits._
    (for (g <- 0 until 8; j <- 0 until 5) yield {
      val shared = (0 until 24).map(t => s"tok${g}w$t").mkString(" ")
      val variant = if (j == 0) "" else s" var${g}x$j"
      (g * 10L + j, shared + variant)
    }).toDF("doc_id", "text")
  }

  private def shPairs(df: DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private def touchesNew(isNew: Long => Boolean)(p: (Long, Long, Int)): Boolean =
    isNew(p._1) || isNew(p._2)

  test("simhash incremental == full pairs restricted to new-touching") {
    val d = shDocs
    val isNew = (id: Long) => id % 2 == 1
    val newDocs = d.filter(col("doc_id") % 2 === 1)
    val oldDocs = d.filter(col("doc_id") % 2 === 0)
    val full = shPairs(Dedup.simhashPairs(d, "doc_id", "text", maxHamming = 3))
    val incr = shPairs(Dedup.simhashPairsIncremental(newDocs, oldDocs,
      "doc_id", "text", maxHamming = 3))
    assert(full.nonEmpty, "fixture must produce simhash near-dup pairs")
    assert(incr == full.filter(touchesNew(isNew)),
      s"incr ${incr.size} vs restricted-full ${full.count(touchesNew(isNew))}")
    // and strictly fewer than full (old-old pairs exist in this fixture)
    assert(full.exists(p => !touchesNew(isNew)(p)), "fixture needs old-old pairs")
  }

  test("SimHashIndex pairs == incremental operator pairs; appends advance history") {
    val d = shDocs
    val history = d.filter(col("doc_id") % 3 === 0)
    val batch1 = d.filter(col("doc_id") % 3 === 1)
    val batch2 = d.filter(col("doc_id") % 3 === 2)
    SimHashIndex.create(history, "doc_id", "text", "graft_shidx_t1", numBuckets = 8)
    try {
      val got1 = shPairs(SimHashIndex.incrementalPairs(batch1, "doc_id", "text",
        "graft_shidx_t1", maxHamming = 3))
      val want1 = shPairs(Dedup.simhashPairsIncremental(batch1, history,
        "doc_id", "text", maxHamming = 3))
      assert(got1 == want1, s"batch1: got ${got1.size}, want ${want1.size}")
      assert(got1.nonEmpty)

      SimHashIndex.append(batch1, "doc_id", "text", "graft_shidx_t1")
      val got2 = shPairs(SimHashIndex.incrementalPairs(batch2, "doc_id", "text",
        "graft_shidx_t1", maxHamming = 3))
      val want2 = shPairs(Dedup.simhashPairsIncremental(batch2,
        history.unionByName(batch1), "doc_id", "text", maxHamming = 3))
      assert(got2 == want2, s"batch2 after append: got ${got2.size}, want ${want2.size}")
      assert(got2.exists { case (a, b, _) => a % 3 == 1 || b % 3 == 1 },
        "appended batch1 docs must appear in batch2's pairs")
    } finally SimHashIndex.drop(spark, "graft_shidx_t1")
  }

  test("searching a SimHashIndex without a conf companion fails clearly") {
    val e = intercept[IllegalArgumentException] {
      SimHashIndex.incrementalPairs(shDocs, "doc_id", "text", "graft_shidx_missing")
    }
    assert(e.getMessage.contains("SimHashIndex.create"))
  }

  // ---------- embedding fixtures ----------

  /** 60 vectors in 8-d: 12 seed vectors, each with 4 perturbed copies
    * (cosine near 1 within a family, uncorrelated across families). */
  private def vecs: DataFrame = {
    import spark.implicits._
    val rng = new java.util.Random(77)
    val seeds = Array.fill(12, 8)(rng.nextGaussian().toFloat)
    (for (f <- 0 until 12; j <- 0 until 5) yield {
      val v = seeds(f).map(x => x + (if (j == 0) 0f else (rng.nextGaussian() * 0.05).toFloat))
      (f * 10L + j, v)
    }).toDF("vec_id", "embedding")
  }

  private def ePairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("embedding incremental == full pairs restricted to new-touching") {
    val d = vecs.cache()
    val newV = d.filter(col("vec_id") % 2 === 1)
    val oldV = d.filter(col("vec_id") % 2 === 0)
    try {
      val full = ePairs(Dedup.embeddingNearDupPairs(d, "vec_id", "embedding",
        threshold = 0.9, dim = 8, tables = 32, bitsPerTable = 3))
      val incr = ePairs(Dedup.embeddingNearDupPairsIncremental(newV, oldV,
        "vec_id", "embedding", threshold = 0.9, dim = 8, tables = 32, bitsPerTable = 3))
      assert(full.nonEmpty, "fixture must produce embedding near-dup pairs")
      val restricted = full.filter(p => p._1 % 2 == 1 || p._2 % 2 == 1)
      assert(incr == restricted, s"incr ${incr.size} vs restricted ${restricted.size}")
      assert(full.exists(p => p._1 % 2 == 0 && p._2 % 2 == 0), "fixture needs old-old pairs")
    } finally d.unpersist()
  }

  test("EmbedIndex pairs == incremental operator pairs; appends advance history") {
    val d = vecs.cache()
    val history = d.filter(col("vec_id") % 3 === 0)
    val batch1 = d.filter(col("vec_id") % 3 === 1)
    val batch2 = d.filter(col("vec_id") % 3 === 2)
    EmbedIndex.create(history, "vec_id", "embedding", "graft_eidx_t1",
      dim = 8, tables = 32, bitsPerTable = 3, numBuckets = 8)
    try {
      val got1 = ePairs(EmbedIndex.incrementalPairs(batch1, history,
        "vec_id", "embedding", "graft_eidx_t1", threshold = 0.9))
      val want1 = ePairs(Dedup.embeddingNearDupPairsIncremental(batch1, history,
        "vec_id", "embedding", threshold = 0.9, dim = 8, tables = 32, bitsPerTable = 3))
      assert(got1 == want1, s"batch1: got ${got1.size}, want ${want1.size}")
      assert(got1.nonEmpty)

      EmbedIndex.append(batch1, "vec_id", "embedding", "graft_eidx_t1")
      val hist2 = history.unionByName(batch1)
      val got2 = ePairs(EmbedIndex.incrementalPairs(batch2, hist2,
        "vec_id", "embedding", "graft_eidx_t1", threshold = 0.9))
      val want2 = ePairs(Dedup.embeddingNearDupPairsIncremental(batch2, hist2,
        "vec_id", "embedding", threshold = 0.9, dim = 8, tables = 32, bitsPerTable = 3))
      assert(got2 == want2, s"batch2 after append: got ${got2.size}, want ${want2.size}")
      assert(got2.exists { case (a, b) => a % 3 == 1 || b % 3 == 1 },
        "appended batch1 vectors must appear in batch2's pairs")
    } finally {
      EmbedIndex.drop(spark, "graft_eidx_t1")
      d.unpersist()
    }
  }

  test("EmbedIndex search under the STORED geometry — caller passes none") {
    val d = vecs.cache()
    val history = d.filter(col("vec_id") % 2 === 0)
    val batch = d.filter(col("vec_id") % 2 === 1)
    // non-default geometry: a search ignoring the stored conf would bucket
    // under the wrong hyperplane family and miss/extra pairs
    EmbedIndex.create(history, "vec_id", "embedding", "graft_eidx_t2",
      dim = 8, tables = 16, bitsPerTable = 2, numBuckets = 4)
    try {
      val got = ePairs(EmbedIndex.incrementalPairs(batch, history,
        "vec_id", "embedding", "graft_eidx_t2", threshold = 0.9))
      val want = ePairs(Dedup.embeddingNearDupPairsIncremental(batch, history,
        "vec_id", "embedding", threshold = 0.9, dim = 8, tables = 16, bitsPerTable = 2))
      assert(got == want)
      assert(got.nonEmpty)
    } finally {
      EmbedIndex.drop(spark, "graft_eidx_t2")
      d.unpersist()
    }
  }
}
