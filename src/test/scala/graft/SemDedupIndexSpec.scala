package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.dedup.{SemDedup, SemDedupIndex}

/** Persisted semantic-dedup index: index-backed incremental flags must
  * EQUAL the full operator (same stored centroids, min-id rank) restricted
  * to the batch — the restricted-equality contract — including across
  * appends; and the stored quantizer must be frozen (same centroids back). */
class SemDedupIndexSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** Two directions + planted near-dups spread across three arrival waves
    * (id mod 3). dim 4, threshold .9 as in SemDedupSpec. */
  private def vecs: DataFrame = {
    import spark.implicits._
    ((0L until 24L).map { i =>
      val base = if (i % 2 == 0) Array(1f, 0f, 0f, 0f) else Array(0f, 1f, 0f, 0f)
      // every 4th doc perturbs enough to stay below threshold
      val v = if (i % 4 == 3) Array(base(0) * 0.7f, base(1) * 0.7f, 0.71f, 0f)
              else Array(base(0), base(1), 0.05f * (i % 3), 0f)
      (i, v)
    } ++ Seq(
      // a near-dup pair whose witness lives ONLY in batch1 (100 % 3 == 1,
      // 101 % 3 == 2) — the append differential: 101 must survive before
      // batch1 is appended and drop after
      (100L, Array(0f, 0f, 0.1f, 1f)),
      (101L, Array(0f, 0f, 0.12f, 1f))
    )).toDF("vec_id", "embedding")
  }

  private def flagsOf(df: DataFrame): Map[Long, Boolean] =
    df.collect().map(r => r.getLong(r.fieldIndex("vec_id")) ->
      r.getBoolean(r.fieldIndex("dropped"))).toMap

  test("index-backed flags == full operator restricted to the batch; appends advance") {
    val d = vecs
    val history = d.filter(col("vec_id") % 3 === 0)
    val batch1 = d.filter(col("vec_id") % 3 === 1)
    val batch2 = d.filter(col("vec_id") % 3 === 2)
    SemDedupIndex.create(history, "vec_id", "embedding", "graft_sdidx_t1",
      nClusters = 2, numBuckets = 4)
    try {
      val cents = SemDedupIndex.readCentroids(spark, "graft_sdidx_t1")
      assert(cents.length == 2, "stored quantizer round-trips")

      val got1 = flagsOf(SemDedupIndex.incrementalFlags(batch1, history,
        "vec_id", "embedding", "graft_sdidx_t1", threshold = 0.9))
      // reference: the FULL operator under the SAME stored centroids,
      // min-id rank, no salting, restricted to the batch
      val want1 = flagsOf(SemDedup.semDedupWithCentroids(
          history.unionByName(batch1), cents, threshold = 0.9,
          policy = SemDedup.KeepMinId, maxCellSize = Long.MaxValue))
        .filter(_._1 % 3 == 1)
      assert(got1 == want1)
      assert(got1.values.exists(identity), "fixture must drop something in batch1")
      assert(got1.values.exists(!_), "and keep something")

      // before the append, 101's only witness (100, batch1) is invisible
      val got2Pre = flagsOf(SemDedupIndex.incrementalFlags(batch2, history,
        "vec_id", "embedding", "graft_sdidx_t1", threshold = 0.9))
      assert(!got2Pre(101L), "no batch1 in the index yet -> 101 survives")

      SemDedupIndex.append(batch1, "vec_id", "embedding", "graft_sdidx_t1")
      val hist2 = history.unionByName(batch1)
      val got2 = flagsOf(SemDedupIndex.incrementalFlags(batch2, hist2,
        "vec_id", "embedding", "graft_sdidx_t1", threshold = 0.9))
      val want2 = flagsOf(SemDedup.semDedupWithCentroids(
          hist2.unionByName(batch2), cents, threshold = 0.9,
          policy = SemDedup.KeepMinId, maxCellSize = Long.MaxValue))
        .filter(_._1 % 3 == 2)
      assert(got2 == want2)
      assert(got2(101L), "appended batch1 doc 100 must now witness 101")
    } finally SemDedupIndex.drop(spark, "graft_sdidx_t1")
  }

  test("searching a never-created index fails loudly") {
    val e = intercept[IllegalArgumentException] {
      SemDedupIndex.incrementalFlags(vecs, vecs, "vec_id", "embedding",
        "graft_sdidx_missing", threshold = 0.9).collect()
    }
    assert(e.getMessage.contains("graft_sdidx_missing"))
  }

  test("incremental flags are deterministic run-to-run") {
    val d = vecs
    val history = d.filter(col("vec_id") % 3 === 0)
    val batch = d.filter(col("vec_id") % 3 =!= 0)
    SemDedupIndex.create(history, "vec_id", "embedding", "graft_sdidx_t2",
      nClusters = 2, numBuckets = 4)
    try {
      def run() = flagsOf(SemDedupIndex.incrementalFlags(batch, history,
        "vec_id", "embedding", "graft_sdidx_t2", threshold = 0.9))
      assert(run() == run())
    } finally SemDedupIndex.drop(spark, "graft_sdidx_t2")
  }
}
