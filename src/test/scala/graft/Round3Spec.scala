package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.dedup.{Corpus, Dedup}

/** Round-3 hardening: scale-safe removeBoilerplate (join-rebuild path ==
  * broadcast path byte-for-byte), LSH truncation telemetry (capped buckets
  * are counted, never silent), reliable-checkpoint connected components,
  * convergence guard, and the codegen'd CCF probe parity. */
class Round3Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  // ---- removeBoilerplate: broadcast vs join-rebuild equivalence ----

  private def boilerDocs = {
    import spark.implicits._
    Seq(
      (0L, "keep one\nshared line\nkeep two"),
      (1L, "shared line\nkeep three\n   \nshared line"),
      (2L, "shared line\nunique tail"),
      (3L, "all alone here"),
      (4L, "shared line"),              // reduces to "" (all lines heavy)
      (5L, ""),                          // empty text stays ""
      (6L, null.asInstanceOf[String]),   // null stays null
      (7L, "trailing newline\nshared line\n")
    ).toDF("doc_id", "text").repartition(3)
  }

  test("removeBoilerplate join-rebuild path == broadcast path (with idCol)") {
    def result(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      df.select(col("doc_id"), col("text_clean")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaBroadcast = result(
      Corpus.removeBoilerplate(boilerDocs, "text", minCount = 4L))
    // maxHeavyBroadcast = -1 forces the join-rebuild path
    val viaJoin = result(Corpus.removeBoilerplate(boilerDocs, "text",
      minCount = 4L, maxHeavyBroadcast = -1L, idCol = Some("doc_id")))
    assert(viaBroadcast == viaJoin)
    assert(viaJoin(0L) == "keep one\nkeep two")
    assert(viaJoin(1L) == "keep three\n   ")
    assert(viaJoin(4L) == "")
    assert(viaJoin(5L) == "")
    assert(viaJoin(6L) == null)
    assert(viaJoin(7L) == "trailing newline\n") // trailing '' line survives
  }

  test("removeBoilerplate join-rebuild works without idCol (synthetic rid)") {
    val got = Corpus.removeBoilerplate(boilerDocs, "text",
        minCount = 4L, maxHeavyBroadcast = -1L)
      .select(col("doc_id"), col("text_clean")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "keep one\nkeep two" && got(6L) == null && got.size == 8)
    // helper columns must not leak
    val cols = Corpus.removeBoilerplate(boilerDocs, "text",
      minCount = 4L, maxHeavyBroadcast = -1L).columns.toSet
    assert(cols == Set("doc_id", "text", "text_clean"))
  }

  // ---- LSH truncation telemetry ----

  test("truncation telemetry: zero on a healthy corpus, counted on a planted bucket") {
    import spark.implicits._
    val healthy = (0L until 40L).map(i => (i, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i"))
      .toDF("doc_id", "text")
    val t0 = Dedup.TruncationTelemetry(spark, "test_healthy")
    Dedup.minhashLshPairs(healthy, "doc_id", "text", telemetry = Some(t0)).count()
    assert(t0.truncatedBuckets.value == 0L && t0.droppedIds.value == 0L)

    // 12 identical docs all land in one bucket per band; maxBucket=4 caps it
    val planted = (0L until 12L).map(i => (i, "same text in every single planted document"))
      .toDF("doc_id", "text")
    val t1 = Dedup.TruncationTelemetry(spark, "test_planted")
    Dedup.minhashLshPairs(planted, "doc_id", "text", maxBucket = 4,
      telemetry = Some(t1)).count()
    assert(t1.truncatedBuckets.value > 0L, "capped buckets must be counted")
    assert(t1.droppedIds.value > 0L)

    val t2 = Dedup.TruncationTelemetry(spark, "test_simhash")
    Dedup.simhashPairs(planted, "doc_id", "text", maxBucket = 4,
      telemetry = Some(t2)).count()
    assert(t2.truncatedBuckets.value > 0L)
  }

  // ---- connected components: reliable checkpoint + convergence guard ----

  test("connectedComponents reliable-checkpoint mode yields identical labels") {
    import spark.implicits._
    val pairs = ((1L until 10L).map(i => (i, i + 1)) ++ Seq((50L, 51L), (52L, 51L)))
      .toDF("id_a", "id_b")
    val local = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    val reliable = Dedup.connectedComponents(pairs, checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == reliable)
    assert(reliable(10L) == 1L && reliable(52L) == 50L)
  }

  test("connectedComponents fails loudly when the iteration cap is hit") {
    import spark.implicits._
    val pairs = (1L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      // maxDriverEdges = 0: the cap only exists on the distributed rounds
      // (the driver fast path needs no iterations)
      Dedup.connectedComponents(pairs, maxIters = 1, maxDriverEdges = 0L)
    }
    assert(e.getMessage.contains("converge"))
  }

  // ---- codegen'd CCF probe ----

  test("CcfCountExpr parity with the core CountingCuckooFilter probe") {
    import spark.implicits._
    import graft.spark.fns.SketchExpressions
    val keys = (0 until 300).map(i => s"key-${i % 120}")
    val ccf = new graft.core.CountingCuckooFilter(2000, 4, 500, 2, true, 32)
    keys.foreach(ccf.add)
    val bytes = ccf.toBytes
    val got = keys.distinct.toDF("k")
      .select(col("k"), SketchExpressions.ccfCountNative(bytes, 32, col("k")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    keys.distinct.foreach { k =>
      assert(got(k) == ccf.check(k), s"key $k")
    }
    // and a key never added probes 0
    val miss = Seq("never-added").toDF("k")
      .select(SketchExpressions.ccfCountNative(bytes, 32, col("k"))).head().getLong(0)
    assert(miss == 0L)
  }
}
