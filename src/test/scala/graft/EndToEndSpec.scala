package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.io.Warc
import graft.spark.pipeline.DataPipeline

/** The whole user journey, composed: WARC blobs in → byte-identical text
  * extraction → curation (quality gate, exact + fuzzy dedup, benchmark
  * decontamination, domain cap, token budget) → content-addressed shards →
  * parquet out → read back and assert every curation decision. Each stage
  * is spec'd individually elsewhere; this pins that they COMPOSE. */
class EndToEndSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("WARC -> extract -> curate -> shard -> parquet round trip") {
    import spark.implicits._
    // --- corpus: 40 good docs, plus a near-dup, a benchmark leak, junk ---
    def prose(i: Int): String =
      s"document number $i about subject ${i % 7} " +
        (0 until 25).map(j => s"word${(i * 13 + j * 5) % 211}").mkString(" ")
    val benchSentence = "this exact benchmark sentence must never reach training data ever"
    val pages = (0 until 40).map(i => (100L + i, "en", s"d${i % 4}.example.com", prose(i))) ++
      Seq(
        (900L, "en", "d0.example.com", prose(3) + " nearlyidentical"), // fuzzy dup of 103
        (901L, "en", "d1.example.com", prose(11) + " " + benchSentence), // contaminated
        (902L, "en", "d2.example.com", "tiny"))                        // fails quality gate
    // WARC in: one blob containing every page, html-wrapped
    val blob = Warc.write(pages.iterator.map { case (id, _, _, text) =>
      Warc.WarcRecord(s"https://crawl/$id", "2026-01-01T00:00:00Z",
        ("<html><body>" + text + "</body></html>").getBytes(UTF_8))
    })
    // distributed parse + byte-identical extraction
    val docs = spark.createDataset(Seq(blob)).flatMap(b =>
        Warc.parse(b).map(r => (r.url.substring(r.url.lastIndexOf('/') + 1).toLong,
          Warc.extractText(r.payload))))
      .toDF("doc_id", "text")
      .join(spark.createDataset(pages.map(p => (p._1, p._2, p._3)))
        .toDF("doc_id", "lang", "source"), "doc_id")
    assert(docs.count() == 43)
    // extraction is byte-identical to the source text
    val extracted = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    pages.foreach { case (id, _, _, text) => assert(extracted(id) == text, s"doc $id") }

    // --- curate with every optional stage on ---
    val bench = Seq(benchSentence).toDF("text")
    val kept = DataPipeline.withShard(
      DataPipeline.curate(docs, bench, domainCap = 100, tokenBudget = 1000000L,
        nearDupThreshold = Some(0.7)), nShards = 8)
    val out = Files.createTempDirectory("graft_e2e").toFile
    kept.write.mode("overwrite").parquet(out.getAbsolutePath)
    val back = spark.read.parquet(out.getAbsolutePath)

    val ids = back.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(902L), "quality gate must drop the junk doc")
    assert(!ids.contains(901L), "decontamination must drop the benchmark leak")
    assert(!ids.contains(900L), "fuzzy dedup must drop the near-dup (min-id rep wins)")
    assert(ids.contains(103L), "the near-dup cluster representative survives")
    assert((100L until 140L).forall(ids.contains), "every clean doc survives")
    // shards are content-addressed and within range
    val shards = back.select("shard").collect().map(_.getLong(0))
    assert(shards.forall(s => s >= 0 && s < 8))
    // rerunning the whole journey lands identical rows in identical shards
    val again = DataPipeline.withShard(
      DataPipeline.curate(docs, bench, domainCap = 100, tokenBudget = 1000000L,
        nearDupThreshold = Some(0.7)), nShards = 8)
      .select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == back.select("doc_id", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
  }
}
