package graft.spark.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.spark.dedup.BandIndex
import graft.spark.io.Bucketing

/** Near-dup dedup over a STREAM of documents against the persisted
  * [[BandIndex]] — the daily-crawl shape expressed in Structured Streaming:
  * every micro-batch signs ONLY itself, searches the stored (bkey, doc_id)
  * relation, appends its verified pairs to `pairsTable`, then appends its
  * own bands to the index and its texts to `docStore` (the text lookup the
  * exact-Jaccard verify stage needs). A doc is therefore compared against
  * every earlier-arriving doc — including earlier docs of its own batch
  * (the new-new path of [[graft.spark.dedup.Dedup.newTouchingPairsUdf]]) —
  * and no document is ever re-signed.
  *
  * Accumulation invariant (StreamingDedupSpec pins it): after any number of
  * micro-batches, the UNION of emitted pairs equals the one-shot batch
  * operator [[graft.spark.dedup.Dedup.minhashLshPairs]] over everything
  * seen — each pair is emitted exactly once, by the batch that completes it.
  *
  * Delivery caveat: foreachBatch is AT-LEAST-ONCE — a micro-batch retried
  * after a sink write can append its pairs twice. Readers dedupe by
  * (id_a, id_b) (pairs carry no per-batch state, so the re-append is
  * idempotent up to duplicates); an exactly-once deployment would key the
  * appends by batchId through a transactional table format.
  *
  * Reader caveat: the appends run through the MICRO-BATCH session clone,
  * which invalidates its own relation cache but not other sessions' — a
  * reader session that has already scanned `pairsTable` must
  * `spark.catalog.refreshTable(pairsTable)` (or REFRESH TABLE) before
  * re-reading, or it keeps counting the stale file listing.
  */
object StreamingDedup {

  /** Bootstrap the empty index + doc store (idempotent: existing tables of
    * the same name are OVERWRITTEN — a stream restart over checkpointed
    * progress should NOT call this again). */
  def init(spark: org.apache.spark.sql.SparkSession, indexTable: String,
           docStore: String, pairsTable: String, conf: BandIndex.Conf): Unit = {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    BandIndex.create(empty, "doc_id", "text", indexTable, conf)
    Bucketing.dropTable(spark, docStore)
    Bucketing.saveTableWithStaleLocationRetry(spark, docStore) {
      empty.write.mode("overwrite").format("parquet").saveAsTable(docStore)
    }
    Bucketing.dropTable(spark, pairsTable)
    Bucketing.saveTableWithStaleLocationRetry(spark, pairsTable) {
      Seq.empty[(Long, Long, Double)].toDF("id_a", "id_b", "jaccard")
        .write.mode("overwrite").format("parquet").saveAsTable(pairsTable)
    }
  }

  /** Start the streaming near-dup query over `docs` (a STREAMING frame with
    * (idCol long, textCol string)). Call [[init]] first. */
  def nearDupViaIndex(docs: DataFrame, idCol: String, textCol: String,
                      indexTable: String, docStore: String, pairsTable: String,
                      threshold: Double): StreamingQuery = {
    docs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val b = batch.select(col(idCol).cast("long").as("doc_id"),
          col(textCol).as("text")).persist()
        try {
          if (b.count() > 0) { // empty micro-batches mutate nothing
            val history = spark.table(docStore)
            BandIndex.incrementalPairs(b, history, "doc_id", "text",
                indexTable, threshold)
              .write.mode("append").format("parquet").saveAsTable(pairsTable)
            BandIndex.append(b, "doc_id", "text", indexTable)
            b.write.mode("append").format("parquet").saveAsTable(docStore)
          }
        } finally b.unpersist()
      }
      .start()
  }
}
