package graft.spark.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.spark.ann.Ann
import graft.spark.io.Bucketing

/** PERSISTED semantic-dedup index — the [[BandIndex]]/[[EmbedIndex]]
  * build-once / batch-many pattern applied to [[SemDedup]]: train the
  * k-means quantizer ONCE on the history, persist the centroid table and
  * the per-cell member relation (ckey, vid, csim — parquet bucketed+sorted
  * by the cell key, one file per bucket at create), then dedup each daily
  * batch by assigning ONLY the batch and joining its touched cells against
  * the stored relation — the history is never re-assigned and its side of
  * the search crosses no Exchange.
  *
  * Incremental drop rule (min-id keep rank — arrival-stable, the natural
  * incremental policy): a batch doc drops iff it has an above-threshold
  * cosine pair with ANY lower-id doc in its cell (stored or same-batch).
  * Under the SAME stored centroids this equals
  * [[SemDedup.semDedupWithCentroids]] (KeepMinId) over history ∪ batch
  * restricted to batch docs — the restricted-equality contract
  * (SemDedupIndexSpec pins it, including across appends). The centroid-sim
  * keep policies need a global rank and are deliberately not offered
  * incrementally.
  *
  * The quantizer is FROZEN at create (the paper's production shape:
  * clusters from a reference snapshot, batches assigned to them) —
  * retraining would silently re-shard every past decision; rebuild the
  * index instead when the corpus distribution drifts.
  */
object SemDedupIndex {

  private def centTable(table: String): String = s"${table}__centroids"

  private def assigned(vecs: DataFrame, idCol: String, embCol: String,
                       cents: Array[(Int, Array[Float])]): DataFrame = {
    val bc = vecs.sparkSession.sparkContext.broadcast(cents)
    vecs.select(col(idCol).cast("long").as("vid"), col(embCol).as("emb"))
      .withColumn("a", SemDedup.assignStruct(bc)(col("emb")))
      .select(col("a.cell").cast("long").as("ckey"), col("vid"),
        col("a.sim").as("csim"))
  }

  /** Train the quantizer on `history`, persist centroids + the (ckey, vid,
    * csim) member relation. */
  def create(history: DataFrame, idCol: String, embCol: String, table: String,
             nClusters: Int, lloydIters: Int = 5, numBuckets: Int = 16): Unit = {
    require(nClusters > 0, s"nClusters must be positive, got $nClusters")
    val spark = history.sparkSession
    val cents = Ann.trainCoarseCentroids(
      history.select(col(idCol).cast("long").as("vec_id"), col(embCol).as("embedding")),
      nClusters, lloydIters)
    import spark.implicits._
    Bucketing.dropTable(spark, centTable(table))
    Bucketing.saveTableWithStaleLocationRetry(spark, centTable(table)) {
      cents.toSeq.map { case (c, v) => (c, v.toSeq) }
        .toDF("cell", "centroid")
        .write.mode("overwrite").format("parquet").saveAsTable(centTable(table))
    }
    IndexIO.create(assigned(history, idCol, embCol, cents), table, "ckey",
      numBuckets,
      Seq("n_clusters" -> nClusters, "lloyd_iters" -> lloydIters,
        "num_buckets" -> numBuckets))
  }

  /** The stored quantizer (sorted by cell id). */
  def readCentroids(spark: SparkSession, table: String): Array[(Int, Array[Float])] =
    try spark.table(centTable(table)).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    catch {
      case e: Exception =>
        throw new IllegalArgumentException(
          s"index '$table' has no readable centroid table '${centTable(table)}' — " +
            "was it written via SemDedupIndex.create?", e)
    }

  /** Append a processed batch's members (run AFTER searching the batch).
    * Assignment uses the STORED centroids; ids must be new to the index. */
  def append(batch: DataFrame, idCol: String, embCol: String, table: String): Double = {
    val spark = batch.sparkSession
    val conf = IndexIO.readConf(spark, table, "SemDedupIndex.create")
    IndexIO.append(assigned(batch, idCol, embCol, readCentroids(spark, table)),
      table, "ckey", conf("num_buckets"))
  }

  /** Per-batch-doc drop flags against the PERSISTED index: only the batch
    * is assigned; the stored relation is semi-joined on the batch's touched
    * cells (bucketed scan side, no Exchange). `historyVecs` supplies
    * (idCol, embCol) for the exact-cosine verify of candidate pairs only.
    * Ids must be unique across history and batch. Returns
    * (vec_id, cell, dropped) for every batch row. */
  def incrementalFlags(newVecs: DataFrame, historyVecs: DataFrame,
                       idCol: String, embCol: String, table: String,
                       threshold: Double): DataFrame = {
    val spark = newVecs.sparkSession
    IndexIO.readConf(spark, table, "SemDedupIndex.create") // loud if absent
    val cents = readCentroids(spark, table)
    val batch = assigned(newVecs, idCol, embCol, cents)
    val touchedOld = Bucketing.readTable(spark, table)
      .join(batch.select(col("ckey")).distinct(), Seq("ckey"), "left_semi")
    // min-id rank: candidate witnesses for batch doc a are the lower-id
    // members of its cell — stored or same-batch
    val members = touchedOld.select(col("ckey"), col("vid"))
      .unionByName(batch.select(col("ckey"), col("vid")))
    val base = newVecs
      .select(col(idCol).cast("long").as("vid"), col(embCol).as("emb"))
      .unionByName(historyVecs
        .select(col(idCol).cast("long").as("vid"), col(embCol).as("emb")))
    val losers = batch.select(col("ckey"), col("vid").as("id_a"))
      .join(members.select(col("ckey"), col("vid").as("id_b")), "ckey")
      .where(col("id_b") < col("id_a"))
      .join(base.select(col("vid").as("id_a"), col("emb").as("emb_a")), "id_a")
      .join(base.select(col("vid").as("id_b"), col("emb").as("emb_b")), "id_b")
      .where(Ann.cosine(col("emb_a"), col("emb_b")) >= threshold)
      .select(col("id_a").as("vid"))
      .distinct()
      .withColumn("dropped", lit(true))
    batch.select(col("vid"), col("ckey"))
      .join(losers, Seq("vid"), "left")
      .select(col("vid").as("vec_id"), col("ckey").cast("int").as("cell"),
        coalesce(col("dropped"), lit(false)).as("dropped"))
  }

  def compactTo(spark: SparkSession, from: String, to: String): Unit = {
    IndexIO.compactTo(spark, from, to, "ckey")
    Bucketing.dropTable(spark, centTable(to))
    Bucketing.saveTableWithStaleLocationRetry(spark, centTable(to)) {
      spark.table(centTable(from))
        .write.mode("overwrite").format("parquet").saveAsTable(centTable(to))
    }
  }

  def drop(spark: SparkSession, table: String): Unit = {
    IndexIO.drop(spark, table)
    Bucketing.dropTable(spark, centTable(table))
  }
}
