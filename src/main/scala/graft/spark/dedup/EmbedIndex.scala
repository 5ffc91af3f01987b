package graft.spark.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.spark.io.Bucketing

/** PERSISTED hyperplane-LSH bucket index for embedding near-dup —
  * [[BandIndex]]'s pattern applied to the embedding modality (round-4
  * verdict next-round #7: the hyperplane-bucket table is the same shape as
  * the minhash band table).
  *
  * Stored relation: (ekey, vid) bucketed+sorted by ekey, where ekey fuses
  * (table_id, signature) into one long (table_id << bits_per_table | sig —
  * collision-free since sig < 2^bits_per_table). LSH layout (tables,
  * bits_per_table, dim) lives in the conf companion, so a search or append
  * under a drifted geometry is impossible by construction; hyperplanes are
  * the same fixed-seed family as [[Dedup.embeddingNearDupPairs]]
  * (seedBase 2000), so index-backed pairs EQUAL the non-indexed
  * incremental operator's on the same split (IncrementalDedupSpec).
  *
  * Per batch: hash only the new vectors, semi-join the stored index
  * (bucketed scan side crosses no Exchange), new-touching pair generation,
  * exact-cosine verify against `historyVecs` (the candidate id set is tiny
  * and broadcast — at corpus scale a broadcast-pruned lookup against the
  * vector store, not a second full pass), then [[append]].
  */
object EmbedIndex {

  // the embeddingNearDupPairs hyperplane family — shared constant so the
  // restricted-equality contract can't drift on a retuned seed
  private val seedBase = Dedup.EmbedHyperplaneSeed

  /** (ekey, vid) relation of a vector frame under the given layout. */
  private def keyRelation(vecs: DataFrame, idCol: String, embCol: String,
                          tables: Int, bitsPerTable: Int, dim: Int): DataFrame = {
    import graft.spark.ann.Ann
    val sigsAll = Ann.hyperplaneSigs(tables, bitsPerTable, dim, seedBase)
    vecs
      .select(col(idCol).cast("long").as("vid"), col(embCol).as("emb"))
      .select(col("vid"), posexplode(sigsAll(col("emb"))).as(Seq("t", "h")))
      .select((shiftleft(col("t").cast("long"), bitsPerTable) bitwiseOR col("h"))
        .as("ekey"), col("vid"))
  }

  def create(history: DataFrame, idCol: String, embCol: String, table: String,
             dim: Int, tables: Int = 32, bitsPerTable: Int = 12,
             numBuckets: Int = 32): Unit = {
    require(bitsPerTable > 0 && bitsPerTable < 56,
      s"bitsPerTable must be in [1, 55], got $bitsPerTable")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    IndexIO.create(keyRelation(history, idCol, embCol, tables, bitsPerTable, dim),
      table, "ekey", numBuckets,
      Seq("tables" -> tables, "bits_per_table" -> bitsPerTable, "dim" -> dim,
        "num_buckets" -> numBuckets))
  }

  /** Append a processed batch's buckets (run AFTER searching the batch).
    * Layout comes from the stored conf; ids must be new to the index. */
  def append(batch: DataFrame, idCol: String, embCol: String, table: String): Double = {
    val conf = IndexIO.readConf(batch.sparkSession, table, "EmbedIndex.create")
    IndexIO.append(
      keyRelation(batch, idCol, embCol, conf("tables"), conf("bits_per_table"),
        conf("dim")),
      table, "ekey", conf("num_buckets"))
  }

  /** Every pair with cosine >= threshold involving a `newVecs` vector,
    * against the PERSISTED index — only the batch is hashed.
    * `historyVecs` supplies (idCol, embCol) for the exact-cosine verify of
    * candidate pairs only. Ids must be unique across history and batch.
    * Returns (id_a, id_b). */
  def incrementalPairs(newVecs: DataFrame, historyVecs: DataFrame,
                       idCol: String, embCol: String, table: String,
                       threshold: Double, maxBucket: Int = 4096,
                       telemetry: Option[Dedup.TruncationTelemetry] = None): DataFrame = {
    import graft.spark.ann.Ann
    val spark = newVecs.sparkSession
    val conf = IndexIO.readConf(spark, table, "EmbedIndex.create")
    val tele = telemetry.getOrElse(Dedup.TruncationTelemetry(spark, "embed_index"))
    val newKeys = keyRelation(newVecs, idCol, embCol, conf("tables"),
      conf("bits_per_table"), conf("dim"))
    val touchedOld = Bucketing.readTable(spark, table)
      .join(newKeys.select(col("ekey")).distinct(), Seq("ekey"), "left_semi")
    val members = touchedOld.withColumn("is_new", lit(false))
      .unionByName(newKeys.withColumn("is_new", lit(true)))
    val candidates = members
      .groupBy(col("ekey"))
      .agg(collect_list(struct(col("vid"), col("is_new"))).as("members"))
      .filter(size(col("members")) > 1 && exists(col("members"), m => m.getField("is_new")))
      .select(explode(Dedup.newTouchingPairsUdf(maxBucket, tele)(col("members"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"))
      .distinct()
    val base = newVecs
      .select(col(idCol).cast("long").as("vid"), col(embCol).as("emb"))
      .unionByName(historyVecs
        .select(col(idCol).cast("long").as("vid"), col(embCol).as("emb")))
    candidates
      .join(base.select(col("vid").as("id_a"), col("emb").as("emb_a")), "id_a")
      .join(base.select(col("vid").as("id_b"), col("emb").as("emb_b")), "id_b")
      .filter(Ann.cosine(col("emb_a"), col("emb_b")) >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  def compactTo(spark: SparkSession, from: String, to: String): Unit =
    IndexIO.compactTo(spark, from, to, "ekey")

  def drop(spark: SparkSession, table: String): Unit = IndexIO.drop(spark, table)
}
