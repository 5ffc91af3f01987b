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
    * The operator deliberately recomputes the broadcast-assign kernel on
    * each of its scans (sizes probe + both join sides + output) instead of
    * caching the corpus — each pass is linear and cache-free; callers in
    * the extreme-scale regime can persist the assigned projection
    * themselves. */
  def semDedup(embeddings: DataFrame, nClusters: Int, threshold: Double,
               lloydIters: Int = 5,
               policy: KeepPolicy = KeepLowCentroidSim,
               maxCellSize: Long = 1L << 14): DataFrame = {
    val cents = Ann.trainCoarseCentroids(
      embeddings.select(col("vec_id"), col("embedding")), nClusters, lloydIters)
    semDedupWithCentroids(embeddings, cents, threshold, policy, maxCellSize)
  }

  /** Fused (cell, centroid-sim) assignment UDF against a broadcast centroid
    * table — same max-cosine / lowest-index-tie rule as the IVF quantizer,
    * same cosine association as VecKernels.cosineF32 (the pair kernel), so
    * every cosine in the operator is bit-identical to the verifiers'.
    * Shared with [[SemDedupIndex]] so index-backed assignment EQUALS the
    * full operator's under the same centroids. */
  private[dedup] def assignStructUdf(
      bc: org.apache.spark.broadcast.Broadcast[Array[(Int, Array[Float])]])
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((v: Seq[Float]) => {
      var best = 0; var bestSim = Double.NegativeInfinity
      bc.value.foreach { case (i, c) =>
        var dot = 0.0; var na = 0.0; var nb = 0.0
        val n = math.min(v.length, c.length)
        var j = 0
        while (j < n) {
          dot += v(j).toDouble * c(j); na += v(j).toDouble * v(j); nb += c(j).toDouble * c(j)
          j += 1
        }
        val s = if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
        if (s > bestSim) { bestSim = s; best = i }
      }
      (best, bestSim)
    })

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
      .withColumn("a", assignStructUdf(bc)(col("embedding")))
      .select(col("vec_id"), col("embedding"),
        col("a._1").as("cell"), col("a._2").as("centroid_sim"))
    // skew guard: salt cells above maxCellSize into bounded sub-blocks
    // (one nClusters-row aggregate → broadcast split factors; block id is
    // deterministic per (cell, vec_id))
    val splitCells = spark.sparkContext.longAccumulator("graft.semdedup.split_cells")
    val sizes = assignedRaw.groupBy(col("cell")).count().collect()
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
    val bcSplits = spark.sparkContext.broadcast(splits)
    val saltUdf = udf((cell: Int, id: Long) => {
      val k = bcSplits.value.getOrElse(cell, 1)
      if (k <= 1) 0L else Math.floorMod(graft.hash.Fnv.fnv1a64(id.toString, 0), k).toLong
    })
    val assigned = assignedRaw
      .withColumn("block",
        col("cell").cast("long") * lit(1L << 20) + saltUdf(col("cell"), col("vec_id")))
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
    val losers = a.join(b, "block")
      .where(col("id_a") =!= col("id_b"))
      .where(bOutranksA)
      .where(Ann.cosine(col("va"), col("vb")) >= threshold)
      .select(col("id_a").as("vec_id"))
      .distinct()
      .withColumn("dropped", lit(true))
    assigned
      .select(col("vec_id"), col("cell"), col("block"), col("centroid_sim"))
      .join(losers, Seq("vec_id"), "left")
      .withColumn("dropped", coalesce(col("dropped"), lit(false)))
  }
}
