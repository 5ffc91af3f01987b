package graft.spark.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.spark.dedup.{BandIndex, Corpus, Dedup, IndexIO}
import graft.spark.io.Bucketing
import graft.spark.text.TextFunctions

/** INCREMENTAL curation — the round-5 per-modality persisted indexes
  * composed at PIPELINE granularity (round-5 verdict next-round #3): a
  * daily-crawl deployment curates each new batch against persisted stage
  * state instead of re-running `DataPipeline.curate` over the whole
  * history:
  *
  *   quality gate (per-doc, stateless) ->
  *   exact dedup against a persisted DIGEST INDEX (8-byte-key bucketed
  *     relation; the stored side crosses no Exchange) ->
  *   fuzzy near-dup against the persisted BAND INDEX (only the batch is
  *     signed — O(batch), never O(history)) ->
  *   benchmark decontamination (per-doc against the FIXED bench set) ->
  *   state append (the batch's stage-2 survivors join the history).
  *
  * THE CONTRACT (the restricted-equality contract at pipeline level,
  * q_pipeline_incremental + PipelineSpec): for id-monotone batches,
  * [[curateBatch]]'s kept set EQUALS `curate`'s stage-1..3 pipeline run
  * one-shot over history ∪ batch, restricted to the batch — stage by
  * stage:
  *
  *  - quality is per-doc;
  *  - exact dedup keeps the min doc_id per digest: with batch ids above
  *    all indexed ids, a batch doc loses exactly when its digest exists in
  *    the index (history representative has the smaller id) or earlier in
  *    its own batch;
  *  - fuzzy dedup keeps one doc per near-dup cluster (the min-id rep of
  *    connected components over the above-threshold pair graph of stage-2
  *    survivors). Restricted to an id-monotone batch this reduces to: a
  *    batch doc drops iff its component over BATCH-BATCH pairs contains
  *    any doc with a history neighbor ("anchored" — the one-shot cluster
  *    then contains a smaller-id history doc), or it is not its
  *    component's min id. History-history edges never flip a batch
  *    decision: they only connect clusters through docs that are already
  *    anchors. This is exact, not an approximation — PipelineSpec pins it
  *    against the one-shot recomputation, including transitive chains
  *    through history;
  *  - decontamination is per-doc against a benchmark set that does not
  *    grow with the corpus.
  *
  * Ids MUST be monotone across batches (each batch's min id above every
  * indexed id — the production crawl-id reality); [[curateBatch]] fails
  * loudly otherwise, because out-of-order ids would let a one-shot run
  * hand a cluster's rep to the NEW doc, which no incremental pipeline can
  * reproduce without revoking history decisions.
  *
  * DELIBERATELY NOT INCREMENTAL: the per-domain cap and per-lang token
  * budget (curate stages 4-5) are GLOBAL hash-priority ranks — a new doc
  * can displace an already-kept history doc, so no arrival-stable
  * incremental rule can equal the one-shot allocation. Run those as the
  * dataset-assembly pass over the accumulated kept corpus
  * ([[graft.spark.sample.Sampling]] operators compose directly), which is
  * also where published pipelines apply mixing.
  */
object IncrementalCurate {

  /** LSH layout + threshold of the fuzzy stage, frozen at [[create]].
    * Defaults are the oracle-facing 128x32 (per-pair miss <= 1.3e-2 at the
    * j=0.5 boundary — the q_minhash_pairs configuration, so the pair graph
    * matches the exact-Jaccard oracle at the driver's fixtures). */
  final case class Conf(shingleSize: Int = 3, numHashes: Int = 128, bands: Int = 32,
                       numBuckets: Int = 32, nearDupThreshold: Double = 0.5)

  private def digestTable(prefix: String) = s"${prefix}__digests"
  private def bandTable(prefix: String) = s"${prefix}__bands"
  private def stateTable(prefix: String) = s"${prefix}__state"

  /** Stage 1+2a: quality gate + WITHIN-frame exact dedup (min doc_id per
    * digest). Returns (doc_id, lang, source, text, digest, toks) — the
    * stage-2 survivor frame whose digests/bands become state. */
  private def gatedDeduped(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("lang"), col("source"), col("text"),
      md5(col("text")).as("digest"),
      TextFunctions.tokenCount(col("text")).cast("long").as("toks"))
    val w = Window.partitionBy(col("digest")).orderBy(col("doc_id"))
    base.filter(TextFunctions.isQuality(col("text")))
      .withColumn("__rk", row_number().over(w)).filter(col("__rk") === 1).drop("__rk")
  }

  private def digestRelation(surv: DataFrame): DataFrame =
    surv.select(xxhash64(col("digest")).as("dkey"), col("digest"), col("doc_id"))

  private def writeState(spark: SparkSession, prefix: String, maxId: Long): Unit = {
    import spark.implicits._
    // overwrite WITHOUT a prior drop: an explicit drop would open a crash
    // window in which the state table is simply absent and a scheduled
    // re-run would silently re-initialize from scratch (losing every
    // appended batch); overwrite keeps the table present throughout
    Bucketing.saveTableWithStaleLocationRetry(spark, stateTable(prefix)) {
      Seq(maxId).toDF("max_doc_id")
        .write.mode("overwrite").format("parquet").saveAsTable(stateTable(prefix))
    }
  }

  private def readMaxId(spark: SparkSession, prefix: String): Long =
    try spark.table(stateTable(prefix)).head().getLong(0)
    catch {
      case e: Exception => throw new IllegalArgumentException(
        s"incremental-curate state '$prefix' has no readable state table " +
          s"'${stateTable(prefix)}' — was it written via IncrementalCurate.create?", e)
    }

  /** None when the frame is empty (an empty max aggregate is NULL). */
  private def maxIdOf(df: DataFrame): Option[Long] = {
    val r = df.agg(max(col("doc_id"))).head()
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  /** Initialize the pipeline state from the history corpus: digest index +
    * band index over the history's stage-2 survivors, plus the id
    * watermark. (The history's own kept set is whatever a one-shot
    * `curate`-style run decided — state only needs the survivor relation.) */
  def create(history: DataFrame, prefix: String, conf: Conf = Conf()): Unit = {
    val spark = history.sparkSession
    val surv = gatedDeduped(history).persist()
    try {
      IndexIO.create(digestRelation(surv), digestTable(prefix), "dkey",
        conf.numBuckets, Seq("num_buckets" -> conf.numBuckets,
          "threshold_pm" -> math.round(conf.nearDupThreshold * 1000).toInt))
      BandIndex.create(surv, "doc_id", "text", bandTable(prefix),
        BandIndex.Conf(conf.shingleSize, conf.numHashes, conf.bands, conf.numBuckets))
      // watermark over the RAW history ids; an EMPTY history bootstraps at
      // Long.MinValue (a fresh pipeline with no indexed past is legitimate)
      writeState(spark, prefix, maxIdOf(history).getOrElse(Long.MinValue))
    } finally surv.unpersist(blocking = false)
  }

  /** Curate one id-monotone batch against the persisted state. Returns ONE
    * row per batch doc: (doc_id, lang, source, digest, toks, quality_ok,
    * exact_kept, fuzzy_kept, clean, kept) — `kept` is the stage-1..3
    * survivor flag, equal to the one-shot union run restricted to the
    * batch (see the object doc). Appends the batch's stage-2 survivors to
    * the state AFTER computing the flags (the batch must not see itself as
    * history). `historyTexts` supplies (doc_id, text) for the exact-Jaccard
    * verify of candidate pairs only — at corpus scale a bucketed point
    * lookup against the corpus store, not a re-scan.
    * `updateState = false` computes the flags WITHOUT appending the batch
    * (a dry-run / re-run surface; the driver query and bench use it so
    * repeated invocations stay idempotent).
    * Flag attribution: `quality_ok` is strictly per-doc (a quality doc that
    * loses the within-batch digest race reads quality_ok=true,
    * exact_kept=false). An EMPTY batch is a defined no-op (zero rows, no
    * state mutation). */
  def curateBatch(batch: DataFrame, historyTexts: DataFrame, benchDocs: DataFrame,
                  prefix: String, updateState: Boolean = true): DataFrame = {
    val spark = batch.sparkSession
    val conf = IndexIO.readConf(spark, digestTable(prefix), "IncrementalCurate.create")
    val threshold = conf("threshold_pm") / 1000.0
    val watermark = readMaxId(spark, prefix)
    // per-doc stage-1 view of the WHOLE batch: quality is per-doc, so the
    // flag must not depend on the within-batch dedup race (a quality doc
    // that loses the digest race is an exact_kept=false drop, not a
    // quality_ok=false one)
    val base = batch.select(col("doc_id"), col("lang"), col("source"),
      md5(col("text")).as("digest"),
      TextFunctions.tokenCount(col("text")).cast("long").as("toks"),
      TextFunctions.isQuality(col("text")).as("quality_ok"))
    val batchMinRow = batch.agg(min(col("doc_id"))).head()
    if (batchMinRow.isNullAt(0)) {
      // empty batch (a quiet crawl day): a defined no-op, not an NPE —
      // no flags, no state mutation
      return base
        .withColumn("exact_kept", lit(false)).withColumn("fuzzy_kept", lit(false))
        .withColumn("clean", lit(false)).withColumn("kept", lit(false))
    }
    val batchMin = batchMinRow.getLong(0)
    require(batchMin > watermark,
      s"IncrementalCurate: batch ids must be monotone above the indexed history " +
        s"(batch min $batchMin <= indexed max $watermark) — out-of-order ids would " +
        "require revoking history decisions (see scaladoc)")

    val surv = gatedDeduped(batch).persist()
    try {
      // stage 2b: exact dedup vs the persisted digest index — semi-join on
      // the 8-byte key (stored side shuffle-free), exact digest equality
      // verifies away xxhash64 collisions. The duplicate-id set is pinned
      // eagerly (round 7): `fresh` is consumed four ways below (band
      // search, fresh-id set, decontamination input, final flag join), and
      // un-pinned each consumption re-ran this index join
      val idx = Bucketing.readTable(spark, digestTable(prefix))
      val dupIds = digestRelation(surv).select(col("dkey"), col("digest"), col("doc_id"))
        .join(idx.select(col("dkey"), col("digest").as("h_digest")), Seq("dkey"))
        .filter(col("digest") === col("h_digest"))
        .select(col("doc_id")).distinct()
        .withColumn("__dup", lit(true))
        .localCheckpoint(true)
      val fresh = surv.join(dupIds, Seq("doc_id"), "left")
        .withColumn("exact_kept", col("__dup").isNull).drop("__dup")

      // stage 2c: fuzzy near-dup vs the persisted band index; only the
      // exact-kept batch docs participate (the one-shot pair graph is over
      // stage-2 survivors)
      val freshOnly = fresh.filter(col("exact_kept"))
      val pairs = BandIndex.incrementalPairs(freshOnly, historyTexts,
        "doc_id", "text", bandTable(prefix), threshold = threshold)
        .persist()
      val fuzzyDrop =
        try fuzzyDropSet(spark, pairs, freshOnly, watermark)
        finally pairs.unpersist(blocking = false)

      // stage 3: decontamination, FUSED into the flag projection (round 7):
      // the collected-bench path of Corpus.decontaminate is a pure per-row
      // bloom-gate expression, so running it over the whole flagged frame
      // with the flags as passthrough needs NO extra join or extra
      // evaluation of `fresh`; clean = fuzzy_kept && !contaminated
      // reproduces the old survivors-only left join exactly (non-survivors
      // read clean = false either way)
      val flagged = fresh
        .join(fuzzyDrop, Seq("doc_id"), "left")
        .withColumn("fuzzy_kept", col("exact_kept") && col("__fd").isNull)
        .drop("__fd")
      val withClean = Corpus.decontaminate(
          flagged, benchDocs, "doc_id", "text", n = 8,
          passthrough = Seq("exact_kept", "fuzzy_kept"))
        .select(col("doc_id"), col("exact_kept"), col("fuzzy_kept"),
          (col("fuzzy_kept") && !col("contaminated")).as("clean"))
      val flags = base
        .join(withClean, Seq("doc_id"), "left")
        .withColumn("exact_kept", coalesce(col("exact_kept"), lit(false)))
        .withColumn("fuzzy_kept", coalesce(col("fuzzy_kept"), lit(false)))
        .withColumn("clean", coalesce(col("clean"), lit(false)))
        .withColumn("kept", col("quality_ok") && col("exact_kept") &&
          col("fuzzy_kept") && col("clean"))
      // pin BEFORE a state append mutates the tables this plan reads; the
      // read-only path (updateState = false) skips the materialization —
      // nothing below changes what the lazy plan would see
      val out = if (updateState) flags.localCheckpoint(true) else flags

      // state append: the batch's stage-2 survivors become history (the
      // probed idempotent path shared with appendBatch)
      if (updateState) {
        appendSurv(spark, surv, prefix, conf,
          math.max(watermark, maxIdOf(batch).getOrElse(watermark)))
      }
      out
    } finally surv.unpersist(blocking = false)
  }

  /** The fuzzy-stage DROP set: (doc_id, __fd=true) for every exact-kept
    * batch doc that loses the anchored-component decision (see the object
    * doc). Round 7 — bounded driver fast path, the connectedComponents
    * limit-probe pattern: the drop set is a pure function of the PAIR list
    * (drops ⊆ pair endpoints; a doc in no pair is trivially kept), and
    * under the monotone-id contract an endpoint is a batch doc iff its id
    * is above the watermark — so when the pair list fits the bounded
    * driver budget (2^20 edges), one collect over the ALREADY-PERSISTED
    * pairs replaces the ~6 tiny-data join/checkpoint jobs of the
    * distributed path (each ~100ms of fixed overhead at batch scale).
    * Above the bound: the distributed anchored-component joins, unchanged.
    * Labels are identical — PipelineSpec pins the one-shot equivalence and
    * the path split is exercised by the existing suites (sf fixtures take
    * the driver path; maxDriverEdges = 0 in CC specs keeps the distributed
    * machinery covered). */
  private[graft] def fuzzyDropSet(spark: SparkSession, pairs: DataFrame,
                                     freshOnly: DataFrame, watermark: Long,
                                     maxDriverEdges: Long = 1L << 20): DataFrame = {
    import spark.implicits._
    val lim = (math.min(maxDriverEdges, (Int.MaxValue - 2).toLong) + 1L).toInt
    val probe = pairs.select(col("id_a"), col("id_b")).limit(lim).collect()
    if (probe.length < lim) {
      // driver union-find over batch-batch edges, min-id roots; anchored =
      // a batch endpoint of any batch-history pair
      val parent = new scala.collection.mutable.LongMap[Long]()
      def add(x: Long): Unit = if (!parent.contains(x)) parent(x) = x
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      val anchored = scala.collection.mutable.Set[Long]()
      probe.foreach { e =>
        val a = e.getLong(0); val b = e.getLong(1)
        val aNew = a > watermark; val bNew = b > watermark
        if (aNew && bNew) {
          add(a); add(b)
          val ra = find(a); val rb = find(b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        } else if (aNew) { add(a); anchored += a }
        else if (bNew) { add(b); anchored += b }
      }
      val anchoredReps = anchored.map(find)
      val drops = parent.keysIterator.filter { n =>
        val r = find(n)
        anchoredReps.contains(r) || n != r
      }.toSeq
      drops.map(d => (d, true)).toDF("doc_id", "__fd")
    } else {
      val freshIds = freshOnly.select(col("doc_id")).persist()
      try {
        val aNew = pairs.join(freshIds.withColumnRenamed("doc_id", "id_a"), Seq("id_a"), "left_semi")
        val abNew = aNew.join(freshIds.withColumnRenamed("doc_id", "id_b"), Seq("id_b"), "left_semi")
        // anchored = batch doc with ANY history-side neighbor
        val anchored = pairs
          .select(col("id_a").as("doc_id"), col("id_b").as("other"))
          .unionByName(pairs.select(col("id_b").as("doc_id"), col("id_a").as("other")))
          .join(freshIds, Seq("doc_id"), "left_semi")
          .join(freshIds.withColumnRenamed("doc_id", "other"), Seq("other"), "left_anti")
          .select(col("doc_id")).distinct()
        // components over BATCH-BATCH edges (plus singletons implicitly):
        // a doc drops iff its component is anchored or it is not the min
        val comp = Dedup.connectedComponents(
          abNew.select(col("id_a"), col("id_b")))
        val compAll = freshIds
          .join(comp, Seq("doc_id"), "left")
          .withColumn("rep", coalesce(col("rep"), col("doc_id")))
        val anchoredReps = compAll.join(anchored, Seq("doc_id"), "left_semi")
          .select(col("rep")).distinct().withColumn("__anch", lit(true))
        compAll.join(anchoredReps, Seq("rep"), "left")
          .filter(!(col("__anch").isNull && col("doc_id") === col("rep")))
          .select(col("doc_id"), lit(true).as("__fd"))
          .localCheckpoint(true) // CC is eager anyway; pin the small drop set
      } finally freshIds.unpersist(blocking = false)
    }
  }

  /** The state-append half of [[curateBatch]] ALONE — for deployments that
    * persist the flag relation BEFORE advancing state, so a crash between
    * the two is resumable instead of wedged ([[IncrementalCuratePipeline]]:
    * flags written + state behind → re-run appends only; flags written +
    * state advanced → no-op). Same monotonicity guard; empty batch is a
    * no-op.
    *
    * IDEMPOTENT at sub-step granularity: each index append is a committed
    * Spark write job (all-or-nothing via the output-commit protocol), and
    * before appending, each index is PROBED for the batch's max survivor
    * id — a resume after a crash between the two appends (or before the
    * watermark write) skips whichever halves already landed instead of
    * double-appending rows (duplicate band rows would silently inflate
    * bucket member lists toward the maxBucket truncation cap). The probe
    * predicate is on doc_id, which is monotone per append, so parquet
    * row-group stats prune all but the newest files. */
  def appendBatch(batch: DataFrame, prefix: String): Unit = {
    val spark = batch.sparkSession
    val conf = IndexIO.readConf(spark, digestTable(prefix), "IncrementalCurate.create")
    val watermark = readMaxId(spark, prefix)
    maxIdOf(batch).foreach { mx =>
      val mn = batch.agg(min(col("doc_id"))).head().getLong(0)
      require(mn > watermark,
        s"IncrementalCurate.appendBatch: batch ids must be monotone above the " +
          s"indexed history (batch min $mn <= indexed max $watermark)")
      val surv = gatedDeduped(batch).persist()
      try appendSurv(spark, surv, prefix, conf, math.max(watermark, mx))
      finally surv.unpersist(blocking = false)
    }
  }

  /** The shared probed append (see [[appendBatch]]'s idempotency note). */
  private def appendSurv(spark: SparkSession, surv: DataFrame, prefix: String,
                         conf: Map[String, Int], newWatermark: Long): Unit = {
    maxIdOf(surv).foreach { probeId =>
      def has(table: String): Boolean =
        Bucketing.readTable(spark, table)
          .filter(col("doc_id") === probeId).limit(1).count() > 0
      if (!has(digestTable(prefix))) {
        IndexIO.append(digestRelation(surv), digestTable(prefix), "dkey",
          conf("num_buckets"))
      }
      if (!has(bandTable(prefix))) {
        BandIndex.append(surv, "doc_id", "text", bandTable(prefix))
      }
    }
    writeState(spark, prefix, newWatermark)
  }

  /** The indexed-id watermark (max doc_id the state has absorbed). */
  def indexedMaxId(spark: SparkSession, prefix: String): Long =
    readMaxId(spark, prefix)

  /** Rewrite both indexes one-file-per-bucket (post-append maintenance). */
  def compactTo(spark: SparkSession, from: String, to: String): Unit = {
    IndexIO.compactTo(spark, digestTable(from), digestTable(to), "dkey")
    BandIndex.compactTo(spark, bandTable(from), bandTable(to))
    writeState(spark, to, readMaxId(spark, from))
  }

  /** Whether state exists under `prefix` (the create-vs-curate decision of
    * a scheduled deployment). */
  def exists(spark: SparkSession, prefix: String): Boolean =
    spark.catalog.tableExists(stateTable(prefix))

  def drop(spark: SparkSession, prefix: String): Unit = {
    IndexIO.drop(spark, digestTable(prefix))
    BandIndex.drop(spark, bandTable(prefix))
    Bucketing.dropTable(spark, stateTable(prefix))
  }
}

/** spark-submit entry point for the DAILY-BATCH deployment — the
  * [[CuratePipeline]] lineage/metrics pattern applied to
  * [[IncrementalCurate]].
  *
  * Usage: IncrementalCuratePipeline <batchParquet> <historyParquet>
  *        <benchParquet> <statePrefix> <outDir>
  *
  * First run (no state under `statePrefix`): initializes the state from
  * <historyParquet> and exits — run again with the first batch. Every
  * later run computes the per-doc flag relation READ-ONLY, writes it to
  * <outDir>/flags, and only THEN appends the batch to the state — so a
  * crash at any point is resumable, never wedged: flags missing → full
  * re-run; flags written but state behind the batch's max id → re-run
  * appends only (the appends themselves are probed-idempotent); both done
  * → no-op. Every run — create, process, resume, no-op — appends ONE
  * metrics row (event, per-stage counts, total wall ms) to
  * <outDir>/metrics. Use a FRESH outDir per batch (flags for a different
  * batch in the same outDir fail loudly instead of being skipped).
  * <historyParquet> must be the accumulated corpus store (ids unique,
  * monotone across batches) — it supplies the texts for the
  * candidate-pair verify. */
object IncrementalCuratePipeline {
  def main(args: Array[String]): Unit = {
    require(args.length == 5,
      "usage: IncrementalCuratePipeline <batchParquet> <historyParquet> " +
        "<benchParquet> <statePrefix> <outDir>")
    val Array(batchPath, historyPath, benchPath, prefix, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-curate-incremental")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, batchPath, historyPath, benchPath, prefix, outDir)
    spark.stop()
  }

  /** Returns the (stage, count) lineage it recorded — for tests; the
    * durable record is <outDir>/metrics (one row PER RUN: the stage counts
    * come out of one fused flag job, so a per-stage wall would be
    * fiction — wall_ms is the run total; create/resume/no-op runs write
    * their own row too, so monitoring keyed on metrics sees every run). */
  def run(spark: SparkSession, batchPath: String, historyPath: String,
          benchPath: String, prefix: String, outDir: String): Seq[(String, Long)] = {
    import spark.implicits._
    val t0 = System.currentTimeMillis()
    def record(event: String, lineage: Seq[(String, Long)]): Seq[(String, Long)] = {
      val m = lineage.toMap
      // ADVICE (round 7): create/resume_append lineage counts previously
      // wrote under keys this builder never read, so their metrics rows
      // persisted 0 for every column and the computed count survived only
      // in stdout — fold them into the 'batch' column
      val batchCount = m.getOrElse("batch",
        m.getOrElse("create", m.getOrElse("resume_append", 0L)))
      Seq((event, batchCount, m.getOrElse("quality_ok", 0L),
        m.getOrElse("exact_kept", 0L), m.getOrElse("fuzzy_kept", 0L),
        m.getOrElse("kept", 0L), System.currentTimeMillis() - t0))
        .toDF("event", "batch", "quality_ok", "exact_kept", "fuzzy_kept",
          "kept", "wall_ms")
        .write.mode("append").parquet(s"$outDir/metrics")
      lineage.foreach { case (st, n) => println(s"[curate-incr] $st: $n") }
      lineage
    }
    if (!IncrementalCurate.exists(spark, prefix)) {
      // half-present state (conf tables without the state table) means a
      // crash inside create() or a manually broken warehouse — rebuilding
      // silently from historyParquet would discard appended batches and
      // the original Conf; demand an explicit drop instead
      require(!spark.catalog.tableExists(
        graft.spark.dedup.IndexIO.confTable(s"${prefix}__digests")),
        s"incremental-curate state '$prefix' is PARTIALLY present (index conf " +
          "without the state table) — refusing to silently re-initialize; " +
          "IncrementalCurate.drop() it explicitly if a rebuild is intended")
      val history = spark.read.parquet(historyPath)
      IncrementalCurate.create(history, prefix)
      println(s"[curate-incr] state '$prefix' initialized from $historyPath — " +
        "run again with the first batch")
      return record("create", Seq(("create", history.count())))
    }
    val flagsDir = s"$outDir/flags"
    val success = new org.apache.hadoop.fs.Path(flagsDir, "_SUCCESS")
    val flagsDone =
      success.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(success)
    val batch = spark.read.parquet(batchPath)
    if (flagsDone) {
      // persisted flags must belong to THIS batch — a reused outDir with a
      // previous batch's flags would otherwise skip flag computation
      // entirely and advance the state past the new batch (unrecoverable).
      // Round 7 (ADVICE): id boundaries alone cannot tell a REGENERATED
      // batch file with the same id range apart — compare row count and an
      // order-free content fingerprint (xor of xxhash64(doc_id, digest):
      // commutative, so any row order/partitioning fingerprints equally;
      // both sides carry digest = md5(text), so changed content flips it)
      val persisted = spark.read.parquet(flagsDir)
      def identity(df: DataFrame, digest: org.apache.spark.sql.Column)
          : org.apache.spark.sql.Row =
        df.select(col("doc_id"), xxhash64(col("doc_id"), digest).as("__h"))
          .agg(min(col("doc_id")), max(col("doc_id")), count(lit(1)),
            coalesce(expr("bit_xor(__h)"), lit(0L)).as("fp")).head()
      val pIds = identity(persisted, col("digest"))
      val bIds = identity(batch, md5(col("text")))
      require(pIds.isNullAt(0) == bIds.isNullAt(0) &&
        (pIds.isNullAt(0) || (pIds.getLong(0) == bIds.getLong(0) &&
          pIds.getLong(1) == bIds.getLong(1) &&
          pIds.getLong(2) == bIds.getLong(2) &&
          pIds.getLong(3) == bIds.getLong(3))),
        s"$flagsDir holds flags for a DIFFERENT batch (flag identity " +
          s"(min,max,count,fp) $pIds vs batch $bIds) — each batch needs its own outDir")
      // flags persisted — finish the state append if a crash interrupted it
      if (!bIds.isNullAt(1) &&
        bIds.getLong(1) > IncrementalCurate.indexedMaxId(spark, prefix)) {
        IncrementalCurate.appendBatch(batch, prefix)
        println(s"[curate-incr] resumed: state append completed for $flagsDir")
        return record("resume_append", Seq(("resume_append", batch.count())))
      }
      println(s"[curate-incr] $flagsDir already processed and state current — no-op")
      record("noop", Seq.empty)
      return Seq.empty
    }
    val history = spark.read.parquet(historyPath)
    val bench = spark.read.parquet(benchPath).select(col("text"))
    val flags = IncrementalCurate.curateBatch(batch, history, bench, prefix,
      updateState = false)
    flags.write.mode("overwrite").parquet(flagsDir)
    IncrementalCurate.appendBatch(batch, prefix)
    // ONE aggregation job over the persisted flags for every stage count
    val c = spark.read.parquet(flagsDir).agg(
      count(lit(1)).as("batch"),
      sum(when(col("quality_ok"), 1L).otherwise(0L)).as("quality_ok"),
      sum(when(col("exact_kept"), 1L).otherwise(0L)).as("exact_kept"),
      sum(when(col("fuzzy_kept"), 1L).otherwise(0L)).as("fuzzy_kept"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("kept")).head()
    val lineage = Seq("batch", "quality_ok", "exact_kept", "fuzzy_kept", "kept")
      .zipWithIndex.map { case (st, i) =>
        (st, if (c.isNullAt(i)) 0L else c.getLong(i))
      }
    record("process", lineage)
  }
}
