package graft.spark

import org.apache.spark.sql.DataFrame

/** Scan-parallelism floor (guide §2.5 "one huge unsplittable file" /
  * §6 input-split sizing, made size-ADAPTIVE rather than config-tuned).
  *
  * The driver's fixture tables are single-file, single-ROW-GROUP parquet —
  * and a parquet row group is the unit of scan parallelism, so every
  * per-row kernel downstream of such a scan (md5, minhash banding, simhash,
  * quality gates, classifier features) otherwise runs as ONE task no matter
  * the core count. [[ensureParallel]] round-robin-repartitions a frame up
  * to the session's default parallelism ONLY when its physical plan yields
  * fewer partitions: on real multi-split inputs (any corpus at scale) the
  * condition is false and NO exchange is added, so this is not a local-mode
  * constant — it derives from the input's actual layout, and the cost on
  * the small-input path is one shuffle of the raw rows (hundreds of KB
  * here) against a 10-30x parallelization of the kernel work.
  *
  * Call it on EXCHANGE-FREE frames only (scans / selects / filters /
  * unions of scans): partition-count inspection plans the frame, and under
  * AQE a frame with an exchange below would materialize query stages.
  * Callers must be partition-invariant in RESULT — true for every use
  * (exact aggregates, per-row kernels, content-keyed shuffles, integer-
  * quantized gradient sums); the sketch-estimate aggregations (KLL,
  * t-digest, Lloyd centroid sums) deliberately do NOT use it, because
  * their floating-point merge states vary with partitioning.
  */
object Parallelism {
  def ensureParallel(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions < target) df.repartition(target)
    else df
  }
}
