package graft.spark.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.spark.aggs.SketchUdafs

/** Structured-Streaming sketch aggregation.
  *
  * The reference's stream-oriented structures map onto event-time windows:
  *   - `RotatingBloomFilter` (count-based sliding window of sub-blooms,
  *     expandingbloom.py:250-370) → one Bloom per event-time window, old
  *     windows expiring via watermark — rotation is window expiry;
  *   - `StreamThreshold` / `HeavyHitters` → windowed CMS-backed aggregates;
  *   - `ExpandingBloomFilter` growth → the aggregator buffer grows inside
  *     the window's state.
  *
  * Because every sketch aggregator is an associative+commutative udaf, it
  * rides Spark's incremental aggregation state store directly — no custom
  * `flatMapGroupsWithState` needed for these shapes.
  */
object StreamingSketches {

  /** Per-window, per-key sketch battery over a stream:
    * tumbling `windowDur` windows on `tsCol` with `watermarkDelay` lateness,
    * building a Bloom (the rotating-bloom analogue), an HLL distinct count,
    * and a CMS heavy-hitter map per window. */
  def windowedSketches(events: DataFrame, tsCol: String, keyCol: String,
                       windowDur: String = "1 hour",
                       watermarkDelay: String = "10 minutes",
                       bloomEst: Long = 100000L): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur).as("win"))
      .agg(
        SketchUdafs.bloom(bloomEst, 0.01)(col(keyCol)).as("bloom"),
        SketchUdafs.hllCount(12)(col(keyCol)).as("distinct_keys"),
        SketchUdafs.heavyHitters(5, 2048, 5)(col(keyCol), lit(1L)).as("top_keys"),
        count(lit(1)).as("n_events"))
      .select(col("win.start").as("window_start"), col("win.end").as("window_end"),
        col("bloom"), col("distinct_keys"), col("top_keys"), col("n_events"))

  /** Stream-threshold shape: keys whose running windowed count crosses the
    * threshold (the StreamThreshold dict, per window). */
  def windowedThreshold(events: DataFrame, tsCol: String, keyCol: String,
                        threshold: Long, windowDur: String = "1 hour",
                        watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur).as("win"))
      .agg(SketchUdafs.streamThreshold(threshold, 4096, 5)(col(keyCol), lit(1L)).as("meets"))
      .select(col("win.start").as("window_start"), explode(col("meets")).as(Seq("key", "est_count")))
}
