package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.spark.SparkQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory) to DataFrame
  * builders over the driver's parquet tables; `oracleSql` carries the DuckDB
  * oracle for every query whose output is exactly SQL-expressible. Sketch
  * estimates (HLL/CMS/KLL/t-digest/...) are not SQL-expressible — they get a
  * rows-only check here and full error-bound asserts in the ScalaTest suites.
  */
object SparkEntry {
  /** Flagship query on sf=0.001; driver smoke-checks rows>0: the full sketch
    * battery (HLL + Bloom + heavy hitters + KLL) over a deterministic
    * synthetic Common-Crawl-style pages table, one pass, grouped by lang. */
  def entry(spark: SparkSession): DataFrame =
    SparkQueries.pagesSketchBattery(spark, nPages = 20000L)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact-oracle queries
    "q_docs_stats" -> (SparkQueries.docsStats(_, _)),
    "q_dedup_exact" -> (SparkQueries.dedupExact(_, _)),
    "q_token_stats" -> (SparkQueries.tokenStats(_, _)),
    "q_quality" -> (SparkQueries.qualityStats(_, _)),
    "q_fingerprint_md5" -> (SparkQueries.fingerprintMd5(_, _)),
    "q_heavy_domains_exact" -> (SparkQueries.heavyDomainsExact(_, _)),
    "q_events_hourly" -> (SparkQueries.eventsHourly(_, _)),
    "q_lineitem_pricing" -> (SparkQueries.lineitemPricing(_, _)),
    "q_bloom_semijoin" -> (SparkQueries.bloomSemiJoin(_, _)),
    "q_bloom_members" -> (SparkQueries.bloomMembers(_, _)),
    "q_cuckoo_members" -> (SparkQueries.cuckooMembers(_, _)),
    "q_qf_members" -> (SparkQueries.qfMembers(_, _)),
    "q_ebf_members" -> (SparkQueries.ebfMembers(_, _)),
    // sketch / approximate queries (rows-only driver check)
    "q_hll_distinct" -> (SparkQueries.hllDistinct(_, _)),
    "q_hll_native" -> (SparkQueries.hllDistinctNative(_, _)),
    "q_cms_heavy_hitters" -> (SparkQueries.cmsHeavyHitters(_, _)),
    "q_kll_quantiles" -> (SparkQueries.kllQuantiles(_, _)),
    "q_tdigest_quantiles" -> (SparkQueries.tdigestQuantiles(_, _)),
    "q_cbf_counts" -> (SparkQueries.cbfCounts(_, _)),
    "q_stream_threshold" -> (SparkQueries.streamThreshold(_, _)),
    "q_ebf_stats" -> (SparkQueries.ebfStats(_, _)),
    "q_minhash_pairs" -> (SparkQueries.minhashPairs(_, _)),
    "q_simhash_pairs" -> (SparkQueries.simhashPairs(_, _)),
    "q_ann_topk" -> (SparkQueries.annBruteForce(_, _)),
    "q_ann_lsh_recall" -> (SparkQueries.annLshRecall(_, _)),
    "q_ann_ivf_recall" -> (SparkQueries.annIvfRecall(_, _)),
    "q_lang_id" -> (SparkQueries.langIdAccuracy(_, _)),
    "q_fingerprint_rolling" -> (SparkQueries.fingerprintRolling(_, _)),
    "q_ccf_counts" -> (SparkQueries.ccfCounts(_, _)),
    "q_salted_hll" -> (SparkQueries.saltedDistinctUsers(_, _)),
    "q_multimodal" -> ((s, _) => SparkQueries.multimodalFeatures(s, 2000L)),
    "q_pages_battery" -> ((s, _) => SparkQueries.pagesSketchBattery(s, 20000L)),
  )

  def oracleSql: Map[String, String] = Map(
    "q_docs_stats" ->
      ("SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars " +
        "FROM documents GROUP BY lang"),
    "q_dedup_exact" ->
      ("SELECT lang, CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts " +
        "FROM documents GROUP BY lang"),
    "q_token_stats" ->
      ("SELECT lang, CAST(SUM(toks) AS BIGINT) AS total_tokens, " +
        "CAST(MAX(toks) AS BIGINT) AS max_tokens, COUNT(*) AS n_docs FROM (" +
        "SELECT lang, CASE WHEN trim(text) = '' THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS toks " +
        "FROM documents) GROUP BY lang"),
    "q_quality" ->
      ("SELECT lang, CAST(SUM(CASE WHEN n >= 20 AND n <= 20000 AND punct * 1000 <= n * 300 " +
        "AND toks >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality, COUNT(*) AS n_docs FROM (" +
        "SELECT lang, length(text) AS n, " +
        "length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS punct, " +
        "CASE WHEN trim(text) = '' THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS toks " +
        "FROM documents) GROUP BY lang"),
    "q_fingerprint_md5" ->
      "SELECT doc_id, md5(text) AS fp FROM documents",
    "q_heavy_domains_exact" ->
      ("SELECT lang, source, n_docs, rk FROM (" +
        "SELECT lang, source, COUNT(*) AS n_docs, " +
        "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, source) AS rk " +
        "FROM documents GROUP BY lang, source) WHERE rk <= 3"),
    "q_events_hourly" ->
      ("SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n_events, " +
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events GROUP BY 1, 2"),
    "q_lineitem_pricing" ->
      ("SELECT l_returnflag, l_linestatus, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty, " +
        "COUNT(*) AS n_rows FROM lineitem GROUP BY l_returnflag, l_linestatus"),
    "q_bloom_semijoin" ->
      ("SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders WHERE o_custkey IN " +
        "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') " +
        "GROUP BY o_orderpriority"),
    "q_bloom_members" ->
      "SELECT doc_id FROM documents WHERE lang = 'en'",
    "q_cuckoo_members" ->
      "SELECT doc_id FROM documents WHERE lang = 'de'",
    "q_qf_members" ->
      "SELECT doc_id FROM documents WHERE lang = 'fr'",
    "q_ebf_members" ->
      "SELECT doc_id FROM documents WHERE lang = 'es'",
  )
}
