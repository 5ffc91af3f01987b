package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the deterministic q_perplexity AND q_compress_ratio
  * ground truth (per-lang char-LM milli-bit / deflate-ratio totals over the
  * synthetic pages fixture, seed 42) as the VALUES literals pasted into
  * [[graft.SparkEntry.oracleSql]]. Rerun after ANY change to
  * [[graft.spark.text.CharLm]] (training corpus, order, backoff,
  * normalization), the compression kernel/plants, or PagesGen. Also prints
  * spot scores for BpeSpec-style goldens. */
object LmTruth {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000L
    val lm = graft.spark.text.CharLm.standard
    Seq("the quick movement of data through a large processing system",
      "counting structures trade a small known amount of error",
      "zq xvj qkz wxq jzv qxz kjq vzx",
      "MIXED Case   whitespace\t\truns").foreach { s =>
      println(s"bitsMilli(\"$s\") = ${lm.bitsMilli(s)}")
    }
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = graft.spark.VerifiedQueries.perplexityVerified(spark, n)
      .orderBy("lang").collect()
    println("-- q_perplexity oracle literals --")
    rows.zipWithIndex.foreach { case (r, i) =>
      val cast = if (i == 0) s"('${r.getString(0)}', CAST(${r.getLong(1)} AS BIGINT), " +
        s"CAST(${r.getLong(2)} AS BIGINT), CAST(${r.getLong(3)} AS BIGINT), true, true, true), "
      else s"('${r.getString(0)}', ${r.getLong(1)}, ${r.getLong(2)}, ${r.getLong(3)}, " +
        "true, true, true), "
      println(cast + s"  -- parity=${r.getBoolean(4)} positive=${r.getBoolean(5)} " +
        s"separation=${r.getBoolean(6)}")
    }
    val zRows = graft.spark.VerifiedQueries.compressRatioVerified(spark, n)
      .orderBy("lang").collect()
    println("-- q_compress_ratio oracle literals --")
    zRows.zipWithIndex.foreach { case (r, i) =>
      val cast = if (i == 0) s"('${r.getString(0)}', CAST(${r.getLong(1)} AS BIGINT), " +
        s"CAST(${r.getLong(2)} AS BIGINT), CAST(${r.getLong(3)} AS BIGINT), true, true, true), "
      else s"('${r.getString(0)}', ${r.getLong(1)}, ${r.getLong(2)}, ${r.getLong(3)}, " +
        "true, true, true), "
      println(cast + s"  -- parity=${r.getBoolean(4)} positive=${r.getBoolean(5)} " +
        s"separation=${r.getBoolean(6)}")
    }
    spark.stop()
  }
}
