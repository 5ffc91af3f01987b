package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the deterministic q_bpe_merge ground truth (per-lang
  * merged-token totals over the synthetic pages fixture, seed 42) as the
  * VALUES literals pasted into [[graft.SparkEntry.oracleSql]]. Rerun after
  * ANY change to [[graft.spark.text.BpeTokenizer]] (training corpus, merge
  * count, learning tie-breaks) or PagesGen. Also prints the first merges and
  * pinned-string goldens for BpeSpec. */
object BpeTruth {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000L
    val bpe = graft.spark.text.BpeTokenizer.standard
    println(s"merges=${bpe.merges.length}")
    println("first 12 merges: " + bpe.merges.take(12).map { case (a, b) => s"'$a'+'$b'" }
      .mkString(", "))
    Seq("the quick brown fox jumps over the lazy dog",
      "counting structures summarize the stream",
      "internationalization", "ключ-123 zh 中文 test").foreach { s =>
      println(s"countText(\"$s\") = ${bpe.countText(s)}  pieces=" +
        bpe.encodeText(s).mkString("|"))
    }
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = graft.spark.VerifiedQueries.bpeMergeVerified(spark, n)
      .orderBy("lang").collect()
    println("-- q_bpe_merge oracle literals --")
    rows.zipWithIndex.foreach { case (r, i) =>
      val cast = if (i == 0) s"('${r.getString(0)}', CAST(${r.getLong(1)} AS BIGINT), " +
        s"CAST(${r.getLong(2)} AS BIGINT), CAST(${r.getLong(3)} AS BIGINT), true, true), "
      else s"('${r.getString(0)}', ${r.getLong(1)}, ${r.getLong(2)}, ${r.getLong(3)}, true, true), "
      println(cast + s"  -- parity=${r.getBoolean(4)} bounds=${r.getBoolean(5)}")
    }
    val byteRows = graft.spark.VerifiedQueries.bpeByteMergeVerified(spark, n)
      .orderBy("lang").collect()
    println("-- q_bpe_bytes oracle literals --")
    byteRows.zipWithIndex.foreach { case (r, i) =>
      val cast = if (i == 0) s"('${r.getString(0)}', CAST(${r.getLong(1)} AS BIGINT), " +
        s"CAST(${r.getLong(2)} AS BIGINT), CAST(${r.getLong(3)} AS BIGINT), true, true, true), "
      else s"('${r.getString(0)}', ${r.getLong(1)}, ${r.getLong(2)}, ${r.getLong(3)}, " +
        "true, true, true), "
      println(cast + s"  -- parity=${r.getBoolean(4)} bounds=${r.getBoolean(5)} " +
        s"ge_cp=${r.getBoolean(6)}")
    }
    spark.stop()
  }
}
