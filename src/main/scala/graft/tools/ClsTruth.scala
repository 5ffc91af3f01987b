package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: regenerate q_classifier's per-lang literal oracle (the
  * q_lang_id pattern — measured, not assumed). Prints the exact VALUES rows
  * for SparkEntry.oracleSql. Rerun after ANY change to QualityClassifier's
  * training math, the hashed-feature kernel, or the LangEval fixture.
  * The literal is stable because training is BYTE-DETERMINISTIC (exact-Long
  * gradient aggregation — QualityClassifierSpec pins run-to-run and
  * repartitioning invariance). */
object ClsTruth {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = graft.spark.VerifiedQueries.classifierVerified(spark)
      .orderBy("lang").collect()
    println("q_classifier oracle VALUES rows:")
    rows.zipWithIndex.foreach { case (r, i) =>
      val cast = if (i == 0) s"CAST(${r.getLong(1)} AS BIGINT), CAST(${r.getLong(2)} AS BIGINT)"
                 else s"${r.getLong(1)}, ${r.getLong(2)}"
      println(s"('${r.getString(0)}', $cast),")
    }
    spark.stop()
  }
}
