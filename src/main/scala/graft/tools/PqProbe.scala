package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev tool: measured per-query recall of the PQ and IVFPQ paths at each SF
  * (picks the q_ann_*_recall thresholds honestly). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      Seq("pq" -> graft.spark.SparkQueries.annPqRecall _,
          "pq_opq" -> graft.spark.SparkQueries.annPqOpqRecall _,
          "ivfpq" -> graft.spark.SparkQueries.annIvfPqRecall _,
          // the IVF-exact ceiling: with the refine stage, ivfpq recall
          // should match this line (quantization error removed)
          "ivf_ceiling" -> graft.spark.SparkQueries.annIvfRecall _).foreach { case (name, fn) =>
        val rows = fn(spark, dir).orderBy("query_id").collect()
        println(s"$name $dir: " + rows.map(r => f"${r.getLong(0)}:${r.getDouble(1)}%.2f").mkString(" "))
      }
    }
    spark.stop()
  }
}
