package graft.tools
import org.apache.spark.sql.SparkSession
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      val rows = graft.spark.SparkQueries.annPqRecall(spark, dir)
        .orderBy("query_id").collect()
      println(s"$dir: " + rows.map(r => f"${r.getLong(0)}:${r.getDouble(1)}%.2f").mkString(" "))
    }
    spark.stop()
  }
}
