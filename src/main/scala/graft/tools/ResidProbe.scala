package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Calibration tool: mean squared reconstruction error of the PQ codes with
  * and without residual encoding — and with/without the round-5 OPQ
  * rotation — over the embeddings fixture. Documents the
  * measured finding behind Ann.ivfPqTopK's residual caveat: on isotropic
  * vectors the residual carries ~2x the unit energy (‖nv−c‖² = 2(1−cos)),
  * so residual codes reconstruct WORSE (0.043 vs 0.032 at sf0.01) — the
  * refine stage, not residual encoding, is what restores recall there. */
object ResidProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getSeq[Float](1).toArray)
    val dim = 64; val m = 16; val ksub = 256; val nlist = 16
    def normalize(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (n == 0) v else v.map(x => (x / n).toFloat)
    }
    val nvs = emb.map(normalize)
    // centroids: spherical k-means like trainCoarseCentroids but local
    var cents = nvs.take(nlist).map(_.clone())
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
    }
    def assign(v: Array[Float]): Int = {
      var best = 0; var bs = Double.NegativeInfinity
      var c = 0
      while (c < nlist) { val s = cos(v, cents(c)); if (s > bs) { bs = s; best = c }; c += 1 }
      best
    }
    (0 until 3).foreach { _ =>
      val sums = Array.fill(nlist)(new Array[Double](dim))
      val cnt = new Array[Long](nlist)
      nvs.foreach { v =>
        val c = assign(v); cnt(c) += 1
        var i = 0; while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (cnt(c) == 0) old
        else {
          val n = math.sqrt(sums(c).map(x => x * x).sum)
          if (n == 0) old else sums(c).map(x => (x / n).toFloat)
        }
      }
    }
    val sample = nvs.take(4096)
    def targetsOf(residual: Boolean, vs: Array[Array[Float]]): Array[Array[Float]] =
      if (!residual) vs else vs.map { nv =>
        val c = cents(assign(nv))
        Array.tabulate(dim)(i => nv(i) - c(i))
      }
    def mse(residual: Boolean, opq: Boolean): Double = {
      import graft.spark.ann.Opq
      val trainT = targetsOf(residual, sample)
      val rot = if (opq) Some(Opq.learnRotation(trainT, dim, m, ksub, opqIters = 8)) else None
      val train = rot.map(r => trainT.map(Opq.rotate(r, _))).getOrElse(trainT)
      val books = graft.spark.ann.Ann.trainCodebooks(train, dim, m, ksub, 5)
      val all = targetsOf(residual, nvs)
      val pts = rot.map(r => all.map(Opq.rotate(r, _))).getOrElse(all)
      Opq.reconstructionMse(pts, books, dim, m)
    }
    println(f"n=${nvs.length} mse_simple=${mse(false, false)}%.5f mse_residual=${mse(true, false)}%.5f " +
      f"mse_simple_opq=${mse(false, true)}%.5f mse_residual_opq=${mse(true, true)}%.5f")
    spark.stop()
  }
}
