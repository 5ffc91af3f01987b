package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.spark.ann.{Ann, IvfPqModel, Opq}

/** OPQ rotation (Ge et al., CVPR 2013 — round-5): the from-scratch
  * Procrustes/Jacobi solver must recover a known rotation exactly; the
  * learned rotation must be orthogonal and must not increase PQ
  * reconstruction error (and must strictly reduce it on subspace-misaligned
  * data — the case OPQ exists for); the v2 model codec must round-trip the
  * rotation while v1 images stay loadable.
  */
class OpqSpec extends AnyFunSuite {

  private def matMulVec(r: Array[Array[Double]], v: Array[Float]): Array[Float] =
    r.map(row => row.zip(v).map { case (a, b) => a * b }.sum.toFloat)

  private def randOrthogonal(n: Int, seed: Long): Array[Array[Double]] = {
    // a random matrix run through the Procrustes solver IS orthogonal
    // (R = V·Uᵀ) — but to avoid testing the solver with itself, build from
    // explicit Givens rotations instead
    val rng = new java.util.Random(seed)
    val r = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 0 until 4 * n) {
      val i = rng.nextInt(n)
      var j = rng.nextInt(n)
      while (j == i) j = rng.nextInt(n)
      val th = rng.nextDouble() * math.Pi * 2
      val c = math.cos(th); val s = math.sin(th)
      for (k <- 0 until n) {
        val a = r(i)(k); val b = r(j)(k)
        r(i)(k) = c * a - s * b
        r(j)(k) = s * a + c * b
      }
    }
    r
  }

  private def orthoErr(r: Array[Array[Double]]): Double = {
    val n = r.length
    (for (i <- 0 until n; j <- 0 until n) yield {
      val s = (0 until n).map(k => r(k)(i) * r(k)(j)).sum
      math.abs(s - (if (i == j) 1.0 else 0.0))
    }).max
  }

  test("procrustes recovers a planted rotation (R0·X target) exactly") {
    val n = 12
    val rng = new java.util.Random(3)
    val r0 = randOrthogonal(n, 17)
    // M = Σ x·yᵀ with y = R0·x over a full-rank point set: argmax tr(R·M)
    // is R0 itself
    val m = Array.fill(n)(new Array[Double](n))
    for (_ <- 0 until 200) {
      val x = Array.fill(n)(rng.nextGaussian().toFloat)
      val y = matMulVec(r0, x)
      for (a <- 0 until n; b <- 0 until n) m(a)(b) += x(a).toDouble * y(b)
    }
    val r = Opq.procrustes(m)
    assert(orthoErr(r) < 1e-9, s"solution must be orthogonal, err=${orthoErr(r)}")
    val diff = (for (i <- 0 until n; j <- 0 until n)
      yield math.abs(r(i)(j) - r0(i)(j))).max
    assert(diff < 1e-6, s"recovered rotation differs from planted by $diff")
  }

  test("procrustes handles a rank-deficient M (degenerate directions completed)") {
    val n = 6
    // rank-2 M
    val m = Array.fill(n)(new Array[Double](n))
    m(0)(0) = 3.0; m(1)(1) = 2.0
    val r = Opq.procrustes(m)
    assert(orthoErr(r) < 1e-9)
    // the defined directions must still be maximized: tr(R·M) = 5
    val tr = (0 until n).map(i => (0 until n).map(j => r(i)(j) * m(j)(i)).sum).sum
    assert(math.abs(tr - 5.0) < 1e-9, s"tr(R·M)=$tr, want 5")
  }

  /** Subspace-misaligned anisotropic fixture: strong variance directions
    * that straddle the PQ subspace split (the failure mode OPQ fixes). */
  private def misalignedPts(n: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val rng = new java.util.Random(seed)
    // two dominant directions spread across ALL coordinates
    val d1 = Array.tabulate(dim)(i => math.cos(0.7 * i))
    val d2 = Array.tabulate(dim)(i => math.sin(1.3 * i))
    Array.fill(n) {
      val a = rng.nextGaussian() * 2.0
      val b = rng.nextGaussian() * 1.2
      Array.tabulate(dim)(i => (a * d1(i) + b * d2(i) + rng.nextGaussian() * 0.05).toFloat)
    }
  }

  test("learned rotation is orthogonal and strictly cuts PQ error on misaligned data") {
    val dim = 16; val m = 8; val ksub = 4
    val pts = misalignedPts(600, dim, 11)
    val plainBooks = Ann.trainCodebooks(pts, dim, m, ksub, 5)
    val msePlain = Opq.reconstructionMse(pts, plainBooks, dim, m)

    val rot = Opq.learnRotation(pts, dim, m, ksub, opqIters = 8)
    val rotF = rot.map(_.map(_.toDouble))
    assert(orthoErr(rotF) < 1e-5, s"learned R not orthogonal: ${orthoErr(rotF)}")
    val rotPts = pts.map(Opq.rotate(rot, _))
    val opqBooks = Ann.trainCodebooks(rotPts, dim, m, ksub, 5)
    val mseOpq = Opq.reconstructionMse(rotPts, opqBooks, dim, m)
    assert(mseOpq < msePlain * 0.9,
      f"OPQ must strictly cut reconstruction error on misaligned data: " +
        f"plain=$msePlain%.5f opq=$mseOpq%.5f")
  }

  test("rotation preserves inner products (the search-semantics invariant)") {
    val dim = 16
    val rng = new java.util.Random(5)
    val pts = misalignedPts(50, dim, 23)
    val rot = Opq.learnRotation(pts, dim, m = 8, ksub = 4, opqIters = 3)
    for (_ <- 0 until 20) {
      val x = Array.fill(dim)(rng.nextGaussian().toFloat)
      val y = Array.fill(dim)(rng.nextGaussian().toFloat)
      val d0 = x.zip(y).map { case (a, b) => a.toDouble * b }.sum
      val rx = Opq.rotate(rot, x); val ry = Opq.rotate(rot, y)
      val d1 = rx.zip(ry).map { case (a, b) => a.toDouble * b }.sum
      assert(math.abs(d0 - d1) < 1e-3 * (1 + math.abs(d0)),
        s"inner product drifted: $d0 vs $d1")
    }
  }

  test("v2 codec round-trips the rotation; v1 images load with rotation=None") {
    val dim = 8; val m = 4
    val cents = Array.tabulate(3)(i => (i, Array.fill(dim)(i.toFloat)))
    val books = Array.fill(m)(Array.fill(4)(Array.fill(dim / m)(0.5f)))
    val rot = Array.tabulate(dim, dim)((i, j) => if (i == j) 1f else 0f)

    val v2 = IvfPqModel(dim, m, residual = true, cents, books, Some(rot))
    val v2back = IvfPqModel.fromBytes(v2.toBytes)
    assert(v2back.rotation.isDefined)
    assert(java.util.Arrays.equals(v2back.toBytes, v2.toBytes), "v2 codec fixpoint")
    assert(v2back.rotation.get.map(_.toSeq).toSeq == rot.map(_.toSeq).toSeq)

    val v1 = IvfPqModel(dim, m, residual = false, cents, books)
    val v1back = IvfPqModel.fromBytes(v1.toBytes)
    assert(v1back.rotation.isEmpty, "rotation-less image must stay v1")
    assert(java.util.Arrays.equals(v1back.toBytes, v1.toBytes), "v1 codec fixpoint")
  }

  test("end-to-end: pqTopK with OPQ ranks at least as well as plain PQ on misaligned data") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val dim = 16
    val pts = misalignedPts(400, dim, 31)
    val df = pts.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
      .toDF("vec_id", "embedding")
    val queries = df.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("q_embedding"))
    val exact = Ann.bruteForceTopK(df, queries, 5)
      .select($"query_id", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(opqIters: Int): Double = {
      val got = Ann.pqTopK(df, queries, 5, dim, m = 8, ksub = 4, opqIters = opqIters)
        .select($"query_id", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.count(exact.contains).toDouble / exact.size
    }
    val rPlain = recall(0)
    val rOpq = recall(6)
    assert(rOpq >= rPlain - 0.04,
      f"OPQ recall must not regress: plain=$rPlain%.2f opq=$rOpq%.2f")
    assert(rOpq > 0.2, f"OPQ path must retrieve real neighbors, got $rOpq%.2f")
  }
}
