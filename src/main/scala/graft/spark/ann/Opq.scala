package graft.spark.ann

/** Optimized Product Quantization — the learned orthogonal rotation that
  * minimizes PQ reconstruction error at a fixed byte budget (Ge, He, Ke &
  * Sun, "Optimized Product Quantization for Approximate Nearest Neighbor
  * Search", CVPR 2013 — public; the non-parametric Algorithm 1).
  *
  * PQ quantizes each dim/m-dim subspace independently, so its error depends
  * on how variance and correlation fall ACROSS the subspace split. An
  * orthogonal rotation R preserves all inner products and norms (search
  * semantics are unchanged — rotating query and corpus together is a
  * no-op for cosine) but re-mixes coordinates, so R can be CHOSEN to
  * decorrelate the split and balance per-subspace variance. The
  * non-parametric solution alternates two exact steps:
  *
  *   1. fix R: train PQ codebooks on the rotated points (Lloyd);
  *   2. fix the codebooks/assignments: the best orthogonal R for
  *      min ||R·X − Ŷ||_F (Ŷ = rotated-space reconstructions) is the
  *      orthogonal-Procrustes solution R = V·Uᵀ from the SVD
  *      X·Ŷᵀ = U·S·Vᵀ.
  *
  * Both steps monotonically decrease the quantization error, so the loop
  * converges; OpqSpec pins the monotone-improvement property and R's
  * orthogonality. The SVD is a from-scratch one-sided Jacobi (deterministic
  * fixed sweep order — no linalg dependency), fine at dim <= a few hundred.
  */
object Opq {

  /** Learn the OPQ rotation over training points (row-major, each length
    * `dim`): identity-initialized alternation, `opqIters` rounds of
    * (codebook re-train, Procrustes re-fit). Returns a row-major dim×dim
    * orthogonal matrix R; apply as y = R·x ([[rotate]]). */
  def learnRotation(pts: Array[Array[Float]], dim: Int, m: Int, ksub: Int,
                    opqIters: Int, innerLloyd: Int = 3): Array[Array[Float]] = {
    require(pts.nonEmpty, "OPQ training needs a non-empty sample")
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    var r: Array[Array[Double]] = identity(dim)
    var it = 0
    while (it < opqIters) {
      val rot = pts.map(p => rotateD(r, p))
      val books = Ann.trainCodebooks(rot, dim, m, ksub, innerLloyd)
      // M[a][b] = Σ_i x_i[a] · ŷ_i[b]  (x original, ŷ the rotated-space
      // PQ reconstruction) — tr(R·M) is the Procrustes objective
      val mM = Array.fill(dim)(new Array[Double](dim))
      var i = 0
      while (i < pts.length) {
        val y = reconstruct(rot(i), books, dim, m)
        val x = pts(i)
        var a = 0
        while (a < dim) {
          val xa = x(a).toDouble
          if (xa != 0.0) {
            var b = 0
            while (b < dim) { mM(a)(b) += xa * y(b); b += 1 }
          }
          a += 1
        }
        i += 1
      }
      r = procrustes(mM)
      it += 1
    }
    checkOrthogonal(r)
    r.map(_.map(_.toFloat))
  }

  /** y = R·x (row-major R). */
  def rotate(r: Array[Array[Float]], v: Array[Float]): Array[Float] = {
    val n = r.length
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val ri = r(i)
      var s = 0.0
      var j = 0
      val lim = math.min(ri.length, v.length)
      while (j < lim) { s += ri(j) * v(j); j += 1 }
      out(i) = s.toFloat
      i += 1
    }
    out
  }

  private def rotateD(r: Array[Array[Double]], v: Array[Float]): Array[Float] = {
    val n = r.length
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val ri = r(i)
      var s = 0.0
      var j = 0
      val lim = math.min(ri.length, v.length)
      while (j < lim) { s += ri(j) * v(j); j += 1 }
      out(i) = s.toFloat
      i += 1
    }
    out
  }

  /** Rotated-space PQ reconstruction: each subspace's nearest codeword. */
  private def reconstruct(y: Array[Float], books: Array[Array[Array[Float]]],
                          dim: Int, m: Int): Array[Float] = {
    val dsub = dim / m
    val out = new Array[Float](dim)
    var sub = 0
    while (sub < m) {
      val off = sub * dsub
      val book = books(sub)
      var best = 0; var bd = Double.MaxValue
      var c = 0
      while (c < book.length) {
        var d = 0.0; var i = 0
        val cc = book(c)
        while (i < dsub) { val x = y(off + i) - cc(i); d += x * x; i += 1 }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      System.arraycopy(book(best), 0, out, off, dsub)
      sub += 1
    }
    out
  }

  /** Mean squared PQ reconstruction error of `pts` under `books` (per
    * point, summed over subspaces) — the objective OPQ minimizes; used by
    * OpqSpec's monotone-improvement pin and graft.tools.ResidProbe. */
  def reconstructionMse(pts: Array[Array[Float]], books: Array[Array[Array[Float]]],
                        dim: Int, m: Int): Double = {
    val dsub = dim / m
    var err = 0.0
    pts.foreach { p =>
      var sub = 0
      while (sub < m) {
        val off = sub * dsub
        val book = books(sub)
        var bd = Double.MaxValue
        var c = 0
        while (c < book.length) {
          var d = 0.0; var i = 0
          val cc = book(c)
          while (i < dsub) { val x = p(off + i) - cc(i); d += x * x; i += 1 }
          if (d < bd) bd = d
          c += 1
        }
        err += bd
        sub += 1
      }
    }
    err / math.max(1, pts.length)
  }

  private def identity(n: Int): Array[Array[Double]] =
    Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)

  /** The orthogonal-Procrustes maximizer of tr(R·M): R = V·Uᵀ for
    * M = U·S·Vᵀ. SVD by one-sided Jacobi on M's COLUMNS (deterministic
    * cyclic sweeps): plane rotations orthogonalize column pairs while
    * accumulating V; at convergence the column norms are the singular
    * values and the normalized columns are U. Rank-deficient columns (zero
    * singular value) get U columns completed by Gram–Schmidt against the
    * standard basis — any orthogonal completion maximizes the objective
    * because those directions contribute nothing to tr(R·M). */
  private[graft] def procrustes(mIn: Array[Array[Double]]): Array[Array[Double]] = {
    val n = mIn.length
    // column-major working copies: a(j) = column j of M, v(j) = column j of V
    val a = Array.tabulate(n)(j => Array.tabulate(n)(i => mIn(i)(j)))
    val v = Array.tabulate(n)(j => Array.tabulate(n)(i => if (i == j) 1.0 else 0.0))
    val eps = 1e-12
    var sweep = 0
    var rotated = true
    while (rotated && sweep < 60) {
      rotated = false
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          var alpha = 0.0; var beta = 0.0; var gamma = 0.0
          var i = 0
          while (i < n) {
            alpha += a(p)(i) * a(p)(i)
            beta += a(q)(i) * a(q)(i)
            gamma += a(p)(i) * a(q)(i)
            i += 1
          }
          if (math.abs(gamma) > eps * math.sqrt(alpha * beta) && gamma != 0.0) {
            rotated = true
            val zeta = (beta - alpha) / (2.0 * gamma)
            val t = math.signum(zeta) / (math.abs(zeta) + math.sqrt(1.0 + zeta * zeta))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = c * t
            i = 0
            while (i < n) {
              val ap = a(p)(i); val aq = a(q)(i)
              a(p)(i) = c * ap - s * aq
              a(q)(i) = s * ap + c * aq
              val vp = v(p)(i); val vq = v(q)(i)
              v(p)(i) = c * vp - s * vq
              v(q)(i) = s * vp + c * vq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // U columns: normalized columns of the rotated M; degenerate (≈0-norm)
    // columns completed deterministically by Gram–Schmidt over e_0..e_{n-1}
    val u = new Array[Array[Double]](n)
    val sv = new Array[Double](n)
    var j = 0
    while (j < n) {
      var norm2 = 0.0
      var i = 0
      while (i < n) { norm2 += a(j)(i) * a(j)(i); i += 1 }
      sv(j) = math.sqrt(norm2)
      if (sv(j) > 1e-9) u(j) = a(j).map(_ / sv(j))
      j += 1
    }
    j = 0
    while (j < n) {
      if (u(j) == null) {
        var e = 0
        var done = false
        while (!done && e < n) {
          val cand = new Array[Double](n)
          cand(e) = 1.0
          var k = 0
          while (k < n) {
            if (k != j && u(k) != null) {
              var dot = 0.0; var i = 0
              while (i < n) { dot += cand(i) * u(k)(i); i += 1 }
              var i2 = 0
              while (i2 < n) { cand(i2) -= dot * u(k)(i2); i2 += 1 }
            }
            k += 1
          }
          var norm2 = 0.0
          var i = 0
          while (i < n) { norm2 += cand(i) * cand(i); i += 1 }
          if (norm2 > 1e-6) {
            val inv = 1.0 / math.sqrt(norm2)
            u(j) = cand.map(_ * inv)
            done = true
          }
          e += 1
        }
        require(u(j) != null, "could not complete a degenerate singular direction")
      }
      j += 1
    }
    // R = V·Uᵀ  (row-major): R[i][k] = Σ_j V[i][j]·U[k][j] — with v/u stored
    // column-major, V[i][j] = v(j)(i) and U[k][j] = u(j)(k)
    Array.tabulate(n, n) { (i, k) =>
      var s = 0.0
      var jj = 0
      while (jj < n) { s += v(jj)(i) * u(jj)(k); jj += 1 }
      s
    }
  }

  private def checkOrthogonal(r: Array[Array[Double]]): Unit = {
    val n = r.length
    var maxErr = 0.0
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        var s = 0.0
        var k = 0
        while (k < n) { s += r(k)(i) * r(k)(j); k += 1 }
        val want = if (i == j) 1.0 else 0.0
        val e = math.abs(s - want)
        if (e > maxErr) maxErr = e
        j += 1
      }
      i += 1
    }
    require(maxErr < 1e-6,
      f"learned OPQ rotation is not orthogonal (max |RᵀR−I| = $maxErr%.2e)")
  }
}
