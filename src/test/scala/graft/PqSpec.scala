package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SplitMix64
import graft.spark.ann.Ann

/** Product-quantization ANN (Jégou 2011): codebook training determinism,
  * perfect retrieval on centroid-aligned data, and recall on noisy planted
  * neighbors vs the exact baseline. */
class PqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def rngVec(seed: Long, dim: Int): Array[Float] = {
    val r = new SplitMix64(seed)
    Array.fill(dim)(((r.nextLong() >>> 11) * (1.0 / (1L << 52)) - 1.0).toFloat)
  }

  test("codebook training is deterministic and shaped (m x ksub x dsub)") {
    val sample = Array.tabulate(200)(i => rngVec(1000L + i, 16))
    val a = Ann.trainCodebooks(sample, dim = 16, m = 4, ksub = 8, iters = 5)
    val b = Ann.trainCodebooks(sample.map(_.clone()), dim = 16, m = 4, ksub = 8, iters = 5)
    assert(a.length == 4 && a.forall(_.length == 8) && a.forall(_.forall(_.length == 4)))
    a.zip(b).foreach { case (sa, sb) =>
      sa.zip(sb).foreach { case (ca, cb) => assert(ca.toSeq == cb.toSeq) }
    }
  }

  test("centroid-aligned corpus retrieves exactly (quantization is lossless there)") {
    import spark.implicits._
    // vectors built as combinations of a small per-subspace alphabet: PQ
    // with ksub >= alphabet size reconstructs them exactly, so ADC == exact
    // inner product and top-k matches brute force everywhere
    val dim = 16; val m = 4; val dsub = dim / m
    val alphabet = Array.tabulate(4)(a => rngVec(77L + a, dsub))
    def vecOf(id: Long): Array[Float] =
      (0 until m).flatMap(s => alphabet(((id >> (2 * s)) & 3).toInt)).toArray
    val corpus = (0L until 200L).map(i => (i, vecOf(i))).toDF("vec_id", "embedding")
    val queries = (0L until 5L).map(i => (i, vecOf(i * 37 % 200)))
      .toDF("query_id", "q_embedding")
    // ids can differ on exact-cosine TIES (the two paths sum floats in
    // different orders), so compare the retrieved EXACT-cosine multisets:
    // lossless quantization must retrieve vectors of identical quality
    def cosOf(q: Long, v: Long): Double = {
      val a = vecOf(q * 37 % 200); val b = vecOf(v)
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.rint(d / math.sqrt(na * nb) * 1e6) / 1e6
    }
    def simBag(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Double]] =
      df.select(col("query_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, vs) => q -> vs.map(p => cosOf(q, p._2)).toSeq.sorted }
    val exact = simBag(Ann.bruteForceTopK(corpus, queries, 5))
    val pq = simBag(Ann.pqTopK(corpus, queries, 5, dim = dim, m = m, ksub = 16,
      lloydIters = 8, trainSample = 200))
    assert(pq == exact, s"pq=$pq exact=$exact")
  }

  test("ivfPqTopK: residual+refine on CLUSTERED data retrieves the planted neighbors") {
    import spark.implicits._
    // clustered corpus (the regime residual encoding exists for): 8 cluster
    // centers, members = center + small jitter; queries are the centers
    val dim = 32
    val centers = (0 until 8).map(c => rngVec(300L + c, dim))
    val rows = (0 until 8).flatMap { c =>
      (0 until 60).map { j =>
        val r = new SplitMix64(40000L + c * 100 + j)
        val v = centers(c).map(x =>
          x + ((r.nextLong() >>> 11) * (1.0 / (1L << 52)) - 0.5).toFloat * 0.08f)
        ((c * 60 + j).toLong, v)
      }
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = (0 until 8).map(c => (c.toLong, centers(c))).toDF("query_id", "q_embedding")
    val exact = Ann.bruteForceTopK(corpus, queries, 5)
      .select(col("query_id"), col("vec_id"))
    def recallOf(residual: Boolean, refineFactor: Int): Map[Long, Double] = {
      val approx = Ann.ivfPqTopK(corpus, queries, 5, dim = dim, nlist = 8, nprobe = 4,
          m = 8, ksub = 32, trainSample = 480, residual = residual,
          refineFactor = refineFactor)
        .select(col("query_id").as("aq"), col("vec_id").as("av"))
      exact.join(approx, exact("query_id") === col("aq") && exact("vec_id") === col("av"), "left")
        .groupBy(col("query_id"))
        .agg((sum(when(col("av").isNotNull, 1).otherwise(0)) / count(lit(1))).as("r"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    // refineFactor must cover the near-tie set: all 60 cluster members are
    // nearly equidistant from the query, so ADC ranks them ~arbitrarily and
    // a 20-item shortlist keeps a near-random subset — 16*k = 80 > 60 makes
    // the exact re-rank see the whole tie group (the scaladoc'd caveat)
    val full = recallOf(residual = true, refineFactor = 16)
    full.foreach { case (q, r) => assert(r >= 0.8, s"query $q recall $r") }
    // simple mode with refine must also work (refine erases quantization
    // error from the final ranking); both produce exactly k rows per query
    val simple = recallOf(residual = false, refineFactor = 16)
    simple.foreach { case (q, r) => assert(r >= 0.8, s"query $q recall $r") }
    val n = Ann.ivfPqTopK(corpus, queries, 5, dim = dim, nlist = 8, nprobe = 4,
      m = 8, ksub = 32, trainSample = 480).groupBy(col("query_id"))
      .count().collect().map(_.getLong(1))
    assert(n.forall(_ == 5L))
  }

  test("IvfPqModel byte codec round-trips exactly; reloaded index searches identically") {
    import spark.implicits._
    val corpus = (0L until 120L).map(i => (i, rngVec(7000L + i, 16))).toDF("vec_id", "embedding")
    val queries = (0L until 4L).map(i => (i, rngVec(7000L + i * 31, 16)))
      .toDF("query_id", "q_embedding")
    val model = Ann.trainIvfPqModel(corpus, dim = 16, nlist = 8, m = 4, ksub = 16,
      trainSample = 120)
    val bytes = model.toBytes
    val back = graft.spark.ann.IvfPqModel.fromBytes(bytes)
    assert(java.util.Arrays.equals(back.toBytes, bytes), "codec must be a fixpoint")
    assert(back.dim == model.dim && back.m == model.m && back.residual == model.residual)
    // search the encoded index under the RELOADED model == the direct call
    val index = Ann.encodeIvfPq(corpus, model)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val direct = rows(Ann.ivfPqTopK(corpus, queries, 3, dim = 16, nlist = 8,
      nprobe = 4, m = 4, ksub = 16, trainSample = 120))
    val via = rows(Ann.searchIvfPq(index, back, queries, 3, nprobe = 4,
      refineFactor = 4, rawCorpus = Some(corpus)))
    assert(via == direct)
    // without refine, rawCorpus is not needed
    assert(Ann.searchIvfPq(index, back, queries, 3, nprobe = 4, refineFactor = 1)
      .count() == 12L)
    // structurally inconsistent models fail loudly on the DRIVER
    intercept[IllegalArgumentException] {
      graft.spark.ann.IvfPqModel.fromBytes(
        model.copy(books = model.books.take(2)).toBytes)
    }
    intercept[IllegalArgumentException] {
      Ann.encodeIvfPq(corpus, model.copy(dim = 10))
    }
  }

  test("ivfPqTopK handles a corpus smaller than nlist (cell tables sized to actual count)") {
    import spark.implicits._
    // 6 vectors, default-ish nlist 16: centroid/cell tables must size to 6
    val corpus = (0L until 6L).map(i => (i, rngVec(600L + i, 16))).toDF("vec_id", "embedding")
    val queries = Seq((0L, rngVec(600L, 16))).toDF("query_id", "q_embedding")
    Seq(true, false).foreach { residual =>
      val rows = Ann.ivfPqTopK(corpus, queries, k = 3, dim = 16, nlist = 16,
          nprobe = 4, m = 4, ksub = 4, trainSample = 6, residual = residual)
        .collect()
      assert(rows.length == 3, s"residual=$residual")
    }
  }

  test("planted near-neighbors survive quantization (recall@5 >= 0.8)") {
    import spark.implicits._
    val dim = 32
    val base = (0 until 10).map(q => rngVec(5000L + q, dim))
    // corpus: for each query, 5 jittered copies (the true neighbors) + noise
    val rows = (0 until 10).flatMap { q =>
      (0 until 5).map { j =>
        val r = new SplitMix64(9000L + q * 10 + j)
        val v = base(q).map(x => x + ((r.nextLong() >>> 11) * (1.0 / (1L << 52)) - 0.5).toFloat * 0.1f)
        ((100 + q * 5 + j).toLong, v)
      }
    } ++ (0 until 400).map(i => ((1000 + i).toLong, rngVec(7777L + i, dim)))
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = (0 until 10).map(q => (q.toLong, base(q))).toDF("query_id", "q_embedding")
    val exact = Ann.bruteForceTopK(corpus, queries, 5)
      .select(col("query_id"), col("vec_id"))
    val pq = Ann.pqTopK(corpus, queries, 5, dim = dim, m = 8, ksub = 64,
        lloydIters = 5, trainSample = 512)
      .select(col("query_id").as("aq"), col("vec_id").as("av"))
    val recalls = exact
      .join(pq, exact("query_id") === col("aq") && exact("vec_id") === col("av"), "left")
      .groupBy(col("query_id"))
      .agg((sum(when(col("av").isNotNull, 1).otherwise(0)) / count(lit(1))).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    recalls.foreach { case (q, r) => assert(r >= 0.8, s"query $q recall $r") }
  }
}
