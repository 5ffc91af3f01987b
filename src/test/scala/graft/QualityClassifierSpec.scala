package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.spark.fns.TextKernels
import graft.spark.text.QualityClassifier

/** Hashed-ngram logistic classifier: byte-deterministic distributed
  * training (the integer-quantized gradient contract), separable-task
  * learning, codegen==kernel scoring parity, and the model byte codec. */
class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val B = 512

  /** Separable corpus: positive docs from vocabulary A, negative from Z. */
  private def labeled: DataFrame = {
    import spark.implicits._
    def doc(words: Seq[String], salt: Int): String =
      (0 until 12).map(i => words((i + salt) % words.size)).mkString(" ")
    val a = Seq("apple", "anchor", "amber", "atlas", "aria")
    val z = Seq("zebra", "zinc", "zephyr", "zodiac", "zonal")
    ((0 until 12).map(i => (i.toLong, doc(a, i), true)) ++
      (0 until 12).map(i => (100L + i, doc(z, i), false)))
      .toDF("id", "text", "label")
  }

  test("training is byte-deterministic across runs and repartitionings") {
    val m1 = QualityClassifier.train(labeled, "text", "label", buckets = B, iters = 5)
    val m2 = QualityClassifier.train(labeled, "text", "label", buckets = B, iters = 5)
    val m3 = QualityClassifier.train(labeled.repartition(7), "text", "label",
      buckets = B, iters = 5)
    assert(java.util.Arrays.equals(m1.toBytes, m2.toBytes))
    assert(java.util.Arrays.equals(m1.toBytes, m3.toBytes),
      "gradient aggregation must be partitioning-invariant (exact Long sums)")
  }

  test("sampleCap: deterministic bounded sample, byte-equal across layouts, still learns") {
    // cap below the corpus size: the content-hash cut must pick the SAME
    // 16 docs under any partitioning (round-5 scale posture: at corpus
    // scale training runs on a bounded deterministic sample)
    val s1 = QualityClassifier.train(labeled, "text", "label", buckets = B,
      iters = 20, sampleCap = 16)
    val s2 = QualityClassifier.train(labeled.repartition(9), "text", "label",
      buckets = B, iters = 20, sampleCap = 16)
    assert(java.util.Arrays.equals(s1.toBytes, s2.toBytes),
      "sampled training must stay byte-deterministic across partitionings")
    val full = QualityClassifier.train(labeled, "text", "label", buckets = B, iters = 20)
    assert(!java.util.Arrays.equals(s1.toBytes, full.toBytes),
      "cap below corpus size must actually bound the training set")
    // a cap >= corpus size selects everything -> identical to full training
    val sAll = QualityClassifier.train(labeled, "text", "label", buckets = B,
      iters = 20, sampleCap = 1000)
    assert(java.util.Arrays.equals(sAll.toBytes, full.toBytes))
    // the sampled model still solves the separable holdout perfectly
    import spark.implicits._
    val holdout = Seq(
      (true, "aria apple atlas amber anchor"),
      (true, "amber atlas apple aria"),
      (false, "zonal zebra zephyr zinc"),
      (false, "zinc zodiac zebra zonal")).toDF("label", "text")
    val wrong = holdout
      .withColumn("p", QualityClassifier.predict(spark, s1)(col("text")))
      .filter(col("p") =!= col("label")).count()
    assert(wrong == 0, "sampled-model holdout accuracy must stay perfect on the fixture")
  }

  test("learns a separable task: margins strictly split, holdout perfect") {
    val m = QualityClassifier.train(labeled, "text", "label", buckets = B, iters = 20)
    // holdout: unseen salts of the same vocabularies
    import spark.implicits._
    val holdout = Seq(
      (true, "aria apple atlas amber anchor aria apple"),
      (true, "atlas amber apple"),
      (false, "zonal zebra zephyr zinc zodiac zonal"),
      (false, "zodiac zinc zebra")).toDF("label", "text")
    val got = holdout
      .select(col("label"), QualityClassifier.predict(spark, m)(col("text")).as("p"),
        QualityClassifier.scoreMilli(spark, m)(col("text")).as("s"))
      .collect()
    got.foreach { r =>
      assert(r.getBoolean(0) == r.getBoolean(1), s"misclassified: $r")
    }
    val posMin = got.filter(_.getBoolean(0)).map(_.getLong(2)).min
    val negMax = got.filterNot(_.getBoolean(0)).map(_.getLong(2)).max
    assert(posMin > 0 && negMax < 0, s"margins must split at 0: $posMin vs $negMax")
  }

  test("more iterations do not hurt the separable margins") {
    val m5 = QualityClassifier.train(labeled, "text", "label", buckets = B, iters = 5)
    val m20 = QualityClassifier.train(labeled, "text", "label", buckets = B, iters = 20)
    def minGap(m: QualityClassifier.Model): Long = {
      val rows = labeled.select(col("label"),
        QualityClassifier.scoreMilli(spark, m)(col("text")).as("s")).collect()
      rows.filter(_.getBoolean(0)).map(_.getLong(1)).min -
        rows.filterNot(_.getBoolean(0)).map(_.getLong(1)).max
    }
    assert(minGap(m20) >= minGap(m5))
  }

  test("codegen'd score equals the kernel + bias") {
    val m = QualityClassifier.train(labeled, "text", "label", buckets = B, iters = 3)
    val texts = Seq("apple zebra", "", "amber amber amber", "unseen words entirely")
    import spark.implicits._
    val got = texts.toDF("text")
      .select(QualityClassifier.scoreMilli(spark, m)(col("text")))
      .collect().map(_.getLong(0)).toSeq
    val want = texts.map(t =>
      TextKernels.dsirLogWeightMilli(UTF8String.fromString(t), B, m.weights) + m.biasMilli)
    assert(got == want)
  }

  test("model byte codec round-trips; corrupt input raises") {
    val m = QualityClassifier.Model(4, Array(0.5, -1.25, 0.0, 3.5), biasMilli = -42L)
    val back = QualityClassifier.Model.fromBytes(m.toBytes)
    assert(back.buckets == 4 && back.biasMilli == -42L &&
      back.weights.toSeq == m.weights.toSeq)
    assert(java.util.Arrays.equals(back.toBytes, m.toBytes))
    val bad = m.toBytes; bad(0) = 'Z'.toByte
    assertThrows[IllegalArgumentException](QualityClassifier.Model.fromBytes(bad))
    assertThrows[IllegalArgumentException](
      QualityClassifier.Model.fromBytes(m.toBytes.dropRight(1)))
  }
}
