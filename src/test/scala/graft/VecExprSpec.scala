package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.fns.VecExpressions

/** The codegen'd cosine kernel must be BIT-identical to the zip_with +
  * aggregate chain it replaced (q_ann_topk / q_embed_neardup rank parity
  * with DuckDB was proven against that chain). */
class VecExprSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("vec-expr")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def oldCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot / (na * nb))
  }

  test("cosine_f32 is bit-identical to the old HOF chain on random vectors") {
    import spark.implicits._
    val rng = new graft.core.SplitMix64(20260816L)
    def vec(d: Int): Array[Float] =
      Array.fill(d)(((rng.nextLong() >>> 11) * (1.0 / (1L << 52)) - 1.0).toFloat)
    val rows = (0 until 500).map(_ => (vec(64), vec(64))) ++
      Seq((Array.fill(64)(0.0f), vec(64)),           // zero-norm -> 0.0
          (vec(64), Array.fill(64)(0.0f)))
    // repartition blocks ConvertToLocalRelation, so the comparison actually
    // runs the CODEGEN'D path instead of being constant-folded at plan time
    val df = rows.toDF("a", "b").repartition(2)
      .select(VecExpressions.cosineF32($"a", $"b").as("nu"),
        oldCosine($"a", $"b").as("old"))
    val diffs = df.filter(
      // compare raw bits: NaN-safe and catches even 1-ulp drift
      expr("cast(nu as string) <> cast(old as string)") ||
        abs($"nu" - $"old") > 0.0).count()
    assert(diffs == 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cosine_f32"), s"expected the native kernel in:\n$plan")
  }

  test("fused hyperplaneSigs matches the per-table hyperplaneSig chain bit-for-bit") {
    import spark.implicits._
    import graft.spark.ann.Ann
    val tables = 6; val bits = 12; val dim = 64
    def vec(seed: Int): Array[Float] = {
      val r = new graft.core.SplitMix64(seed.toLong)
      Array.fill(dim)(((r.nextLong() >>> 11) * (1.0 / (1L << 52)) - 1.0).toFloat)
    }
    val rows = (0 until 50).map(i => Tuple1(vec(i))) :+
      Tuple1(Array.fill(dim)(0.0f)) :+ Tuple1(vec(999).take(10)) // short vector
    val df = rows.toDF("v").repartition(2)
    val fused = Ann.hyperplaneSigs(tables, bits, dim, seedBase = 1000L)
    val perTable = (0 until tables).map(t => Ann.hyperplaneSig(bits, dim, seed = 1000L + t))
    val got = df.select(fused($"v").as("all") +:
        perTable.zipWithIndex.map { case (fn, t) => fn($"v").as(s"s$t") }: _*)
      .collect()
    got.foreach { r =>
      val all = r.getSeq[Long](0)
      (0 until tables).foreach(t => assert(all(t) == r.getLong(1 + t), s"table $t"))
    }
  }

  test("null inputs and length mismatches yield null, like the old chain") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), None: Option[Array[Float]]),
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0f, 2.0f, 3.0f)))).toDF("a", "b")
      .repartition(2)
      .select(VecExpressions.cosineF32($"a", $"b").as("c"))
    assert(df.collect().forall(_.isNullAt(0)))
    // and NULL (unlike NaN, which Spark orders above every number) never
    // passes a >= threshold filter
    assert(df.filter($"c" >= 0.0).count() == 0)
  }
}
