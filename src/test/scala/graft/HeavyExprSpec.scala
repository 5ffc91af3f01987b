package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.fns.{TextExpressions, TextKernels}

/** The round-5 codegen'd heavy-set expressions (round-4 verdict "what's
  * wrong" #3): SortedLongContainsExpr vs a plain Scala membership check, and
  * the fused removeCoveredSpans kernel vs the join-rebuild reference formula
  * (split("\\s+") tokens, covered positions dropped, single-space join).
  */
class HeavyExprSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("SortedLongContainsExpr matches set membership incl. boundaries and nulls") {
    import spark.implicits._
    val heavy = Array(-500L, -1L, 0L, 7L, 42L, Long.MaxValue, Long.MinValue)
    java.util.Arrays.sort(heavy)
    val bc = spark.sparkContext.broadcast(heavy)
    val probes: Seq[java.lang.Long] =
      Seq[java.lang.Long](-501L, -500L, -2L, -1L, 0L, 1L, 7L, 41L, 42L, 43L,
        Long.MaxValue, Long.MinValue, Long.MinValue + 1, null)
    val got = probes.toDF("h")
      .select(col("h"), TextExpressions.sortedLongContainsNative(col("h"), bc).as("in"))
      .collect().map(r => (if (r.isNullAt(0)) null else r.getLong(0): java.lang.Long,
        if (r.isNullAt(1)) null else r.getBoolean(1): java.lang.Boolean)).toMap
    probes.foreach { p =>
      val expect: java.lang.Boolean = if (p == null) null else heavy.contains(p.longValue())
      assert(got(p) == expect, s"probe $p")
    }
  }

  /** The join-rebuild reference formula the kernel must match byte-for-byte
    * (Corpus.removeRepeatedSpans' fallback-path `rebuild`). */
  private def referenceClean(text: String, n: Int, heavy: Array[Long]): String = {
    val hashes = TextKernels.spanHashes(UTF8String.fromString(text), n)
    val starts = (0 until hashes.numElements())
      .filter(w => java.util.Arrays.binarySearch(heavy, hashes.getLong(w)) >= 0)
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val covered = new Array[Boolean](toks.length)
    starts.foreach { w =>
      (w until math.min(w + n, toks.length)).foreach(covered(_) = true)
    }
    toks.indices.filterNot(covered).map(toks).mkString(" ")
  }

  test("removeCoveredSpans kernel == reference rebuild on assorted texts") {
    val n = 3
    // heavy set: hashes of the planted window "shared common phrase"
    val plantedHash = TextKernels
      .spanHashes(UTF8String.fromString("shared common phrase"), n).getLong(0)
    val heavy = Array(plantedHash)
    val texts = Seq(
      "KEEP shared common phrase tail",
      "shared common phrase",
      "Shared Common Phrase upper case hashes equal",   // per-char lowercase
      "  leading   irregular\t\twhitespace shared common phrase  ",
      "short doc",                                       // fewer than n tokens
      "no hits at all in this one",
      "shared common phrase shared common phrase",       // overlapping windows
      "")
    texts.foreach { t =>
      val got = TextKernels.removeCoveredSpans(UTF8String.fromString(t), n, heavy).toString
      assert(got == referenceClean(t, n, heavy), s"text <$t>")
    }
    // and through the Column surface with codegen, null included
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(heavy)
    val rows = (texts.map(Option(_)) :+ None).toDF("text")
      .select(col("text"), TextExpressions.removeCoveredSpansNative(col("text"), n, bc)
        .as("clean"))
      .collect()
    rows.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1), "null text must clean to null")
      else assert(r.getString(1) == referenceClean(r.getString(0), n, heavy))
    }
  }
}
