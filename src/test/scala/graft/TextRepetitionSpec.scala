package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.text.TextFunctions

/** Repetition metrics + PII kernels: edge cases and codegen pins. */
class TextRepetitionSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("text-repetition")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def eval(text: String): (Int, Int) = {
    import spark.implicits._
    val r = Seq(text).toDF("text")
      .select(TextFunctions.dupLineCount(col("text")).as("dl"),
        TextFunctions.dupBigramCount(col("text")).as("db"))
      .head()
    (r.getInt(0), r.getInt(1))
  }

  test("duplicate-line and repeated-bigram counts on edge cases") {
    assert(eval("") == (0, 0))                       // one empty line, no tokens
    assert(eval("single") == (0, 0))                 // one token -> no bigrams
    assert(eval("a b") == (0, 0))                    // one bigram, distinct
    assert(eval("a b a b") == (0, 1))                // bigrams: ab, ba, ab -> 1 dup
    assert(eval("x\nx\ny") == (1, 0))                // two identical lines
    assert(eval("x\nx\nx") == (2, 1))                // tokens cross lines: "x x" x2
    assert(eval("nav home\nnav home") == (1, 1))     // "home nav" bridges the lines
    assert(eval("  a   b  ") == (0, 0))              // whitespace runs filtered
    assert(eval("w w w w") == (0, 2))                // "w w" x3 -> 2 dups
  }

  test("PII kernels count and redact deterministically") {
    import spark.implicits._
    val df = Seq(
      "reach me at jo.do+x@mail-host.org or 192.168.1.1 ok",
      "no pii here",
      "two a@b.io c@d.co and 999.1.1.1",      // 999 matches the simple pattern
      "not an ip 1.2.3 or 1.2.3.4.5 tail").toDF("text")  // 1.2.3.4 inside 5-dot run
    val r = df.select(
      TextFunctions.emailCount(col("text")).as("ne"),
      TextFunctions.ipv4Count(col("text")).as("ni"),
      TextFunctions.redactPii(col("text")).as("red")).collect()
    assert(r(0).getInt(0) == 1 && r(0).getInt(1) == 1)
    assert(r(0).getString(2) == "reach me at <EMAIL> or <IP> ok")
    assert(r(1).getInt(0) == 0 && r(1).getInt(1) == 0)
    assert(r(2).getInt(0) == 2 && r(2).getInt(1) == 1)
    // "1.2.3.4.5": \b...\b still finds "1.2.3.4" (boundary at the dot) —
    // a known over-match of the simple pattern, asserted so it's deliberate
    assert(r(3).getInt(1) == 1)
  }

  test("gopher gate rules flip on the planted boilerplate shapes") {
    import spark.implicits._
    val goodText = Array.fill(20)("words").mkString(" ")           // 20 x 5 chars
    val rows = Seq(
      ("good", goodText),
      ("bullets", goodText + graft.spark.SparkQueries.gopherBulletPlant),
      ("ellipsis", goodText + graft.spark.SparkQueries.gopherEllipsisPlant),
      ("numeric", goodText + graft.spark.SparkQueries.gopherNumericPlant),
      ("short", "too few words"),
      ("longwords", Array.fill(15)("x" * 30).mkString(" ")))       // mean len 30 > 10
    val got = rows.toDF("name", "text")
      .select($"name", TextFunctions.gopherPass($"text", minWords = 10).as("p"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got == Map("good" -> true, "bullets" -> false, "ellipsis" -> false,
      "numeric" -> false, "short" -> false, "longwords" -> false))
  }

  test("repetition metrics stay whole-stage-codegen'd (no UDF in the plan)") {
    import spark.implicits._
    val plan = Seq("a b a b").toDF("text")
      .select(TextFunctions.dupBigramCount(col("text")),
        TextFunctions.dupLineCount(col("text")),
        TextFunctions.emailCount(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"))
  }

  test("qualitySignals bundle: one scan, every field equals its individual surface") {
    import spark.implicits._
    import graft.spark.text.TextFunctions
    val texts = Seq(
      "The quick brown fox jumps over the lazy dog near the river bank today again",
      "tiny",
      "Contact me at a@b.co from 10.0.0.7\nrepeat line\nrepeat line")
    val df = texts.toDF("text").repartition(2)
      .select(col("text"), TextFunctions.qualitySignals(col("text")).as("q"))
    val rows = df.collect()
    rows.foreach { r =>
      val text = r.getString(0)
      val q = r.getStruct(1)
      assert(q.getAs[Int]("n_chars") == text.length)
      assert(q.getAs[Long]("lm_bits_milli") ==
        graft.spark.text.CharLm.standard.bitsMilli(text))
      assert(q.getAs[Long]("deflate_ratio_pm") ==
        graft.spark.fns.CompressKernel.deflateRatioMilli(
          org.apache.spark.unsafe.types.UTF8String.fromString(text)))
      val (lang, conf) = TextFunctions.classifyTextWithConfidence(text)
      val lc = q.getStruct(q.fieldIndex("lang"))
      assert(lc.getString(0) == lang && lc.getLong(1) == conf)
    }
    val pii = rows.find(_.getString(0).contains("a@b.co")).get.getStruct(1)
    assert(pii.getAs[Int]("n_emails") == 1 && pii.getAs[Int]("n_ipv4") == 1)
    assert(pii.getAs[Int]("dup_lines") == 1)
    // one scan: the only Exchange is the test's own repartition — the
    // signal bundle itself adds no shuffle (AQE prints final + initial plan
    // sections; inspect the final one)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==", 2)(0)
    assert("Exchange".r.findAllIn(plan).length == 1, plan.take(500))
  }
}
