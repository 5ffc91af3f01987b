package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.text.{CjkSegment, CjkUnigram}

/** Corpus-trained unigram Viterbi segmentation: trained-frequency decoding
  * must fix the cross-boundary mistakes the greedy lexicon baseline makes,
  * keep the CJK-free whitespace contract, fall back to greedy when
  * untrained, and train deterministically across partitionings. */
class CjkUnigramSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** Segmented training corpus (the shape public pipelines have: existing
    * segmented resources). Counts: 研究/生命/的/起源 10 each; 生活/很/好 8;
    * 研究生/招生/考试/学生/上课 2 each. */
  private def corpusRows: Seq[String] =
    Seq.fill(10)("研究 生命 的 起源") ++ Seq.fill(2)("研究生 招生 考试") ++
      Seq.fill(8)("生活 很 好") ++ Seq.fill(2)("学生 上课")

  private lazy val model: CjkUnigram.Model = {
    import spark.implicits._
    CjkUnigram.train(corpusRows.toDF("text"), "text")
  }

  test("train: bounded distributed counting, deterministic across partitionings") {
    import spark.implicits._
    assert(model.counts("研究") == 10L && model.counts("研究生") == 2L &&
      model.counts("生活") == 8L)
    assert(!model.counts.contains("很好") && !model.counts.contains("spark"))
    val m2 = CjkUnigram.train(corpusRows.toDF("text").repartition(7), "text")
    assert(m2.counts == model.counts && m2.total == model.total)
  }

  test("viterbi resolves the ambiguity the greedy longest-match cannot") {
    // 研究生命: greedy would commit to the longest dictionary word 研究生
    // and strand 命; under the trained frequencies [研究][生命] (10·10)
    // beats [研究生][命] (2·floor)
    assert(model.segment("研究生命").toSeq == Seq("研究", "生命"))
    assert(model.segment("研究生招生考试").toSeq == Seq("研究生", "招生", "考试"),
      "three known words beat mixing the frequent prefix with singles")
  }

  test("held-out uplift over the greedy lexicon baseline") {
    val heldOut = Seq(
      "研究生命" -> Seq("研究", "生命"),
      "生命的起源" -> Seq("生命", "的", "起源"),
      "学生上课的生活" -> Seq("学生", "上课", "的", "生活"),
      "研究生招生考试" -> Seq("研究生", "招生", "考试"),
      "生活很好" -> Seq("生活", "很", "好"))
    def accuracy(seg: String => Seq[String]): Int =
      heldOut.count { case (raw, truth) => seg(raw) == truth }
    val viterbi = accuracy(t => model.segment(t).toSeq)
    val greedy = accuracy(t => CjkSegment.segment(t).toSeq)
    assert(viterbi == heldOut.size, s"trained model must segment all held-out rows ($viterbi)")
    assert(viterbi > greedy,
      s"measured uplift: viterbi $viterbi vs greedy $greedy on the ambiguity fixture")
  }

  test("CJK-free text keeps the whitespace contract; mixed runs compose") {
    assert(model.segment("  the  quick fox ").toSeq == Seq("the", "quick", "fox"))
    assert(model.segment("").isEmpty && model.segment(null).isEmpty)
    assert(model.segment("spark 处理生命 data").toSeq ==
      Seq("spark", "处", "理", "生命", "data"),
      "unseen multi-char words decompose to singles; known words survive")
  }

  test("empty model falls back to the greedy lexicon baseline") {
    val empty = CjkUnigram.Model(Map.empty)
    val texts = Seq("我们喜欢学习中文", "今天天气非常好", "the quick fox")
    texts.foreach { t =>
      assert(empty.segment(t).toSeq == CjkSegment.segment(t).toSeq, t)
    }
  }

  test("tie rule: equal-score parses prefer the shorter last word, deterministically") {
    // two unseen singles vs nothing else: the backtrace is fixed regardless
    // of arithmetic noise; repeated runs are identical
    val a = model.segment("夏冬").toSeq
    assert(a == Seq("夏", "冬") && a == model.segment("夏冬").toSeq)
  }
}
