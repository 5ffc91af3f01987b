package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.spark.text.{LangEval, LangProfiles, TextFunctions}

/** Held-out language-ID evaluation (the de-circularized protocol): the
  * classifier trains on LangProfiles paragraphs, evaluates on disjoint
  * LangEval sentences. Thresholds pin the honestly measured accuracy floor;
  * exact per-language counts are the q_lang_id oracle literals (LangTruth). */
class LangEvalSpec extends AnyFunSuite {

  test("training and evaluation text are disjoint (no circularity)") {
    LangEval.pools.foreach { case (lang, pool) =>
      LangProfiles.training.get(lang).foreach { train =>
        pool.foreach(s => assert(!train.contains(s.take(30)),
          s"$lang eval sentence leaked into training: $s"))
      }
    }
  }

  test("held-out per-language accuracy >= 95% on 50 docs each") {
    LangEval.langs.foreach { lang =>
      val correct = (0L until 50L)
        .count(i => TextFunctions.classifyText(LangEval.textOf(lang, i)) == lang)
      assert(correct >= 48, s"$lang: $correct/50") // >= 96%
    }
  }

  test("profiles rank the language's own trigrams first") {
    // each training text's closest profile is its own language
    LangProfiles.training.keys.foreach { lang =>
      val p = LangProfiles.profile(LangProfiles.training(lang))
      val best = LangProfiles.training.keys.toSeq.sorted
        .minBy(l => LangProfiles.distance(p, l))
      assert(best == lang, s"training self-distance for $lang -> $best")
    }
  }

  test("degenerate inputs stay und / signal-free") {
    assert(TextFunctions.classifyText(null) == "und")
    assert(TextFunctions.classifyText("") == "und")
    assert(TextFunctions.classifyText("   \n\t") == "und")
    assert(TextFunctions.classifyText("12345 678 90 ...") == "und")
  }
}
