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

  test("confidence tiers: script=1000, profile margin in (0,1000], und/fallback=0") {
    // script tier is certain
    assert(TextFunctions.classifyTextWithConfidence(LangEval.pools("ja")(0)) ==
      ("ja", 1000L))
    assert(TextFunctions.classifyTextWithConfidence(LangEval.pools("zh")(0)) ==
      ("zh", 1000L))
    // profile tier: every held-out doc decision has a positive margin
    // (the per-lang MIN is the q_lang_id oracle literal)
    LangEval.langs.filterNot(Set("ja", "zh", "ru")).foreach { lang =>
      (0L until 50L).foreach { i =>
        val (got, conf) = TextFunctions.classifyTextWithConfidence(LangEval.textOf(lang, i))
        assert(got == lang)
        assert(conf > 0L && conf <= 1000L, s"$lang doc $i conf=$conf")
      }
    }
    // no signal -> zero confidence
    assert(TextFunctions.classifyTextWithConfidence("")._2 == 0L)
    assert(TextFunctions.classifyTextWithConfidence("12345 .. 90")._2 == 0L)
    // classify/confidence project from ONE kernel — no drift possible
    val s = LangEval.textOf("sv", 7L)
    assert(TextFunctions.classifyText(s) == TextFunctions.classifyTextWithConfidence(s)._1)
    assert(TextFunctions.classifyConfidence(s) == TextFunctions.classifyTextWithConfidence(s)._2)
  }

  test("degenerate inputs stay und / signal-free") {
    assert(TextFunctions.classifyText(null) == "und")
    assert(TextFunctions.classifyText("") == "und")
    assert(TextFunctions.classifyText("   \n\t") == "und")
    assert(TextFunctions.classifyText("12345 678 90 ...") == "und")
  }
}
