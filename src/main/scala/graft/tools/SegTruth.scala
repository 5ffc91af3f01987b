package graft.tools

import graft.spark.text.{CjkFixture, CjkSegment, TextFunctions}

/** Dev tool: print the CJK segmentation of every CjkFixture doc and the
  * q_cjk_tokens oracle literals. Rerun after ANY change to the CjkSegment
  * lexicon/algorithm or the fixture — and cross-check the printed
  * segmentations against CjkSegmentSpec's HAND-DERIVED truth (the spec is
  * written from the greedy-maximum-matching contract, so drift breaks both
  * gates, not just one). */
object SegTruth {

  def main(args: Array[String]): Unit = {
    println("-- fixture segmentations --")
    CjkFixture.docs.foreach { case (id, lang, text) =>
      val toks = CjkSegment.segment(text)
      println(s"  $id [$lang] '$text' -> [${toks.mkString("|")}] (${toks.length})")
    }

    println("-- stop-word plant invariant --")
    Seq("zh", "ja").foreach { lang =>
      val words = TextFunctions.gopherStopwords(lang)
      val got = CjkSegment.segment(words.mkString("")).toSeq
      val ok = got == words
      println(s"  $lang: ${if (ok) "OK" else s"BROKEN got [${got.mkString("|")}]"}")
    }

    println("-- q_cjk_tokens oracle literals --")
    val rows = CjkFixture.docs.zipWithIndex.map { case ((id, lang, text), i) =>
      val n = CjkSegment.tokenCount(text)
      val seg = CjkSegment.segmentedText(text)
      if (i == 0) s"(CAST($id AS BIGINT), '$lang', CAST($n AS BIGINT), '$seg', true, true), "
      else s"($id, '$lang', $n, '$seg', true, true), "
    }
    rows.foreach(println)
    // the console PrintStream may not be UTF-8 — write the literals to a
    // file too so the CJK strings survive copy-paste
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/seg_truth.txt"),
      rows.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println("(also written to /tmp/seg_truth.txt)")
  }
}
