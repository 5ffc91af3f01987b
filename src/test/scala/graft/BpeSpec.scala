package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.spark.text.BpeTokenizer

/** True-BPE tokenizer: hand-traced learning on a tiny corpus, structural
  * properties (lossless concat, merges-only-shrink), and goldens pinning the
  * standard learned table (regenerate via `runMain graft.tools.BpeTruth`
  * after any training-corpus change). */
class BpeSpec extends AnyFunSuite {

  test("learning hand-trace: 'aa aa ab' learns exactly [('a','a')]") {
    // pre-tokens: "aa" x2, "ab" x1 -> pair (a,a)=2 beats (a,b)=1; after the
    // merge only (a,b)=1 remains, below minPairCount -> stop
    val merges = BpeTokenizer.learn(Seq("aa aa ab"), numMerges = 10)
    assert(merges == Vector(("a", "a")))
    val bpe = new BpeTokenizer(merges)
    // merge applies to EVERY occurrence left-to-right (GPT-2 bpe())
    assert(bpe.encode("aaab").toSeq == Seq("aa", "a", "b"))
    assert(bpe.encode("aaaa").toSeq == Seq("aa", "aa"))
    assert(bpe.encode("ba").toSeq == Seq("b", "a"))
  }

  test("deterministic tie-break: equal counts pick the lexicographically smallest pair") {
    // "xy" x2 and "ab" x2 tie at count 2 -> ('a','b') learned first
    val merges = BpeTokenizer.learn(Seq("xy xy ab ab"), numMerges = 2)
    assert(merges.head == ("a", "b"))
    assert(merges(1) == ("x", "y"))
  }

  test("encoding is lossless and merges only shrink") {
    val bpe = BpeTokenizer.standard
    val samples = Seq("the quick brown fox", "internationalization",
      "ключ-123", "a", "", "Großstraße 東京 test-case 42!")
    samples.foreach { s =>
      val viaText = bpe.encodeText(s)
      // concatenated pieces == the pre-tokens concatenated (whitespace dies
      // in pre-tokenization, nothing else does)
      val preJoined = {
        val m = java.util.regex.Pattern
          .compile(graft.spark.text.TextFunctions.bpePattern).matcher(s)
        val sb = new StringBuilder
        while (m.find()) sb.append(m.group())
        sb.toString
      }
      assert(viaText.mkString("") == preJoined, s"lossless for '$s'")
      // each piece count within [pre-token count, code-point count]
      assert(bpe.countText(s) <= preJoined.codePointCount(0, preJoined.length))
    }
  }

  test("standard table goldens (BpeTruth output, training corpus pinned)") {
    val bpe = BpeTokenizer.standard
    assert(bpe.merges.length == 172) // pair frequency dries up before 256
    assert(bpe.merges.take(6) == Vector(
      ("t", "h"), ("i", "n"), ("th", "e"), ("e", "n"), ("r", "e"), ("a", "n")))
    assert(bpe.countText("the quick brown fox jumps over the lazy dog") == 25L)
    assert(bpe.countText("counting structures summarize the stream") == 11L)
    assert(bpe.countText("internationalization") == 8L)
    assert(bpe.encodeText("internationalization").toSeq ==
      Seq("in", "t", "er", "n", "ation", "al", "iz", "ation"))
    assert(bpe.countText("") == 0L)
    assert(bpe.countText("   \n\t ") == 0L)
  }

  test("merge table survives serialization (the Expression reference-object path)") {
    val bpe = BpeTokenizer.standard
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(bpe); oos.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[BpeTokenizer]
    assert(back.countText("the quick brown fox jumps over the lazy dog") == 25L)
    assert(back.merges == bpe.merges)
  }
}
