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

  test("bytes_to_unicode table is the GPT-2 bijection") {
    val m = BpeTokenizer.byteToChar
    assert(m.length == 256)
    assert(m.toSet.size == 256, "must be a bijection")
    // printable bytes map to themselves
    ('!' to '~').foreach(c => assert(m(c.toInt) == c))
    (0xa1 to 0xac).foreach(b => assert(m(b) == b.toChar))
    (0xae to 0xff).foreach(b => assert(m(b) == b.toChar))
    // the 68 non-printables take consecutive code points from 256
    assert(m(0) == 256.toChar)        // NUL is the first non-printable
    assert(m(' '.toInt) == (256 + 32).toChar) // space is the 33rd
    assert(m.filter(_ >= 256.toChar).length == 68)
  }

  test("byte-level mode: ASCII-identical to codepoint mode, strictly larger on non-ASCII") {
    val cp = BpeTokenizer.standard
    val by = BpeTokenizer.standardBytes
    // the training corpus is ASCII, so the learned tables coincide
    assert(by.merges == cp.merges)
    Seq("the quick brown fox jumps over the lazy dog",
      "internationalization", "a plain ascii sentence 42!").foreach { s =>
      assert(by.countText(s) == cp.countText(s), s"ASCII parity for '$s'")
    }
    // non-ASCII: each multi-byte code point is >= 2 unmergeable byte symbols
    Seq("café", "straße", "東京", "москва", "señor niño").foreach { s =>
      assert(by.countText(s) > cp.countText(s), s"byte > codepoint for '$s'")
    }
    // hand-checked: café = c,a,f + 2 bytes for é; "ca" is a learned merge
    assert(cp.encodeText("café").toSeq.map(_.length).sum == 4)
    assert(by.countText("café") == cp.countText("café") + 1)
    // CJK: 3 UTF-8 bytes per char, none mergeable under the ASCII table
    assert(by.countText("東京") == 6L)
    assert(cp.countText("東京") == 2L)
    // piece lengths in byte mode sum to the UTF-8 byte count of pre-tokens
    val s = "héllo wörld 東京"
    val preBytes = s.replaceAll("\\s", "")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    assert(by.encodeText(s).map(_.length).sum == preBytes)
  }

  test("curate budgets switch to byte-level counts (pluggable tokenCounter)") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val docs = (0L until 20L)
      .map(i => (i, "lang1", "src", s"unique doc $i café señor 東京 words here and more padding text"))
      .toDF("doc_id", "lang", "source", "text")
    val bench = Seq.empty[String].toDF("text")
    def totalToks(counter: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      graft.spark.pipeline.DataPipeline.curate(docs, bench, tokenBudget = 1000000L,
          tokenCounter = counter)
        .agg(org.apache.spark.sql.functions.sum("toks")).head().getLong(0)
    val cpTotal = totalToks(
      graft.spark.fns.TextExpressions.bpeMergedCountNative(_, BpeTokenizer.standard))
    val byTotal = totalToks(
      graft.spark.fns.TextExpressions.bpeMergedCountNative(_, BpeTokenizer.standardBytes))
    assert(byTotal > cpTotal, "byte-level budget must exceed codepoint on non-ASCII docs")
  }

  test("distributed merge learning == in-memory learning when nothing is pruned") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val corpus = Seq("aa aa ab low lower lowest", "the the them there lowest",
      "répété répété tokens 中文 here")
    val local = BpeTokenizer.learn(corpus, numMerges = 20)
    val dist = BpeTokenizer.learnDistributed(corpus.toDF("text"), "text",
      numMerges = 20, topK = 100000)
    assert(dist == local)
    // byte-level alphabet too
    val localB = BpeTokenizer.learn(corpus, numMerges = 20, byteLevel = true)
    val distB = BpeTokenizer.learnDistributed(corpus.toDF("text"), "text",
      numMerges = 20, topK = 100000, byteLevel = true)
    assert(distB == localB)
    // truncation keeps the learner functional (head of the Zipf mass)
    val pruned = BpeTokenizer.learnDistributed(corpus.toDF("text"), "text",
      numMerges = 20, topK = 3)
    assert(pruned.nonEmpty)
  }

  test("merges.txt round-trip: format + parse is the identity; reloaded table counts identically") {
    val bpe = BpeTokenizer.standard
    val text = BpeTokenizer.formatMerges(bpe.merges)
    val back = BpeTokenizer.parseMerges(text)
    assert(back == bpe.merges)
    val reloaded = new BpeTokenizer(back)
    assert(reloaded.countText("the quick brown fox jumps over the lazy dog") ==
      bpe.countText("the quick brown fox jumps over the lazy dog"))
    // byte-level tables (remapped-byte symbols are still space-free chars)
    val bb = BpeTokenizer.standardBytes
    assert(BpeTokenizer.parseMerges(BpeTokenizer.formatMerges(bb.merges)) == bb.merges)
    // real-world merges.txt tolerance: CRLF endings and '#version:' header
    assert(BpeTokenizer.parseMerges("#version: 0.2\r\nt h\r\nth e\r\n") ==
      Vector(("t", "h"), ("th", "e")))
  }

  test("published GPT-2 merges interop: the real artifact's opening drives our machinery") {
    // The opening of the PUBLIC GPT-2 merges.txt (OpenAI gpt-2 repo /
    // huggingface gpt2): '#version: 0.2' header, then ranks 0-9. This is the
    // published artifact verbatim, not something we learned — loading it
    // proves the interchange seam end-to-end: the file format parses, its
    // symbols land in OUR independently-constructed bytes_to_unicode
    // alphabet, and the merge loop reproduces GPT-2's actual tokenization.
    val published =
      "#version: 0.2\n" +
        "Ġ t\nĠ a\nh e\ni n\nr e\no n\nĠt he\ne r\nĠ s\na t\n"
    val merges = BpeTokenizer.parseMerges(published)
    assert(merges.length == 10)
    assert(merges(0) == ("Ġ", "t")) // rank 0: the space-prefix merge
    assert(merges(6) == ("Ġt", "he")) // the merge that makes 'Ġthe'
    // format -> parse round-trips the published table
    assert(BpeTokenizer.parseMerges(BpeTokenizer.formatMerges(merges)) == merges)

    // alphabet join point: our bytes_to_unicode must map 0x20 to 'Ġ'
    // (U+0120) or the published symbols could never match our byte symbols
    val raw = new BpeTokenizer(Vector.empty, byteLevel = true)
    assert(raw.encode(" ").toSeq == Seq("Ġ"))
    // and the famous GPT-2 mojibake for non-ASCII: é = 0xC3 0xA9 -> 'Ã©'
    assert(raw.encode("é").toSeq == Seq("Ã", "©"))

    val bpe = new BpeTokenizer(merges, byteLevel = true)
    // GPT-2's most famous token: ' the' is ONE token 'Ġthe' — reachable
    // already at rank 6 (Ġ+t, h+e, Ġt+he), exactly how the real bpe() gets
    // there
    assert(bpe.encode(" the").toSeq == Seq("Ġthe"))
    // rank-cutoff behavior matches the real loop: ' at' under ranks 0-9
    // merges Ġ+a first (rank 1), stranding the 't' (the Ġat merge is
    // beyond the excerpt); 'he' standalone merges at rank 2
    assert(bpe.encode(" at").toSeq == Seq("Ġa", "t"))
    assert(bpe.encode("he").toSeq == Seq("he"))
    // the loaded table also drives the normal counting surface (our
    // pre-tokenizer is space-dropping, so 'the' = [t,he], 'cat' = [c,at])
    assert(bpe.countText("the cat") == 4L)
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
