package graft.spark.text

/** From-scratch character-n-gram language model for CCNet-style perplexity
  * quality filtering (Wenzek et al. 2020 score documents with a KenLM 5-gram
  * and filter/partition the corpus on perplexity; the idea and the backoff
  * scheme here — Stupid Backoff, Brants et al. 2007 — are public).
  *
  * Scoring: per CODE POINT (surrogate-pair safe), `S(c | ctx)` with
  * contexts up to `order − 1` code points; a context hit scores
  * `count(ctx·c) / count(ctx)`, a miss backs off with factor 0.4 to the
  * shorter context, bottoming out at a Laplace unigram over the training
  * alphabet + one OOV slot (strictly positive for ANY input). Text is normalized first (Locale.ROOT lowercase, whitespace
  * runs → single space) — the same normalization CCNet applies before
  * scoring. The document score is bits per character,
  * `−Σ log2 S / n`; [[bitsMilli]] floors ×1000 into a Long so thresholds
  * and oracle literals are integer-exact.
  *
  * Fully deterministic: fixed training corpus, fixed iteration-free count
  * maps, no sampling — the same text scores the same milli-bits on every
  * JVM, which is what makes q_perplexity a hard literal oracle.
  */
final class CharLm private (order: Int,
                            grams: java.util.HashMap[String, Long],
                            unigram: java.util.HashMap[String, Long],
                            totalChars: Long,
                            alphabetSize: Int) extends Serializable {

  private val backoff = 0.4

  /** CCNet-style normalization: lowercase + collapse whitespace runs. */
  private def normalize(text: String): String = {
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(lower.length)
    var lastWs = false
    var i = 0
    while (i < lower.length) {
      val c = lower.charAt(i)
      val ws = c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\u000B'
      if (ws) { if (!lastWs && sb.length() > 0) sb.append(' '); lastWs = true }
      else { sb.append(c); lastWs = false }
      i += 1
    }
    sb.toString
  }

  /** Code-point start offsets of s plus an end sentinel: grams are built on
    * CODE-POINT boundaries (surrogate-pair safe — a char-indexed gram would
    * split supplementary-plane pairs into lone surrogates, which a
    * String→UTF8String round-trip corrupts to '?', silently desynchronizing
    * [[CharLm.trainDistributed]] from in-memory training). */
  private def cpStarts(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length) + 1)
    var i = 0; var n = 0
    while (i < s.length) {
      out(n) = i; n += 1
      i += Character.charCount(s.codePointAt(i))
    }
    out(n) = s.length
    out
  }

  /** Stupid-Backoff score of the code point at position i given its context.
    * NOTE: the count maps erase to boxed values, and Scala unboxes an
    * absent-key null to 0L for a primitive-typed value — so membership is
    * tested with getOrDefault + `> 0`, never `!= null`. */
  private def scoreAt(s: String, starts: Array[Int], i: Int): Double = {
    var k = math.min(order - 1, i) // context length (code points) to try first
    var factor = 1.0
    while (k >= 1) {
      val c = grams.getOrDefault(s.substring(starts(i - k), starts(i)), 0L)
      if (c > 0L) {
        val hit = grams.getOrDefault(s.substring(starts(i - k), starts(i + 1)), 0L)
        if (hit > 0L) return factor * hit.toDouble / c.toDouble
      }
      factor *= backoff
      k -= 1
    }
    // Laplace unigram floor (alphabet + 1 OOV slot): strictly positive
    val cnt = unigram.getOrDefault(s.substring(starts(i), starts(i + 1)), 0L)
    factor * (cnt + 1).toDouble / (totalChars + alphabetSize + 1).toDouble
  }

  /** Bits per character (code point) of the normalized text (0.0 for
    * empty/blank). */
  def bitsPerChar(text: String): Double = {
    if (text == null) return 0.0
    val s = normalize(text)
    if (s.isEmpty) return 0.0
    val starts = cpStarts(s)
    val n = starts.length - 1
    var bits = 0.0
    var i = 0
    while (i < n) {
      bits -= math.log(scoreAt(s, starts, i)) / math.log(2.0)
      i += 1
    }
    bits / n
  }

  /** floor(1000 × bits/char) — the integer-exact thresholding surface. */
  def bitsMilli(text: String): Long = math.floor(1000.0 * bitsPerChar(text)).toLong

  /** Deterministic byte image (explicit layout, UTF-8 gram keys sorted so
    * identical models always serialize to identical bytes regardless of
    * map iteration order) — persist a trained LM next to the corpus it
    * scores, reload with [[CharLm.fromBytes]]. */
  def toBytes: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    o.writeInt(CharLm.Magic)
    o.writeInt(order)
    o.writeLong(totalChars)
    o.writeInt(alphabetSize)
    def writeMap(m: java.util.HashMap[String, Long]): Unit = {
      val keys = new java.util.ArrayList[String](m.keySet())
      java.util.Collections.sort(keys)
      o.writeInt(keys.size())
      keys.forEach { k => o.writeUTF(k); o.writeLong(m.get(k)) }
    }
    writeMap(grams)
    writeMap(unigram)
    o.flush()
    bos.toByteArray
  }
}

object CharLm {
  private val Magic = 0x47434c4d // "GCLM"

  def fromBytes(b: Array[Byte]): CharLm = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(b))
    require(in.readInt() == Magic, "not a CharLm byte image")
    val order = in.readInt()
    val total = in.readLong()
    val alphabet = in.readInt()
    def readMap(): java.util.HashMap[String, Long] = {
      val n = in.readInt()
      val m = new java.util.HashMap[String, Long](n * 2)
      var i = 0
      while (i < n) { m.put(in.readUTF(), in.readLong()); i += 1 }
      m
    }
    new CharLm(order, readMap(), readMap(), total, alphabet)
  }

  /** Train an order-n char LM: counts of every 1..order-gram of the
    * normalized corpus texts. */
  def train(corpus: Iterable[String], order: Int = 4): CharLm = {
    require(order >= 2, s"order must be >= 2, got $order")
    val grams = new java.util.HashMap[String, Long]()
    val unigram = new java.util.HashMap[String, Long]()
    var total = 0L
    // companion objects see private members: reuse the instance normalizer
    val probe = new CharLm(order, grams, unigram, 0L, 0)
    corpus.foreach { text =>
      val s = probe.normalize(text)
      val starts = probe.cpStarts(s)
      val n = starts.length - 1
      var i = 0
      while (i < n) {
        var k = 1
        while (k <= order && i + k <= n) {
          val g = s.substring(starts(i), starts(i + k))
          grams.merge(g, 1L, (a, b) => a + b)
          if (k == 1) { unigram.merge(g, 1L, (a, b) => a + b); total += 1 }
          k += 1
        }
        i += 1
      }
    }
    new CharLm(order, grams, unigram, total, unigram.size())
  }

  /** Train the LM FROM THE CORPUS, distributed — the 100-TB shape: gram
    * extraction + counting is ONE Spark explode + aggregate; only the
    * (bounded) distinct-gram table reaches the driver. All unigrams are kept
    * unconditionally (they are the alphabet — the Laplace floor and the
    * per-char totals depend on them; alphabet size is tiny); higher-order
    * grams are pruned to the top `maxGrams` by (count desc, gram) —
    * deterministic under ties, and the standard pruned-LM trade (a dropped
    * tail gram just backs off). With `maxGrams` covering every observed gram
    * the model is IDENTICAL to in-memory [[train]] (CharLmSpec pins this). */
  def trainDistributed(docs: org.apache.spark.sql.DataFrame, textCol: String,
                       order: Int = 4, maxGrams: Int = 2000000): CharLm = {
    import org.apache.spark.sql.functions._
    require(order >= 2, s"order must be >= 2, got $order")
    val probe = new CharLm(order, new java.util.HashMap, new java.util.HashMap, 0L, 0)
    val gramsOf = udf((t: String) => {
      if (t == null) Array.empty[String]
      else {
        val s = probe.normalize(t)
        val starts = probe.cpStarts(s)
        val n = starts.length - 1
        val out = new scala.collection.mutable.ArrayBuffer[String](n * order)
        var i = 0
        while (i < n) {
          var k = 1
          while (k <= order && i + k <= n) { out += s.substring(starts(i), starts(i + k)); k += 1 }
          i += 1
        }
        out.toArray
      }
    })
    val counts = docs
      .select(explode(gramsOf(col(textCol))).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
    val uni = counts.filter(length(col("g")) === 1).collect() // alphabet-bounded
    val higher = counts.filter(length(col("g")) > 1)
      .orderBy(col("n").desc, col("g"))
      .limit(maxGrams)
      .collect()
    val grams = new java.util.HashMap[String, Long]((uni.length + higher.length) * 2)
    val unigram = new java.util.HashMap[String, Long](uni.length * 2)
    var total = 0L
    uni.foreach { r =>
      val g = r.getString(0); val n = r.getLong(1)
      grams.put(g, n); unigram.put(g, n); total += n
    }
    higher.foreach(r => grams.put(r.getString(0), r.getLong(1)))
    new CharLm(order, grams, unigram, total, unigram.size())
  }

  /** The standard deterministic model: order-4 over the same embedded
    * English training prose the BPE table learns from (disjoint from every
    * evaluation fixture). Real deployments train their own with [[train]]
    * or, at corpus scale, [[trainDistributed]]. */
  lazy val standard: CharLm = train(BpeTokenizer.trainingCorpus, 4)
}
