package graft.spark.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import graft.hash.Fnv

/** Deduplication operators for web-scale corpora.
  *
  * Scale shape (the part that matters at 10^12 docs):
  *   - exact dedup is a single hash-aggregate on a digest column — one
  *     shuffle keyed by the digest, never by the full text;
  *   - MinHash-LSH shuffles (band_id, band_hash) buckets — candidate
  *     generation is linear in docs × bands, and the quadratic pair join is
  *     confined to within-bucket groups;
  *   - SimHash joins on 16-bit chunks (pigeonhole: hamming ≤ 3 over 64 bits
  *     ⇒ at least one of 4 chunks equal), again avoiding any full cross join.
  */
object Dedup extends Serializable {

  /** MinHash signature of a shingle set. Each shingle is string-hashed ONCE
    * (fnv-1a-64); the `numHashes` permutations are derived from that base
    * hash with a splitmix64-style finalizer per seed — O(shingles) string
    * work instead of O(shingles × numHashes), the standard one-hash
    * permutation-family construction (Broder 1997 / universal hashing). */
  val minhashSignature: UserDefinedFunction = udf((shingles: Seq[String], numHashes: Int) => {
    val sig = Array.fill(numHashes)(-1L) // unsigned max
    shingles.foreach { s =>
      val base = Fnv.fnv1a64(s, 0)
      var i = 0
      while (i < numHashes) {
        var z = base + (i + 1) * 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        if (java.lang.Long.compareUnsigned(z, sig(i)) < 0) sig(i) = z
        i += 1
      }
    }
    sig
  })

  /** 64-bit SimHash over whitespace tokens (Charikar 2002): sum ±1 per hash
    * bit weighted by term frequency, sign → bit. */
  val simhash64: UserDefinedFunction = udf((text: String) => {
    if (text == null) 0L
    else {
      val acc = new Array[Int](64)
      text.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { tok =>
        val h = Fnv.fnv1a64(tok, 0)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
      out
    }
  })

  val hamming64: UserDefinedFunction =
    udf((a: Long, b: Long) => java.lang.Long.bitCount(a ^ b))

  /** Exact Jaccard between two shingle arrays (verification stage). */
  val jaccard: UserDefinedFunction = udf((a: Seq[String], b: Seq[String]) => {
    if (a.isEmpty && b.isEmpty) 1.0
    else {
      val sa = a.toSet; val sb = b.toSet
      sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
    }
  })

  /** MinHash-LSH near-duplicate pairs.
    *
    * df must carry (idCol, textCol). Pipeline: shingle → minhash(numHashes) →
    * band → explode → bucket-join within (band, hash) → exact-Jaccard verify.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
                      threshold: Double = 0.8): DataFrame = {
    import graft.spark.text.TextFunctions.shingles
    val rows = numHashes / bands
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))

    // (doc_id, band, band_hash) only — the exploded/shuffled relation stays
    // 3 narrow columns; shingle arrays never cross an exchange
    val bandHash = udf((sig: Seq[Long], band: Int, rows: Int) => {
      var h = 0xcbf29ce484222325L ^ band
      var i = band * rows
      while (i < (band + 1) * rows) { h ^= sig(i); h *= 1099511628211L; i += 1 }
      h
    })
    val banded = base
      .withColumn("sig", minhashSignature(shingles(col("text"), lit(shingleSize)), lit(numHashes)))
      .select(col("doc_id"), explode(sequence(lit(0), lit(bands - 1))).as("band"), col("sig"))
      .withColumn("bh", bandHash(col("sig"), col("band"), lit(rows)))
      .select(col("doc_id"), col("band"), col("bh"))

    val a = banded.select(col("band").as("band_a"), col("bh").as("bh_a"), col("doc_id").as("id_a"))
    val b = banded.select(col("band").as("band_b"), col("bh").as("bh_b"), col("doc_id").as("id_b"))
    val candidates = a.join(b,
        col("band_a") === col("band_b") && col("bh_a") === col("bh_b") &&
          col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()

    // exact-Jaccard verification only on the (few) candidate pairs
    val jaccardText = udf((ta: String, tb: String, n: Int) => {
      def sh(t: String): Set[String] = {
        val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
        if (toks.length < n) Set(toks.mkString(" "))
        else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" ")).toSet
      }
      val sa = sh(ta); val sb = sh(tb)
      if (sa.isEmpty && sb.isEmpty) 1.0
      else sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
    })
    candidates
      .join(base.select(col("doc_id").as("id_a"), col("text").as("text_a")), "id_a")
      .join(base.select(col("doc_id").as("id_b"), col("text").as("text_b")), "id_b")
      .withColumn("jaccard", jaccardText(col("text_a"), col("text_b"), lit(shingleSize)))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-duplicate pairs with hamming distance <= maxHamming (<= 16
    * guaranteed findable via 16-bit chunk pigeonholing when maxHamming <= 3). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val withSim = df.select(col(idCol).as("doc_id"), simhash64(col(textCol)).as("sim"))
    val chunk = udf((sim: Long, i: Int) => (sim >>> (i * 16)) & 0xffffL)
    val chunked = withSim
      .withColumn("chunk_id", explode(sequence(lit(0), lit(3))))
      .withColumn("chunk", chunk(col("sim"), col("chunk_id")))
    val a = chunked.select(col("chunk_id").as("ci_a"), col("chunk").as("ch_a"),
      col("doc_id").as("id_a"), col("sim").as("sim_a"))
    val b = chunked.select(col("chunk_id").as("ci_b"), col("chunk").as("ch_b"),
      col("doc_id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, col("ci_a") === col("ci_b") && col("ch_a") === col("ch_b") &&
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sim_a"), col("sim_b"))
      .distinct()
      .withColumn("hamming", hamming64(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
