package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.aggs.SketchUdafs
import graft.spark.fns.SketchFunctions

/** The public surfaces: the driver's entry(), the SQL-registered functions,
  * and the generator-shaped qf_hashes. */
class SurfaceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("entry() flagship returns per-lang verified sketch battery rows") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.length == graft.spark.io.PagesGen.langs.length)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_pages")) > 0)
      // every sketch-vs-exact check must hold on the deterministic fixture
      Seq("hll_ok", "bloom_ok", "hh_ok", "p50_ok", "p95_ok", "p99_ok").foreach { c =>
        assert(r.getBoolean(r.fieldIndex(c)), s"$c false for ${r.getString(0)}")
      }
      assert(r.getString(r.fieldIndex("top_domain")) == "d0.example.com")
    }
  }

  test("SQL surface: registered aggregates + scalar functions end to end") {
    SketchUdafs.registerAll(spark)
    SketchFunctions.registerAll(spark)
    spark.range(0, 1000, 1, 4)
      .select(concat(lit("u"), col("id") % 300).as("k"))
      .createOrReplaceTempView("keys")
    val row = spark.sql(
      """SELECT hll_count(k) AS distinct_k,
        |       bf_estimate(bloom_agg(k)) AS bloom_est,
        |       fnv1a64('this is a test', 0) AS h
        |FROM keys""".stripMargin).head()
    assert(math.abs(row.getLong(0) - 300L) <= 5)
    assert(math.abs(row.getLong(1) - 300L) <= 10)
    assert(row.getLong(2) == java.lang.Long.parseUnsignedLong("4040040117721899264"))
  }

  test("qf_hashes generator: sketch -> rows, losslessly") {
    val df = spark.range(0, 500, 1, 4).select(concat(lit("v"), col("id")).as("k"))
    val qfBytes = df.agg(SketchUdafs.quotientFilter(14)(col("k"))).head().getAs[Array[Byte]](0)
    val hashes = spark.createDataFrame(Seq(Tuple1(qfBytes))).toDF("qf")
      .select(explode(SketchFunctions.qfHashes(col("qf"))).as("h"))
    val got = hashes.collect().map(_.getLong(0)).toSet
    val expected = (0 until 500).map(i => graft.hash.Fnv.fnv1a32(s"v$i", 0) & 0xffffffffL).toSet
    assert(got == expected)
  }

  test("windowed stream threshold emits keys crossing the threshold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, String)]
    val out = graft.spark.streaming.StreamingSketches.windowedThreshold(
      mem.toDF().toDF("ts", "key"), "ts", "key", threshold = 20, windowDur = "1 hour")
    val q = out.writeStream.format("memory").queryName("st_stream").outputMode("append").start()
    try {
      val t0 = java.time.Instant.parse("2026-01-01T00:00:00Z")
      def ts(min: Long) = java.sql.Timestamp.from(t0.plusSeconds(min * 60))
      // "hot" appears 30x in the first hour, "cold" 5x
      mem.addData((0 until 30).map(i => (ts(i % 50), "hot")) ++ (0 until 5).map(i => (ts(i), "cold")): _*)
      mem.addData((ts(300), "late")) // advance watermark
      q.processAllAvailable()
      val rows = spark.sql("SELECT key, est_count FROM st_stream").collect()
      val keys = rows.map(_.getString(0)).toSet
      assert(keys.contains("hot") && !keys.contains("cold"))
    } finally q.stop()
  }
}

/** Native Catalyst expressions: correctness + they stay inside whole-stage
  * codegen (no ScalaUDF eval boundary). */
class NativeExprSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import graft.spark.fns.SketchExpressions._

  test("fnv1a64Native matches the kernel and rides WholeStageCodegen") {
    val df = spark.range(0, 100, 1, 2)
      .select(concat(lit("key-"), col("id")).as("k"))
      .select(col("k"), fnv1a64Native(col("k")).as("h"))
    df.collect().foreach { r =>
      assert(r.getLong(1) == graft.hash.Fnv.fnv1a64(r.getString(0), 0))
    }
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("bloomMightContainNative probes correctly inside codegen") {
    val blm = graft.core.BloomFilter.empty(10000, 0.001)
    (0 until 1000).foreach(i => blm.add(s"u$i"))
    val df = spark.range(0, 3000, 1, 4)
      .select(concat(lit("u"), col("id")).as("k"))
      .filter(bloomMightContainNative(blm.toBytes, col("k")))
    val got = df.collect().map(_.getString(0)).toSet
    (0 until 1000).foreach(i => assert(got.contains(s"u$i"), s"false negative u$i"))
    // FPs possible but bounded: p=0.001 on 2000 absent probes
    assert(got.size <= 1010)
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Filter"),
      df.queryExecution.executedPlan.toString)
  }
}

/** langId on genuinely multilingual inputs (scripts + stopwords). */
class LangIdSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  test("script and stopword detection") {
    import spark.implicits._
    val docs = Seq(
      ("en", "the cat sat on the mat and it was a good day for the cat"),
      ("de", "der hund und die katze sind nicht in der küche mit dem ball"),
      ("fr", "le chat est dans la maison et il est pour les amis du village"),
      ("es", "el perro y la casa son para los amigos que viven en el pueblo"),
      ("ru", "это не так как в прошлом году но что из этого по сути"),
      ("zh", "这是一个关于网络爬虫和数据处理的测试文档内容很长"),
      ("ja", "これはテストのドキュメントですとても長い文章になります"))
      .toDF("expected", "text")
    val out = docs.select(col("expected"),
      graft.spark.text.TextFunctions.langId(col("text")).as("got")).collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1),
      s"expected ${r.getString(0)} got ${r.getString(1)}"))
  }
}

/** Native TypedImperativeAggregate HLL: identical estimates to the udaf path
  * (ASCII zero-copy fold == codepoint fold), non-ASCII exact fallback. */
class NativeHllSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import graft.spark.aggs.{NativeHllCountAgg, SketchUdafs}

  test("native HLL equals udaf HLL on ascii keys; partition invariant") {
    val df8 = spark.range(0, 30000, 1, 8).select(concat(lit("https://d"), col("id") % 7, lit(".x/p/"), col("id")).as("k"))
    val native = df8.agg(NativeHllCountAgg.hllCountNative(col("k"), 14)).head().getLong(0)
    val viaUdaf = df8.agg(SketchUdafs.hllCount(14)(col("k"))).head().getLong(0)
    assert(native == viaUdaf)
    val df1 = spark.range(0, 30000, 1, 1).select(concat(lit("https://d"), col("id") % 7, lit(".x/p/"), col("id")).as("k"))
    assert(df1.agg(NativeHllCountAgg.hllCountNative(col("k"), 14)).head().getLong(0) == native)
  }

  test("native HLL non-ascii fallback matches codepoint semantics") {
    import spark.implicits._
    val keys = (0 until 2000).map(i => s"ключ-$i 键$i")
    val df = spark.createDataset(keys).toDF("k").repartition(4)
    val native = df.agg(NativeHllCountAgg.hllCountNative(col("k"), 12)).head().getLong(0)
    val viaUdaf = df.agg(SketchUdafs.hllCount(12)(col("k"))).head().getLong(0)
    assert(native == viaUdaf)
  }
}

/** Codegen'd CMS/CBF probes: values match the core sketches inside codegen. */
class NativeProbeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import graft.spark.fns.SketchExpressions._

  test("cmsCountNative + cbfCountNative match core counts in codegen") {
    val cms = graft.core.CountMinSketch.empty(2048, 5)
    val cbf = graft.core.CountingBloomFilter.empty(2000, 0.01)
    (0 until 1000).foreach { i => val k = s"k${i % 40}"; cms.add(k); cbf.add(k) }
    val df = spark.range(0, 40, 1, 2)
      .select(concat(lit("k"), col("id")).as("k"))
      .select(col("k"),
        cmsCountNative(cms.toBytes, col("k")).as("cms"),
        cbfCountNative(cbf.toBytes, col("k")).as("cbf"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    df.collect().foreach { r =>
      assert(r.getLong(1) == cms.check(r.getString(0)))
      assert(r.getLong(2) == cbf.check(r.getString(0)))
      assert(r.getLong(1) == 25L)
    }
  }
}

/** Native CMS aggregate: byte-identical output vs udaf path, partition
  * invariant, non-ASCII fallback exact. */
class NativeCmsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import graft.spark.aggs.{NativeCmsAgg, SketchUdafs}

  test("native CMS == udaf CMS bytes on ascii and non-ascii keys") {
    val df = spark.range(0, 8000, 1, 8)
      .select(concat(lit("key-"), col("id") % 60).as("k"), (col("id") % 5 + 1).as("c"))
    val native = df.agg(NativeCmsAgg.cmsNative(col("k"), col("c"), 1024, 5)).head().getAs[Array[Byte]](0)
    val viaUdaf = df.agg(SketchUdafs.cms(1024, 5)(col("k"), col("c"))).head().getAs[Array[Byte]](0)
    assert(native.toSeq == viaUdaf.toSeq)

    import spark.implicits._
    val uni = (0 until 500).map(i => (s"ключ-${i % 20}", 2L)).toDF("k", "c").repartition(4)
    val n2 = uni.agg(NativeCmsAgg.cmsNative(col("k"), col("c"), 512, 5)).head().getAs[Array[Byte]](0)
    val u2 = uni.agg(SketchUdafs.cms(512, 5)(col("k"), col("c"))).head().getAs[Array[Byte]](0)
    assert(n2.toSeq == u2.toSeq)
    assert(graft.core.CountMinSketch.fromBytes(n2).check("ключ-3") == 50)
  }
}
