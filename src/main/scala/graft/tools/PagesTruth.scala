package graft.tools

import graft.spark.io.PagesGen

/** Dev tool: dump the deterministic ground truth of the synthetic pages table
  * (per-lang page counts, distinct urls, exact top domain) for a given nPages.
  * The q_pages_battery oracle literals in [[graft.SparkEntry]] are generated
  * from this output — rerun after any PagesGen change.
  */
object PagesTruth {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000L
    val seed = 42L
    val domainPool = 1000
    val dupPerMille = 100

    val langPages = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val langUrls = scala.collection.mutable.Map[String, scala.collection.mutable.Set[String]]()
    val langDomain = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)

    var id = 0L
    while (id < n) {
      val src = PagesGen.sourceId(seed, id, dupPerMille)
      val lang = PagesGen.langOf(seed, src)
      val url = s"https://d${PagesGen.domainOf(seed, src, domainPool)}.example.com/p/$src"
      val domain = url.stripPrefix("https://").takeWhile(_ != '/')
      langPages(lang) += 1
      langUrls.getOrElseUpdate(lang, scala.collection.mutable.Set[String]()) += url
      langDomain((lang, domain)) += 1
      id += 1
    }
    println("lang,n_pages,n_distinct_urls,top_domain,top_domain_count")
    langPages.keys.toSeq.sorted.foreach { lang =>
      val (topD, topC) = langDomain.collect { case ((l, d), c) if l == lang => (d, c) }
        .toSeq.sortBy { case (d, c) => (-c, d) }.head
      println(s"$lang,${langPages(lang)},${langUrls(lang).size},$topD,$topC")
    }
  }
}
