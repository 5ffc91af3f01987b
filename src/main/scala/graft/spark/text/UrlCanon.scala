package graft.spark.text

/** From-scratch URL canonicalization — the normalization step web-crawl
  * pipelines run before URL-keyed dedup (every crawl dedups by URL first;
  * the rules below are the standard RFC 3986 §6 normalizations plus the
  * universally applied tracking-parameter strip).
  *
  * Rules (conservative — byte-level content like percent-encoding and
  * duplicate slashes is left untouched):
  *   - scheme and host lowercase (userinfo, if any, preserved verbatim);
  *   - default ports stripped (http:80, https:443); other ports kept;
  *   - empty path → "/";
  *   - fragment dropped;
  *   - query: tracking parameters removed (utm_* prefix, fbclid, gclid,
  *     msclkid, mc_eid, igshid), empty components dropped, the rest sorted
  *     lexicographically as whole "key=value" strings — param ORDER is
  *     presentation, not identity (deterministic and idempotent; note this
  *     is NOT a (key, value) tuple sort when one key is a prefix of
  *     another, e.g. 'a' vs 'a-b', since '-' < '='); a query left empty
  *     drops its '?'.
  *
  * Non-URLs (no "://") pass through unchanged. Idempotent by construction
  * (UrlCanonSpec pins canon(canon(x)) == canon(x) on every fixture).
  */
object UrlCanon extends Serializable {

  private val trackingExact = Set("fbclid", "gclid", "msclkid", "mc_eid", "igshid")

  private def isTracking(param: String): Boolean = {
    val eq = param.indexOf('=')
    val key = if (eq < 0) param else param.substring(0, eq)
    key.startsWith("utm_") || trackingExact.contains(key)
  }

  def canonicalize(url: String): String = {
    if (url == null) return null
    val sep = url.indexOf("://")
    if (sep < 0) return url
    val scheme = url.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    val rest = url.substring(sep + 3)
    // authority ends at the first '/', '?' or '#'
    var aEnd = rest.length
    var i = 0
    while (i < rest.length && aEnd == rest.length) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?' || c == '#') aEnd = i
      i += 1
    }
    val authority = rest.substring(0, aEnd)
    val tail = rest.substring(aEnd)
    // split userinfo@hostport
    val at = authority.lastIndexOf('@')
    val userinfo = if (at < 0) "" else authority.substring(0, at + 1)
    val hostPort = authority.substring(at + 1)
    val colon = hostPort.lastIndexOf(':')
    // a ':' inside an IPv6 literal "[...]" is not a port separator
    val bracket = hostPort.indexOf(']')
    val (host0, port) =
      if (colon > bracket) (hostPort.substring(0, colon), hostPort.substring(colon + 1))
      else (hostPort, "")
    val host = host0.toLowerCase(java.util.Locale.ROOT)
    val keepPort = port.nonEmpty &&
      !((scheme == "http" && port == "80") || (scheme == "https" && port == "443"))

    // split tail into path / query / fragment (fragment dropped)
    val hash = tail.indexOf('#')
    val noFrag = if (hash < 0) tail else tail.substring(0, hash)
    val q = noFrag.indexOf('?')
    val path0 = if (q < 0) noFrag else noFrag.substring(0, q)
    val query0 = if (q < 0) "" else noFrag.substring(q + 1)
    val path = if (path0.isEmpty) "/" else path0
    val params = query0.split("&", -1).toSeq
      .filter(p => p.nonEmpty && !isTracking(p))
      .sorted
    val sb = new java.lang.StringBuilder(url.length)
    sb.append(scheme).append("://").append(userinfo).append(host)
    if (keepPort) sb.append(':').append(port)
    sb.append(path)
    if (params.nonEmpty) sb.append('?').append(params.mkString("&"))
    sb.toString
  }
}
