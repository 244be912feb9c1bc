package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization for crawl dedup — the rule set every
  * outlink-graph / URL-dedup stage needs (the reference scraper's
  * link handling, `Deliverable_2/Batch Data Codes/scraper.py:76-85,
  * 126-150`, keeps raw hrefs; canonicalization is the missing half
  * that makes them joinable keys). One forward parse, no regex, no
  * java.net.URL (whose equals() does DNS lookups — a non-starter in
  * an executor hot path).
  *
  * Contract (string-chain-statable so a DuckDB oracle reproduces it,
  * q_url_canon pins cross-engine equality):
  *   1. absolute URLs only: no "scheme://" (or a malformed scheme —
  *      must start with a letter, then letters/digits/plus/minus/dot)
  *      → null (reject, don't guess; relative-link resolution is a
  *      different operator);
  *   2. scheme and host lowercase; an empty host → null;
  *   3. an explicit default port drops (http:80, https:443); any
  *      other digit-run port keeps verbatim; a bare trailing colon
  *      drops; a non-digit port → null (malformed authority);
  *   4. the fragment drops entirely;
  *   5. query params split on '&': empty tokens drop, and a param
  *      whose NAME (token up to the first '=') lowercases to a
  *      tracking key — utm_* prefix, gclid, fbclid, msclkid, mc_eid
  *      — drops; survivors keep order and byte content; an emptied
  *      query drops its '?';
  *   6. an empty path becomes "/" (http://h and http://h/ must
  *      collide for dedup); non-empty paths keep case and content
  *      (paths are case-sensitive per RFC 3986);
  *   7. percent-encoding normalizes per RFC 3986 §6.2.2 (r14, on
  *      host, path and query): an escape of an UNRESERVED character
  *      (ALPHA / DIGIT / '-' / '.' / '_' / '~') decodes ("%7E"→'~',
  *      "%41"→'A' — equal URLs must stop producing distinct dedup
  *      keys), any other valid escape uppercases its hex ("%2f"→
  *      "%2F"), and a malformed escape ('%' not followed by two hex
  *      digits) keeps verbatim — normalization is TOTAL and
  *      idempotent. The query normalizes BEFORE the tracking-param
  *      split, so an escaped tracking name ("%75tm_source") cannot
  *      smuggle past rule 5. Reserved escapes ("%2F", "%26") never
  *      decode — decoding them would change the URL's structure.
  * Userinfo ("user@host") is out of contract and lowercases with the
  * host — acceptable for crawl keys, documented here. */
object UrlCanonUtil {

  private val dropExact = Set("gclid", "fbclid", "msclkid", "mc_eid")

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else -1

  private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' ||
      v == '~'

  /** RFC 3986 §6.2.2 escape normalization (rule 7). One pass; the
    * common no-'%' string returns itself with zero allocation. */
  private[plans] def pctNorm(s: String): String = {
    var i = s.indexOf('%')
    if (i < 0) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    sb.append(s, 0, i)
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < n && hexVal(s.charAt(i + 1)) >= 0 &&
          hexVal(s.charAt(i + 2)) >= 0) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (isUnreserved(v)) sb.append(v.toChar)
        else sb.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isTracking(tok: String): Boolean = {
    val e = tok.indexOf('=')
    val name = (if (e < 0) tok else tok.substring(0, e)).toLowerCase(java.util.Locale.ROOT)
    name.startsWith("utm_") || dropExact.contains(name)
  }

  def canon(u: String): String = {
    val ss = u.indexOf("://")
    if (ss <= 0) return null
    var i = 0
    while (i < ss) {
      val c = u.charAt(i)
      val ok =
        if (i == 0) c.isLetter
        else c.isLetterOrDigit || c == '+' || c == '-' || c == '.'
      if (!ok) return null
      i += 1
    }
    val scheme = u.substring(0, ss).toLowerCase(java.util.Locale.ROOT)
    val rest = u.substring(ss + 3)
    val n = rest.length
    // authority ends at the first '/', '?' or '#'
    var ae = 0
    while (ae < n && rest.charAt(ae) != '/' && rest.charAt(ae) != '?' &&
      rest.charAt(ae) != '#') ae += 1
    val auth = rest.substring(0, ae)
    val colon = auth.lastIndexOf(':')
    var host: String = null
    var port: String = null
    if (colon < 0) host = pctNorm(auth).toLowerCase(java.util.Locale.ROOT)
    else {
      val p = auth.substring(colon + 1)
      if (p.forall(_.isDigit)) { // includes the bare-colon "" case
        host = pctNorm(auth.substring(0, colon))
          .toLowerCase(java.util.Locale.ROOT)
        port = p
      } else return null // non-digit port: malformed authority
    }
    if (host.isEmpty) return null
    val keepPort = port != null && port.nonEmpty &&
      !((scheme == "http" && port == "80") ||
        (scheme == "https" && port == "443"))
    // path ends at the first '?' or '#'
    var pe = ae
    while (pe < n && rest.charAt(pe) != '?' && rest.charAt(pe) != '#')
      pe += 1
    val path = if (pe == ae) "/" else pctNorm(rest.substring(ae, pe))
    // query sits between '?' and '#' (or end); fragment drops.
    // pctNorm runs BEFORE the split so escaped tracking names can't
    // smuggle past rule 5 (docstring rule 7).
    var kept = ""
    if (pe < n && rest.charAt(pe) == '?') {
      var qEnd = pe + 1
      while (qEnd < n && rest.charAt(qEnd) != '#') qEnd += 1
      val query = pctNorm(rest.substring(pe + 1, qEnd))
      kept = query.split("&", -1).iterator
        .filter(t => t.nonEmpty && !isTracking(t)).mkString("&")
    }
    val sb = new java.lang.StringBuilder(u.length)
    sb.append(scheme).append("://").append(host)
    if (keepPort) sb.append(':').append(port)
    sb.append(path)
    if (kept.nonEmpty) sb.append('?').append(kept)
    sb.toString
  }
}

/** url_canon(url): the canonical crawl key per [[UrlCanonUtil]]'s
  * contract. Null in -> null out; a non-absolute or malformed URL ->
  * null (never a guess). */
case class UrlCanon(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"url_canon expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val r = UrlCanonUtil.canon(input.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = UrlCanonUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val utf8 = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, x => {
      val tmp = ctx.freshName("canon")
      s"""
        |String $tmp = $util.canon($x.toString());
        |if ($tmp == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $utf8.fromString($tmp); }
      """.stripMargin
    })
  }

  override def prettyName: String = "url_canon"
  override protected def withNewChildInternal(newChild: Expression): UrlCanon =
    copy(child = newChild)
}

object UrlCanonExpr {
  def urlCanon(url: Column): Column =
    Bridge.toColumn(UrlCanon(Bridge.toExpression(url)))
}
