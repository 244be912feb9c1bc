package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Relative-URL resolution per RFC 3986 §5 — the missing half of the
  * outlink pipeline: real pages carry mostly RELATIVE hrefs (the
  * reference scraper stores them raw, `Deliverable_2/Batch Data
  * Codes/scraper.py:126-150`), and [[UrlCanonUtil]] deliberately
  * rejects them (absolute-only contract), so without this kernel an
  * outlink graph silently drops the majority of real-page edges.
  *
  * Contract (the RFC's own algorithm, §5.2.2 transform + §5.2.3
  * merge + §5.2.4 remove_dot_segments + §5.3 recomposition, so the
  * RFC §5.4 reference examples are the spec):
  *   - `base` must be absolute (a scheme per RFC: letter then
  *     letters/digits/+/-/.) — otherwise null;
  *   - a ref with its own scheme REPLACES the base entirely
  *     (absolute override), dot-segments still removed;
  *   - "//h/p" keeps only the base scheme; "/p" keeps scheme +
  *     authority; "p", "./p", "../p" merge with the base path;
  *     "" keeps base path AND query; "?q" keeps base path with the
  *     new query; "#f" keeps base path and query;
  *   - the ref's fragment is carried verbatim into the result (the
  *     RFC resolves WITH fragment; [[UrlCanon]] drops it downstream);
  *   - dot-segments ("."/"..") are removed per §5.2.4 — ".." at the
  *     root is consumed silently, matching every browser.
  * Null in -> null out; no exceptions ever (totality, like every
  * crawl kernel). */
object UrlResolveUtil {

  /** (scheme, authority, path, query, fragment) — null = ABSENT
    * component (an empty string is a present-but-empty component,
    * the distinction §5.2.2 depends on: "?" sets an empty query,
    * no "?" keeps the base's). */
  private final class Parts(
      val scheme: String, val auth: String, val path: String,
      val query: String, val frag: String)

  private def validScheme(s: String): Boolean =
    s.nonEmpty && s.charAt(0).isLetter && s.forall(c =>
      c.isLetterOrDigit || c == '+' || c == '-' || c == '.')

  /** RFC 3986 appendix-B decomposition, written as one forward walk
    * (no regex in the hot path). */
  private def split(u: String): Parts = {
    var rest = u
    var frag: String = null
    val h = rest.indexOf('#')
    if (h >= 0) { frag = rest.substring(h + 1); rest = rest.substring(0, h) }
    var query: String = null
    val q = rest.indexOf('?')
    if (q >= 0) { query = rest.substring(q + 1); rest = rest.substring(0, q) }
    var scheme: String = null
    val c = rest.indexOf(':')
    // a ':' before any '/' whose prefix is a valid scheme token
    if (c > 0) {
      val cand = rest.substring(0, c)
      val slash = rest.indexOf('/')
      if ((slash < 0 || c < slash) && validScheme(cand)) {
        scheme = cand.toLowerCase(java.util.Locale.ROOT)
        rest = rest.substring(c + 1)
      }
    }
    var auth: String = null
    if (rest.startsWith("//")) {
      var e = 2
      while (e < rest.length && rest.charAt(e) != '/') e += 1
      auth = rest.substring(2, e)
      rest = rest.substring(e)
    }
    new Parts(scheme, auth, rest, query, frag)
  }

  /** §5.2.4 remove_dot_segments — the RFC's buffer algorithm
    * verbatim (cases A-E), so the §5.4 examples hold by
    * construction. */
  private[plans] def removeDots(path: String): String = {
    var in = path
    val out = new java.lang.StringBuilder(path.length)
    def trimLastSeg(): Unit = {
      var i = out.length - 1
      while (i >= 0 && out.charAt(i) != '/') i -= 1
      out.setLength(math.max(i, 0))
    }
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4); trimLastSeg()
      } else if (in == "/..") { in = "/"; trimLastSeg() }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.charAt(0) == '/') 1 else 0
        var e = start
        while (e < in.length && in.charAt(e) != '/') e += 1
        out.append(in, 0, e)
        in = in.substring(e)
      }
    }
    out.toString
  }

  /** §5.2.3 merge. */
  private def merge(baseAuth: String, basePath: String,
      refPath: String): String = {
    if (baseAuth != null && basePath.isEmpty) "/" + refPath
    else {
      val k = basePath.lastIndexOf('/')
      if (k < 0) refPath else basePath.substring(0, k + 1) + refPath
    }
  }

  /** resolve(base, ref) -> absolute URL string, or null when the
    * base is not absolute. */
  def resolve(base: String, ref: String): String = {
    val b = split(base)
    if (b.scheme == null) return null
    val r = split(ref)
    var scheme: String = null
    var auth: String = null
    var path: String = null
    var query: String = null
    if (r.scheme != null) {
      scheme = r.scheme; auth = r.auth
      path = removeDots(r.path); query = r.query
    } else {
      scheme = b.scheme
      if (r.auth != null) {
        auth = r.auth; path = removeDots(r.path); query = r.query
      } else {
        auth = b.auth
        if (r.path.isEmpty) {
          path = b.path
          query = if (r.query != null) r.query else b.query
        } else {
          path =
            if (r.path.charAt(0) == '/') removeDots(r.path)
            else removeDots(merge(b.auth, b.path, r.path))
          query = r.query
        }
      }
    }
    val sb = new java.lang.StringBuilder(
      base.length + (if (ref == null) 0 else ref.length) + 4)
    sb.append(scheme).append(':')
    if (auth != null) sb.append("//").append(auth)
    sb.append(path)
    if (query != null) sb.append('?').append(query)
    if (r.frag != null) sb.append('#').append(r.frag)
    sb.toString
  }
}

/** resolve_url(base, ref) -> the ref resolved against the absolute
  * base per RFC 3986 §5; null when either input is null or the base
  * has no scheme. Compose with [[UrlCanon]] for crawl keys:
  * url_canon(resolve_url(page_url, href)). */
case class UrlResolve(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "resolve_url expects (string, string)")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(b: Any, r: Any): Any = {
    val res = UrlResolveUtil.resolve(b.toString, r.toString)
    if (res == null) null else UTF8String.fromString(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = UrlResolveUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val utf8 = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, (b, r) => {
      val tmp = ctx.freshName("resolved")
      s"""
        |String $tmp = $util.resolve($b.toString(), $r.toString());
        |if ($tmp == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $utf8.fromString($tmp); }
      """.stripMargin
    })
  }

  override def prettyName: String = "resolve_url"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UrlResolve =
    copy(left = newLeft, right = newRight)
}

object UrlResolveExpr {
  def resolveUrl(base: Column, ref: Column): Column =
    Bridge.toColumn(UrlResolve(Bridge.toExpression(base),
      Bridge.toExpression(ref)))
}
