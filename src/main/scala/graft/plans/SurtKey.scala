package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SURT key (Sort-friendly URI Reordering Transform) — the ordering /
  * join key every web-archive index uses (Common Crawl's CDX files,
  * the Wayback Machine's indexes): reversing the host labels makes
  * one domain's captures CONTIGUOUS under a plain sort, so an
  * archive-scale index can range-partition by prefix and a per-domain
  * lookup is a bounded scan, not a full shuffle.
  *
  * Contract (pinned; compose AFTER [[UrlCanonUtil]], which owns
  * scheme validation, lowercasing, default ports, tracking params
  * and escape normalization):
  *   1. absolute URLs only — no "://" or an empty host → null;
  *   2. the scheme drops (SURT keys are scheme-agnostic: http and
  *      https captures of one page must collide);
  *   3. host labels split on '.', REVERSED, joined with ',' and
  *      lowercased ("a.b.example.org" → "org,example,b,a"); labels
  *      keep their bytes otherwise (no IDN mapping — out of
  *      contract, documented);
  *   4. an explicit port keeps as ":port" after the host list (a
  *      canon'd URL only carries non-default ports); a non-digit
  *      port → null (malformed authority, the canon rule);
  *   5. then ')' and the path + '?query' VERBATIM (case preserved —
  *      paths are case-sensitive); an empty path → "/" (canon's
  *      rule 6, so http://h and http://h/ still collide);
  *   6. the fragment drops.
  * No www-stripping and no query-param sorting — unlike the classic
  * surt library's default "canonicalized" form, those two fold
  * DISTINCT urls into one key; [[UrlCanonUtil]] already owns the
  * semantics-preserving normalizations, and the composition stays
  * injective over canon output. One forward parse, zero regex,
  * total. */
object SurtKeyUtil {

  def surt(u: String): String = {
    val ss = u.indexOf("://")
    if (ss <= 0) return null
    val rest = u.substring(ss + 3)
    val n = rest.length
    var ae = 0
    while (ae < n && rest.charAt(ae) != '/' && rest.charAt(ae) != '?' &&
      rest.charAt(ae) != '#') ae += 1
    val auth = rest.substring(0, ae)
    val colon = auth.lastIndexOf(':')
    var host = auth
    var port: String = null
    if (colon >= 0) {
      val p = auth.substring(colon + 1)
      if (p.isEmpty) host = auth.substring(0, colon) // bare colon drops
      else if (p.forall(_.isDigit)) {
        host = auth.substring(0, colon)
        port = p
      } else return null // non-digit port: malformed authority
    }
    if (host.isEmpty) return null
    val sb = new java.lang.StringBuilder(u.length)
    val labels = host.toLowerCase(java.util.Locale.ROOT).split("\\.", -1)
    var i = labels.length - 1
    while (i >= 0) {
      sb.append(labels(i))
      if (i > 0) sb.append(',')
      i -= 1
    }
    if (port != null) sb.append(':').append(port)
    sb.append(')')
    // path + query to the fragment (dropped); empty path -> '/'
    var he = ae
    while (he < n && rest.charAt(he) != '#') he += 1
    val pq = rest.substring(ae, he)
    if (pq.isEmpty) sb.append('/')
    else {
      if (pq.charAt(0) == '?') sb.append('/')
      sb.append(pq)
    }
    sb.toString
  }
}

/** surt_key(url): the archive-index ordering key per
  * [[SurtKeyUtil]]'s contract. Null in -> null out; non-absolute or
  * malformed -> null. */
case class SurtKey(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"surt_key expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val r = SurtKeyUtil.surt(input.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = SurtKeyUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val utf8 = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, x => {
      val tmp = ctx.freshName("surt")
      s"""
        |String $tmp = $util.surt($x.toString());
        |if ($tmp == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $utf8.fromString($tmp); }
      """.stripMargin
    })
  }

  override def prettyName: String = "surt_key"
  override protected def withNewChildInternal(newChild: Expression): SurtKey =
    copy(child = newChild)
}

object SurtKeyExpr {
  def surtKey(url: Column): Column =
    Bridge.toColumn(SurtKey(Bridge.toExpression(url)))
}
