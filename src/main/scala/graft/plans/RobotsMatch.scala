package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, StringType}

/** robots.txt evaluation — the politeness gate between the outlink
  * frontier ([[graft.plans.UrlCanon]], q_outlink_hosts) and the
  * fetcher: may `userAgent` fetch `path` under this robots.txt?
  *
  * Contract (RFC 9309 semantics, pinned where the RFC leaves room so
  * a SQL oracle can reproduce decisions):
  *   1. lines split on '\n' ('\r' trimmed), '#' comments stripped,
  *      field names case-insensitive;
  *   2. groups: consecutive User-agent lines share the rule block
  *      that follows, until the next User-agent line that comes
  *      after at least one rule;
  *   3. group selection: groups whose agent token equals the UA
  *      (case-insensitive, exact token) win; if none, the '*' groups
  *      apply; ALL selected groups' rules merge;
  *   4. rule match: Allow/Disallow patterns match the path from its
  *      start, '*' matches any run, '$' anchors the end; the rule
  *      with the LONGEST pattern (raw octets, '$' included) wins;
  *      equal lengths tie toward Allow; an empty Disallow pattern
  *      matches nothing;
  *   5. no matching rule (or no applicable group, or empty/absent
  *      robots.txt) => allowed.
  * Null inputs -> null. Per-row parse, O(|txt| + rules x |path|) —
  * robots files are KB-sized by convention; for a host-keyed corpus
  * the natural plan is one DISTINCT robots.txt per host joined to
  * its paths, which this kernel evaluates row by row after the
  * join. */
object RobotsUtil {

  /** Greedy glob match of `pattern` against `path` FROM THE START
    * ('*' = any run, '$' only meaningful at pattern end = anchor).
    * A pattern without '$' matches any path having it as a
    * (wildcard) prefix. */
  private[plans] def ruleMatches(pattern: String, path: String): Boolean = {
    if (pattern.isEmpty) return false
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.substring(0, pattern.length - 1)
      else pattern
    // classic iterative glob with '*' backtracking; an UNANCHORED
    // pattern succeeds the moment it is consumed (prefix semantics) —
    // that check must come BEFORE star backtracking, or a pattern
    // exhausted mid-path would backtrack into its '*' and fail on
    // paths it prefixes (e.g. "/*/secret" vs "/q/secretx")
    var pi = 0
    var si = 0
    var star = -1
    var mark = 0
    val pn = p.length
    val sn = path.length
    while (si < sn) {
      if (pi == pn && !anchored) return true
      if (pi < pn && (p.charAt(pi) == path.charAt(si))) { pi += 1; si += 1 }
      else if (pi < pn && p.charAt(pi) == '*') { star = pi; mark = si; pi += 1 }
      else if (star >= 0) { pi = star + 1; mark += 1; si = mark }
      else return false
    }
    // path consumed: remaining pattern must be all '*'
    while (pi < pn && p.charAt(pi) == '*') pi += 1
    pi == pn
  }

  private final case class Rule(allow: Boolean, pattern: String)

  /** One parse serving both decisions: the UA-applicable rule list
    * (exact groups shadow '*' groups entirely) and the applicable
    * Crawl-delay (first value of the winning tier — rate limits are
    * per-host policy, a second declaration is a file bug we resolve
    * deterministically). */
  private def parseFor(txt: String,
      ua: String): (List[Rule], Option[Double]) = {
    val uaLc = ua.toLowerCase(java.util.Locale.ROOT)
    var exactRules = List.empty[Rule]
    var starRules = List.empty[Rule]
    var exactDelay: Option[Double] = None
    var starDelay: Option[Double] = None
    var curAgents = List.empty[String]
    var curHasRules = false
    var curApplies = false
    var curStar = false
    def flushLine(name: String, value: String): Unit = name match {
      case "user-agent" =>
        if (curHasRules) { // a new group starts
          curAgents = Nil; curHasRules = false
          curApplies = false; curStar = false
        }
        val agent = value.toLowerCase(java.util.Locale.ROOT)
        curAgents = agent :: curAgents
        if (agent == uaLc) curApplies = true
        if (agent == "*") curStar = true
      case "allow" | "disallow" =>
        if (curAgents.nonEmpty) {
          curHasRules = true
          val r = Rule(name == "allow", value)
          if (curApplies) exactRules ::= r
          else if (curStar) starRules ::= r
        }
      case "crawl-delay" =>
        if (curAgents.nonEmpty) {
          curHasRules = true
          val d =
            try {
              val v = value.toDouble
              if (v >= 0 && !v.isNaN && !v.isInfinite) Some(v) else None
            } catch { case _: NumberFormatException => None }
          if (d.isDefined) {
            if (curApplies && exactDelay.isEmpty) exactDelay = d
            else if (!curApplies && curStar && starDelay.isEmpty)
              starDelay = d
          }
        }
      case _ => () // sitemap, unknown fields: ignored
    }
    var start = 0
    val n = txt.length
    while (start <= n) {
      var end = txt.indexOf('\n', start)
      if (end < 0) end = n
      var line = txt.substring(start, end)
      val hash = line.indexOf('#')
      if (hash >= 0) line = line.substring(0, hash)
      line = line.trim
      val colon = line.indexOf(':')
      if (colon > 0)
        flushLine(line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT),
          line.substring(colon + 1).trim)
      start = end + 1
    }
    if (exactRules.nonEmpty || exactDelay.isDefined)
      (exactRules, exactDelay)
    else (starRules, starDelay)
  }

  /** Decision for (txt, ua, path) per the pinned contract. */
  def allowed(txt: String, ua: String, path: String): Boolean = {
    val (rules, _) = parseFor(txt, ua)
    // longest pattern wins; ties toward Allow; no match => allowed
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (r.pattern.nonEmpty && ruleMatches(r.pattern, path)) {
        val len = r.pattern.length
        if (len > bestLen || (len == bestLen && r.allow)) {
          bestLen = len
          bestAllow = r.allow
        }
      }
    }
    bestAllow
  }

  /** The applicable Crawl-delay in seconds (the de-facto extension
    * every crawler honors; not in RFC 9309): first value of the
    * winning agent tier, null when none declared. Boxed so the
    * expression can return SQL NULL. */
  def crawlDelay(txt: String, ua: String): java.lang.Double = {
    val (_, delay) = parseFor(txt, ua)
    delay.map(java.lang.Double.valueOf).orNull
  }

  /** Every `Sitemap:` directive of the file, in order, one per line
    * (RFC 9309 §2.3 allows them anywhere and OUTSIDE any group —
    * they are crawler-agnostic, so no UA parameter); values verbatim
    * after trim, comments/'\r' handled like every other line, null
    * when none. The discovery half of the politeness file: these
    * URLs feed [[graft.plans.HtmlText.SitemapUtil]] via the fetch
    * path. */
  def sitemaps(txt: String): String = {
    val out = new java.lang.StringBuilder
    var found = false
    var start = 0
    val n = txt.length
    while (start <= n) {
      var end = txt.indexOf('\n', start)
      if (end < 0) end = n
      var line = txt.substring(start, end)
      val hash = line.indexOf('#')
      if (hash >= 0) line = line.substring(0, hash)
      line = line.trim
      val colon = line.indexOf(':')
      if (colon > 0 &&
          line.substring(0, colon).trim
            .toLowerCase(java.util.Locale.ROOT) == "sitemap") {
        val v = line.substring(colon + 1).trim
        if (v.nonEmpty) {
          if (found) out.append('\n')
          out.append(v)
          found = true
        }
      }
      start = end + 1
    }
    if (found) out.toString else null
  }
}

/** robots_allowed(txt, user_agent, path) -> boolean. Null if any
  * input is null. */
case class RobotsAllowed(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second, third).forall(_.dataType == StringType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "robots_allowed expects (string, string, string)")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def nullSafeEval(t: Any, u: Any, p: Any): Any =
    RobotsUtil.allowed(t.toString, u.toString, p.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = RobotsUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (t, u, p) =>
      s"${ev.value} = $util.allowed($t.toString(), $u.toString(), " +
        s"$p.toString());")
  }

  override def prettyName: String = "robots_allowed"
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): RobotsAllowed =
    copy(first = f, second = s, third = t)
}

/** robots_crawl_delay(txt, user_agent) -> double seconds; null when
  * none declared for the applicable agent tier, or on null input. */
case class RobotsCrawlDelay(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "robots_crawl_delay expects (string, string)")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(t: Any, u: Any): Any =
    RobotsUtil.crawlDelay(t.toString, u.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = RobotsUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (t, u) => {
      val tmp = ctx.freshName("delay")
      s"""
        |java.lang.Double $tmp = $util.crawlDelay($t.toString(), $u.toString());
        |if ($tmp == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $tmp.doubleValue(); }
      """.stripMargin
    })
  }

  override def prettyName: String = "robots_crawl_delay"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsCrawlDelay =
    copy(left = newLeft, right = newRight)
}

/** robots_sitemaps(txt) -> newline-joined Sitemap directive values
  * in file order; null when none declared or on null input. */
case class RobotsSitemaps(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"robots_sitemaps expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val r = RobotsUtil.sitemaps(input.toString)
    if (r == null) null
    else org.apache.spark.unsafe.types.UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = RobotsUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val utf8 = "org.apache.spark.unsafe.types.UTF8String"
    nullSafeCodeGen(ctx, ev, x => {
      val tmp = ctx.freshName("smaps")
      s"""
        |String $tmp = $util.sitemaps($x.toString());
        |if ($tmp == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $utf8.fromString($tmp); }
      """.stripMargin
    })
  }

  override def prettyName: String = "robots_sitemaps"
  override protected def withNewChildInternal(newChild: Expression): RobotsSitemaps =
    copy(child = newChild)
}

object RobotsExpr {
  def robotsAllowed(txt: Column, userAgent: Column, path: Column): Column =
    Bridge.toColumn(RobotsAllowed(Bridge.toExpression(txt),
      Bridge.toExpression(userAgent), Bridge.toExpression(path)))

  def robotsCrawlDelay(txt: Column, userAgent: Column): Column =
    Bridge.toColumn(RobotsCrawlDelay(Bridge.toExpression(txt),
      Bridge.toExpression(userAgent)))

  def robotsSitemaps(txt: Column): Column =
    Bridge.toColumn(RobotsSitemaps(Bridge.toExpression(txt)))
}
