package graft

import org.apache.spark.sql.functions._

import graft.plans.{RobotsExpr, RobotsUtil}

/** robots.txt matcher: group selection, longest-match, wildcards and
  * anchors — the pinned RFC 9309 subset. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val txt =
    """# graft crawl policy
      |User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/public/
      |Disallow: /tmp$
      |
      |User-agent: *
      |Disallow: /
      |Allow: /open/
      |""".stripMargin

  private def ok(ua: String, path: String): Boolean =
    RobotsUtil.allowed(txt, ua, path)

  test("longest-match with Allow override, $ anchor, case-insensitive UA") {
    assert(!ok("GraftBot", "/private/x"))
    assert(ok("graftbot", "/private/public/y")) // longer Allow wins
    assert(!ok("graftbot", "/tmp")) // anchored
    assert(ok("graftbot", "/tmpfile")) // $ means no prefix match
    assert(ok("graftbot", "/open/z")) // no graftbot rule matches
    // the exact group SHADOWS the star group entirely
    assert(ok("graftbot", "/anything"))
  }

  test("star group applies only when no exact group matched") {
    assert(!ok("otherbot", "/private/x"))
    assert(!ok("otherbot", "/tmpfile")) // Disallow: /
    assert(ok("otherbot", "/open/z")) // longer Allow wins over /
  }

  test("wildcards, shared agent lines, ties, degenerate inputs") {
    val t2 = "User-agent: a\nUser-agent: b\nDisallow: /*/secret\n" +
      "Allow: /x/secret\n"
    // '*' spans path segments; both agents share the block
    assert(!RobotsUtil.allowed(t2, "a", "/any/old/secret"))
    assert(!RobotsUtil.allowed(t2, "b", "/q/secretx")) // prefix rule
    // tie on pattern LENGTH goes to Allow ("/x/secret" ties itself)
    assert(RobotsUtil.allowed(t2, "a", "/x/secret"))
    // no group for this UA and no star group: allowed
    assert(RobotsUtil.allowed(t2, "c", "/any/old/secret"))
    // empty robots, comments-only, junk lines: allowed
    assert(RobotsUtil.allowed("", "a", "/x"))
    assert(RobotsUtil.allowed("# nothing\nnoise without colon", "a", "/x"))
    // empty Disallow matches nothing
    assert(RobotsUtil.allowed("User-agent: *\nDisallow:\n", "a", "/x"))
    // CRLF line endings parse the same
    assert(!RobotsUtil.allowed(
      "User-agent: *\r\nDisallow: /x\r\n", "a", "/x/y"))
    // a new group starts at the first User-agent AFTER rules
    val t3 = "User-agent: a\nDisallow: /a\nUser-agent: b\nDisallow: /b\n"
    assert(!RobotsUtil.allowed(t3, "a", "/a1"))
    assert(RobotsUtil.allowed(t3, "a", "/b1"))
    assert(!RobotsUtil.allowed(t3, "b", "/b1"))
  }

  test("crawl-delay: winning tier, first value, junk rejected (r12)") {
    val t = "User-agent: graftbot\nCrawl-delay: 1.5\nDisallow: /x\n\n" +
      "User-agent: *\nCrawl-delay: 10\nCrawl-delay: 20\nDisallow: /\n"
    assert(RobotsUtil.crawlDelay(t, "GraftBot") == 1.5)
    // star tier; a SECOND declaration is a file bug — first wins
    assert(RobotsUtil.crawlDelay(t, "otherbot") == 10.0)
    // none declared -> null; junk values rejected -> null
    assert(RobotsUtil.crawlDelay("User-agent: *\nDisallow: /\n", "a")
      == null)
    assert(RobotsUtil.crawlDelay(
      "User-agent: *\nCrawl-delay: fast\n", "a") == null)
    assert(RobotsUtil.crawlDelay(
      "User-agent: *\nCrawl-delay: -1\n", "a") == null)
    // an exact group WITHOUT a delay still shadows the star tier
    val t2 = "User-agent: graftbot\nDisallow: /x\n\n" +
      "User-agent: *\nCrawl-delay: 10\n"
    assert(RobotsUtil.crawlDelay(t2, "graftbot") == null)
    // expression face
    import org.apache.spark.sql.functions.lit
    val v = spark.range(1).select(graft.plans.RobotsExpr
      .robotsCrawlDelay(lit(t), lit("graftbot")).as("d"))
      .collect().head.getDouble(0)
    assert(v == 1.5)
  }

  test("expression face: null in, null out; codegen plan") {
    val df = Seq((1L, txt, "graftbot", "/private/x"),
      (2L, null.asInstanceOf[String], "x", "/y"))
      .toDF("id", "txt", "ua", "path")
      .select(col("id"), RobotsExpr.robotsAllowed(col("txt"),
        col("ua"), col("path")).as("a"))
    val got = df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else Boolean.box(r.getBoolean(1)))).toMap
    assert(got == Map(1L -> Boolean.box(false), 2L -> null))
    val plan = spark.range(2).select(RobotsExpr.robotsAllowed(
      lit(txt), lit("graftbot"),
      concat(lit("/p"), col("id").cast("string"))).as("a"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("Sitemap directives: file order, decoys/comments ignored (r13)") {
    import graft.plans.RobotsUtil
    val txt = "User-agent: *\nDisallow: /private/\n" +
      "Sitemap: https://a.com/sitemap.xml\r\n" +
      "# Sitemap: https://no.com/commented.xml\n" +
      "sitemapx: https://no.com/decoy.xml\n" +
      "SITEMAP:   https://a.com/news/sitemap-2.xml.gz  \n" +
      "Sitemap:\n" // empty value drops
    assert(RobotsUtil.sitemaps(txt) ==
      "https://a.com/sitemap.xml\nhttps://a.com/news/sitemap-2.xml.gz")
    assert(RobotsUtil.sitemaps("User-agent: *\nDisallow:\n") == null)
    assert(RobotsUtil.sitemaps("") == null)
    // expression face: null in, null out
    import spark.implicits._
    val df = Seq((1L, txt), (2L, null.asInstanceOf[String]))
      .toDF("id", "txt")
      .select(col("id"), RobotsExpr.robotsSitemaps(col("txt")).as("s"))
    val got = df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got(1L).startsWith("https://a.com/sitemap.xml"))
    assert(got(2L) == null)
  }
}
