package graft

import org.apache.spark.sql.functions._

import graft.plans.{HtmlTextExpr, HtmlTextUtil}

/** html_to_text kernel: the well-formed contract (pinned outputs) and
  * the messy web — unclosed tags, unclosed script, nested tables,
  * CDATA, truncated pages — where the kernel must degrade to "drop,
  * never leak markup" rather than throw or mis-read. */
class HtmlTextSpec extends SparkSpec {
  import spark.implicits._

  private def x(s: String): String = HtmlTextUtil.extract(s)

  test("well-formed page: blocks to newlines, inline to spaces") {
    val html = "<html><body><h1>Title</h1><p>one <b>bold</b> two</p>" +
      "<div>tail</div></body></html>"
    assert(x(html) == "Title\none bold two\ntail")
  }

  test("script and style drop with their content, case-insensitive") {
    val html = "<p>a</p><SCRIPT type=\"x\">if (1 < 2) alert('&amp;')" +
      "</SCRIPT><style>p { color: red }</style><p>b</p>"
    assert(x(html) == "a\nb")
  }

  test("unclosed script drops the rest of the page") {
    assert(x("<p>kept</p><script>var x = '") == "kept")
  }

  test("unclosed tag at EOF drops the dangling fragment") {
    assert(x("<p>kept</p><a href=\"trunc") == "kept")
    assert(x("before <") == "before <") // bare '<' is literal text
  }

  test("comments, CDATA, doctype and PI all drop") {
    val html = "<!DOCTYPE html><?xml version=\"1.0\"?><p>a<!-- no -->" +
      "b</p><![CDATA[ <raw> &amp; ]]>c"
    assert(x(html) == "a b\nc")
    // unclosed comment drops the rest (never leaks half a comment)
    assert(x("<p>a</p><!-- trunc") == "a")
  }

  test("nested tables keep cell text, one line per cell") {
    val html = "<table><tr><td>r1c1<table><tr><td>inner</td></tr>" +
      "</table></td><td>r1c2</td></tr></table>"
    assert(x(html) == "r1c1\ninner\nr1c2")
  }

  test("entities: named, numeric dec/hex, single-pass no re-scan") {
    assert(x("a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos;") ==
      "a & b <c> \"d\" 'e'")
    assert(x("caf&#233; &#x21; &#x1F600;") == "café ! 😀")
    // &amp;lt; decodes ONCE to the literal text "&lt;"
    assert(x("&amp;lt;") == "&lt;")
    // a '&' heading no well-formed entity stays literal — including
    // surrogate-range numerics, which would mangle as lone surrogates
    assert(x("fish & chips &bogus; &#xZZ; &#99999999; &#xD83D;") ==
      "fish & chips &bogus; &#xZZ; &#99999999; &#xD83D;")
  }

  test("whitespace: nbsp/tab collapse, trim around newlines, ends trim") {
    assert(x("  <p> a   b \t c </p>  ") == "a b c")
    assert(x("<p>a</p> \n <p></p> <p>b</p>") == "a\nb")
  }

  test("null in, null out; empty in, empty out") {
    val df = Seq((1L, "<p>hi</p>"), (2L, null.asInstanceOf[String]),
      (3L, "")).toDF("id", "html")
      .select(col("id"), HtmlTextExpr.htmlToText(col("html")).as("t"))
    val got = df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got == Map(1L -> "hi", 2L -> null, 3L -> ""))
  }

  test("html_meta: title / time datetime / h1 list, messy variants") {
    import graft.plans.HtmlMetaUtil
    val page = "<html><head><TITLE>My &amp; Title</TITLE></head><body>" +
      "<time class=\"pub\" datetime='2024-03-05'>5 March</time>" +
      "<h1>First <b>bold</b></h1><p>x</p><H1>Second</H1></body>"
    assert(HtmlMetaUtil.title(page) == "My & Title")
    assert(HtmlMetaUtil.timeAttr(page) == "2024-03-05")
    assert(HtmlMetaUtil.h1s(page) == "First bold\nSecond")
    // absent elements -> null, never ''
    assert(HtmlMetaUtil.title("<p>no title</p>") == null)
    assert(HtmlMetaUtil.timeAttr("<p>no time</p>") == null)
    assert(HtmlMetaUtil.h1s("<p>no h1</p>") == null)
    // <time> without datetime -> null (the scraper's .get(None) path)
    assert(HtmlMetaUtil.timeAttr("<time>March</time>") == null)
    // unquoted datetime value
    assert(HtmlMetaUtil.timeAttr("<time datetime=2024-01-02>x</time>")
      == "2024-01-02")
    // unclosed title rejects rather than swallowing the page; a
    // nested re-opened h1 closes at the first </h1> (inner markup
    // strips through the text contract)
    assert(HtmlMetaUtil.title("<title>trunc") == null)
    assert(HtmlMetaUtil.h1s("<h1>only <h1>closed</h1>") == "only closed")
    // <timer>/<header> must not satisfy <time>/<h1> prefix matches
    assert(HtmlMetaUtil.timeAttr("<timer datetime=\"x\"></timer>") == null)
    // data-datetime is a DIFFERENT attribute: the name must start at
    // a whitespace boundary, never as a suffix of another name
    assert(HtmlMetaUtil.timeAttr(
      "<time data-datetime=\"wrong\">x</time>") == null)
    assert(HtmlMetaUtil.timeAttr(
      "<time data-datetime=\"no\" datetime=\"2024-02-03\">x</time>")
      == "2024-02-03")
    // unclosed <time> at EOF rejects — the attribute scan must never
    // read past the tag into arbitrary document text
    assert(HtmlMetaUtil.timeAttr(
      "<time datetime=\"2024-01-01\" secret datetime later") == null)
  }

  test("html_meta robots: attribute order, decoys, absence (r12)") {
    import graft.plans.HtmlMetaUtil
    def robots(s: String) = HtmlMetaUtil.metaContent(s, "robots")
    // content BEFORE name (the common writer order) and after
    assert(robots("<meta content=\"noindex\" name=\"robots\">")
      == "noindex")
    assert(robots("<META NAME=\"ROBOTS\" CONTENT=\"index, follow\">")
      == "index, follow")
    // a different meta's content must not leak; scan continues to
    // the right tag
    assert(robots("<meta name=\"viewport\" content=\"w=1\">" +
      "<meta name=\"robots\" content=\"nofollow\">") == "nofollow")
    // no robots meta -> null; robots without content -> null
    assert(robots("<meta name=\"viewport\" content=\"w=1\">") == null)
    assert(robots("<meta name=\"robots\">") == null)
    // truncated tag rejects
    assert(robots("<meta name=\"robots\" content=\"x") == null)
  }

  test("html_base: first live <base href>, comment decoys dead (r14)") {
    import graft.plans.HtmlMetaUtil
    def b(s: String) = HtmlMetaUtil.baseHref(s)
    // first <base> with an href wins (HTML spec), verbatim value
    assert(b("<head><base href=\"https://cdn.example.org/assets/\">" +
      "<base href=\"/second\"></head>") ==
      "https://cdn.example.org/assets/")
    // a relative base comes back verbatim (caller resolves, §5.1.3)
    assert(b("<base target=\"_blank\" href='/b2/'>") == "/b2/")
    // a decoy <base> inside a comment is markup-dead
    assert(b("<!-- <base href=\"https://evil.example.com/\"> -->" +
      "<base href=\"/real/\">") == "/real/")
    // only a commented base -> null; unterminated comment tail -> null
    assert(b("<!-- <base href=\"/dead\"> --><p>x</p>") == null)
    assert(b("<!-- <base href=\"/dead\"> <p>x</p>") == null)
    // href-less <base> skips to a later live one; none -> null
    assert(b("<base target=\"_top\"><base href=\"/live\">") == "/live")
    assert(b("<p>no base</p>") == null)
    // truncated tag at EOF rejects; <basefont> is not <base>
    assert(b("<base href=\"/x") == null)
    assert(b("<basefont size=2><base href=\"/y\">") == "/y")
    // expression face round-trip
    import org.apache.spark.sql.functions._
    val df = spark.range(1).select(graft.plans.HtmlTextExpr
      .htmlBaseHref(lit("<base href=\"/z/\">")).as("b"))
    assert(df.collect()(0).getString(0) == "/z/")
  }

  test("html_links_text: anchor text rides the href, boundary-aware close (r14)") {
    import graft.plans.HtmlMetaUtil
    def lt(s: String) = HtmlMetaUtil.linksWithText(s)
    // inline markup collapses to spaces; entities decode
    assert(lt("<a href=\"/a\">read <b>more</b> now</a>") ==
      "/a\tread more now")
    // "</abbr" must NOT close the anchor (name boundary)
    assert(lt("<a href=\"/b\">the <abbr>USA</abbr> wins</a>") ==
      "/b\tthe USA wins")
    assert(lt("<a href=\"/e\">Tom &amp; Jerry</a>") == "/e\tTom & Jerry")
    // no-href and UNCLOSED-at-EOF anchors drop; later links found
    assert(lt("<a name=\"x\">t</a><a href=\"/c\">kept</a>" +
      "<a href=\"/dangling\">never closed") == "/c\tkept")
    // a new <a> implicitly closes an open one (anchors don't nest):
    // a dangling anchor can never swallow the links after it
    assert(lt("<a href=\"/1\">first<a href=\"/2\">second</a>") ==
      "/1\tfirst\n/2\tsecond")
    // empty text is a valid label slot; tabs sanitize to spaces
    assert(lt("<a href=\"/d\"></a>") == "/d\t")
    assert(lt("<a href=\"/f\">a\tb</a>") == "/f\ta b")
    // multiple links keep document order, one line each
    assert(lt("<a href=\"1\">x</a><p></p><A HREF=\"2\">y</A>") ==
      "1\tx\n2\ty")
    // none -> null
    assert(lt("<p>no links</p>") == null)
  }

  test("html_links: hrefs in document order, decoys rejected (r12)") {
    import graft.plans.HtmlMetaUtil
    val page = "<a href=\"https://a.com/1\">one</a><p>x</p>" +
      "<A CLASS=\"y\" HREF=\"/two?a=1&b=2\"></A>" +
      "<a name=\"no-href\">none</a>" +
      "<a hreflang=\"en\" href='three'>single-quoted</a>" +
      "<article href=\"not-an-anchor\"></article>" +
      "<a data-href=\"decoy\" href=\"four\"></a>"
    assert(HtmlMetaUtil.links(page) ==
      "https://a.com/1\n/two?a=1&b=2\nthree\nfour")
    // no anchors -> null, never ''
    assert(HtmlMetaUtil.links("<p>plain</p>") == null)
    // unclosed <a> at EOF drops; unterminated quote rejects the tag
    assert(HtmlMetaUtil.links("<a href=\"kept\"></a><a href=\"trunc") ==
      "kept")
    assert(HtmlMetaUtil.links("<a href=\"unterminated>x</a>") == null)
    // unquoted value runs to whitespace or tag end
    assert(HtmlMetaUtil.links("<a href=bare>x</a>") == "bare")
    // href verbatim: entities do NOT decode in URLs
    assert(HtmlMetaUtil.links("<a href=\"/p?a=1&amp;b=2\">e</a>") ==
      "/p?a=1&amp;b=2")
    // expression face: null in, null out; codegen path agrees
    val df = Seq((1L, page), (2L, null.asInstanceOf[String]))
      .toDF("id", "html")
      .select(col("id"),
        graft.plans.HtmlTextExpr.htmlLinks(col("html")).as("l"))
    val got = df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got(1L) == "https://a.com/1\n/two?a=1&b=2\nthree\nfour")
    assert(got(2L) == null)
  }

  test("attr scan is quote-aware: a needle inside another value never matches (r13)") {
    import graft.plans.HtmlMetaUtil
    // the ADVICE r12 case: href= inside alt's quoted value must not
    // shadow the REAL href later in the tag
    assert(HtmlMetaUtil.links(
      "<a alt=\"see href=evil\" href=\"/real\">x</a>") == "/real")
    assert(HtmlMetaUtil.links(
      "<a title='use href=bad' href='/good'>x</a>") == "/good")
    // needle-in-value with NO real attribute -> null, not the decoy
    assert(HtmlMetaUtil.links(
      "<a alt=\"see href=evil\">x</a>") == null)
    // same guard for meta name/content lookups
    assert(HtmlMetaUtil.metaContent(
      "<meta alt=\"name=robots trick\" name=\"robots\" " +
        "content=\"noindex\">", "robots") == "noindex")
    // and for <time datetime=...>
    assert(HtmlMetaUtil.timeAttr(
      "<time title=\"datetime=1999\" datetime=\"2024-01-02\">") ==
      "2024-01-02")
  }

  test("sitemap_locs: urlset + index, XML escapes, trim, rejects (r12)") {
    import graft.plans.SitemapUtil
    val sm = "<?xml version=\"1.0\"?><urlset>" +
      "<url><loc>https://a.com/p?x=1&amp;y=2</loc>" +
      "<lastmod>2024-01-01</lastmod></url>" +
      "<url><LOC>  https://a.com/two </LOC></url></urlset>"
    assert(SitemapUtil.locs(sm) ==
      "https://a.com/p?x=1&y=2\nhttps://a.com/two")
    // sitemapindex uses the same element
    assert(SitemapUtil.locs("<sitemapindex><sitemap>" +
      "<loc>https://a.com/s1.xml</loc></sitemap></sitemapindex>")
      == "https://a.com/s1.xml")
    // <location>/<loc attr> boundaries; unclosed loc drops; empty -> null
    assert(SitemapUtil.locs("<location>nope</location>") == null)
    assert(SitemapUtil.locs("<loc foo=\"1\">kept</loc>") == "kept")
    assert(SitemapUtil.locs("<loc>a</loc><loc>trunc") == "a")
    assert(SitemapUtil.locs("<urlset></urlset>") == null)
    // only the five XML entities decode; others stay literal
    assert(SitemapUtil.locs("<loc>&lt;x&gt; &quot;q&quot; &apos;a&apos;" +
      " &#65; &nbsp;</loc>") == "<x> \"q\" 'a' &#65; &nbsp;")
    // expression: null in null out + codegen
    val df = Seq((1L, sm), (2L, null.asInstanceOf[String]))
      .toDF("id", "xml")
      .select(col("id"),
        graft.plans.HtmlTextExpr.sitemapLocs(col("xml")).as("l"))
    val got = df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got(1L).startsWith("https://a.com/p") && got(2L) == null)
  }

  test("entity scan is bounded: bare-& pages with no semicolon") {
    // an '&' heading no entity must cost O(1) even when the page has
    // no ';' at all (URL query strings) — pinned by output equality;
    // the 1MB no-semicolon page completing inside the suite timeout
    // is the perf witness
    val page = "a?x=1&y=2&z=3 " * 50000
    assert(x("<p>" + page + "</p>") == page.trim)
    // ';' just past the 12-char entity window: '&' stays literal
    assert(x("&aaaaaaaaaaaaa;") == "&aaaaaaaaaaaaa;")
    // longest well-formed numeric body (7 digits) still decodes
    assert(x("&#0000033;") == "!")
  }

  test("kernels are total: random junk never throws (r12)") {
    // every string kernel must survive arbitrary bytes-as-chars —
    // bronze inputs are untrusted; a throw inside whole-stage codegen
    // kills the task, not the row
    import graft.plans.{HtmlMetaUtil, RobotsUtil, UrlCanonUtil}
    val rnd = new scala.util.Random(43)
    def junk(n: Int): String = {
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        sb.append((rnd.nextInt(0x250) + 1).toChar)
      }
      sb.toString
    }
    val seeds = Seq("<", "<a", "<a href=", "<a href=\"", "&", "&#",
      "<time datetime=", "<meta name=", "<!--", "<![CDATA[",
      "<script>", "://", "http://", "?", "User-agent:", "Disallow:")
    (1 to 200).foreach { i =>
      val s = seeds(i % seeds.length) + junk(rnd.nextInt(80)) +
        seeds((i * 7) % seeds.length)
      HtmlTextUtil.extract(s)
      HtmlMetaUtil.title(s)
      HtmlMetaUtil.timeAttr(s)
      HtmlMetaUtil.h1s(s)
      HtmlMetaUtil.links(s)
      HtmlMetaUtil.metaContent(s, "robots")
      UrlCanonUtil.canon(s)
      RobotsUtil.allowed(s, "bot", "/" + junk(rnd.nextInt(20)))
      RobotsUtil.allowed("User-agent: *\nDisallow: " + s + "\n",
        "bot", "/x")
      // r14 kernels under the same junk: base lift, anchor text,
      // surt, mime sniff (bytes), and pct-norm idempotence
      HtmlMetaUtil.baseHref(s)
      HtmlMetaUtil.linksWithText(s)
      graft.plans.SurtKeyUtil.surt(s)
      graft.plans.SniffMimeUtil.sniff(s.getBytes("UTF-8"))
      val c = UrlCanonUtil.canon("http://h.com/" + s)
      if (c != null) assert(UrlCanonUtil.canon(c) == c,
        s"canon not idempotent on junk: $s")
    }
  }

  test("html_meta expressions: null in, null out") {
    val df = Seq((1L, "<title>t</title>"), (2L, null.asInstanceOf[String]))
      .toDF("id", "html")
      .select(col("id"),
        graft.plans.HtmlTextExpr.htmlTitle(col("html")).as("t"),
        graft.plans.HtmlTextExpr.htmlTime(col("html")).as("d"),
        graft.plans.HtmlTextExpr.htmlH1s(col("html")).as("h"))
    val rows = df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3))).toMap
    assert(rows == Map(1L -> ("t", null, null),
      2L -> (null, null, null)))
  }

  test("publishedTime: precedence og > meta-date > time (r14)") {
    import graft.plans.HtmlMetaUtil.publishedTime
    // og wins over a later meta-date AND an earlier <time>
    assert(publishedTime(
      "<time datetime=\"1999-01-01\">x</time>" +
      "<meta property=\"article:published_time\" content=\"2024-03-01\">" +
      "<meta name=\"date\" content=\"2023-01-01\">") == "2024-03-01")
    // og via name= (sloppy pages)
    assert(publishedTime(
      "<meta name=\"ARTICLE:PUBLISHED_TIME\" content=\"2024-04-02\">")
      == "2024-04-02")
    // meta-date behind a decoy author meta; beats <time>
    assert(publishedTime(
      "<meta name=\"author\" content=\"A W\">" +
      "<meta name=\"date\" content=\"2023-11-05\">" +
      "<time datetime=\"2020-01-01\">t</time>") == "2023-11-05")
    // time fallback, attribute order free
    assert(publishedTime(
      "<p>x</p><time class=\"c\" datetime=\"2022-05-06\">May</time>")
      == "2022-05-06")
    // og with content BEFORE property (attr order free)
    assert(publishedTime(
      "<meta content=\"2024-07-08\" property=\"article:published_time\">")
      == "2024-07-08")
    // none declared -> null; empty -> null
    assert(publishedTime("<p>undated</p>") == null)
    assert(publishedTime("") == null)
    // truncated meta at EOF rejects but an earlier time still serves
    assert(publishedTime(
      "<time datetime=\"2021-02-03\">t</time><meta property=\"art")
      == "2021-02-03")
    // og meta with NO content attr does not shadow a later meta-date
    assert(publishedTime(
      "<meta property=\"article:published_time\">" +
      "<meta name=\"date\" content=\"2023-12-09\">") == "2023-12-09")
  }

  test("publishedTime totality fuzz: never throws (r14)") {
    import graft.plans.HtmlMetaUtil.publishedTime
    val rnd = new scala.util.Random(41)
    val seeds = Seq("<meta ", "property=", "name=", "content=",
      "\"article:published_time\"", "'date'", "\"2024-01-02\"", ">",
      "<time ", "datetime=", "</time>", "<!--", "-->", "=", "\"", "'",
      " ", "<", "text ", "<meta property=\"article:published_time\"")
    (1 to 400).foreach { _ =>
      val s = (1 to rnd.nextInt(24)).map(_ =>
        seeds(rnd.nextInt(seeds.length))).mkString
      publishedTime(s) // must not throw
    }
  }

  test("kernel stays in whole-stage codegen (no UDF black box)") {
    // non-foldable input (Range), else ConvertToLocalRelation
    // constant-folds the projection away before any codegen runs
    val df = spark.range(3).select(HtmlTextExpr.htmlToText(
      concat(lit("<p>row "), col("id").cast("string"), lit("</p>")))
      .as("t"))
    val plan = df.queryExecution.executedPlan.toString
    // the '*(n)' prefix is the WholeStageCodegen marker in simpleString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("row 0", "row 1", "row 2"))
  }
}
