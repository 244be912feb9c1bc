package graft

import org.apache.spark.sql.functions._

import graft.plans.{MainTextExpr, MainTextUtil}

/** html_main_text: the jusText/boilerpipe-core keep rule (>=25
  * normalized chars AND link density <= 1/3), block segmentation,
  * anchor-span accounting, and the walker's hardening inherited
  * from html_to_text. */
class MainTextSpec extends SparkSpec {

  private def m(s: String): String = MainTextUtil.mainText(s)

  test("content kept, nav/footer/short blocks dropped") {
    val page =
      "<html><body>" +
        "<div><a href=\"/\">Home</a> <a href=\"/a\">About</a> " +
        "<a href=\"/c\">Contact</a></div>" +
        "<p>This paragraph carries the real article content.</p>" +
        "<div>(c) 2024 Example</div>" + // short: dropped
        "<p>A second long paragraph of body text survives too.</p>" +
        "<div><a href=\"/tos\">Terms of Service</a> | " +
        "<a href=\"/privacy\">Privacy Policy</a></div>" +
        "</body></html>"
    assert(m(page) ==
      "This paragraph carries the real article content.\n" +
        "A second long paragraph of body text survives too.")
  }

  test("link density boundary: exactly 1/3 keeps, above drops") {
    // 30 non-ws chars, 10 inside the anchor: 10*3 == 30 -> keep
    val ok = "<p>aaaaaaaaaa bbbbbbbbbb <a href=\"/x\">cccccccccc</a></p>"
    assert(m(ok) == "aaaaaaaaaa bbbbbbbbbb cccccccccc")
    // 30 non-ws chars, 11 inside: 33 > 30 -> drop
    val dense =
      "<p>aaaaaaaaaa bbbbbbbbb <a href=\"/x\">ccccccccccc</a></p>"
    assert(m(dense) == null)
    // long but link-dominated (the footer shape): drops on density
    val footer = "<p><a href=\"/t\">Terms of Service Agreement</a> | " +
      "<a href=\"/p\">Privacy and Cookie Policy</a></p>"
    assert(m(footer) == null)
  }

  test("length boundary: 25 normalized chars keep, 24 drop") {
    assert(m("<p>" + "x" * 25 + "</p>") == "x" * 25)
    assert(m("<p>" + "x" * 24 + "</p>") == null)
    // normalization happens BEFORE the length check: 30 raw chars
    // collapsing to 13 drop
    assert(m("<p>xxxx    xxxx    xxxx      </p>") == null)
  }

  test("anchor span accounting: nesting, self-close, unclosed") {
    // self-closing <a/> opens nothing
    assert(m("<p>twenty-five chars of body text <a/>here</p>")
      != null)
    // unclosed <a> marks the rest of the block as link text
    assert(m("<p><a href=\"/x\">all of this text is inside the " +
      "anchor forever</a-unterminated") == null)
    // inline tags inside content do not flush the block
    assert(m("<p>some <b>bold</b> and <i>italic</i> body text " +
      "stays one block</p>") ==
      "some bold and italic body text stays one block")
  }

  test("block flush resets anchor depth: one unclosed <a> can't poison the page (r14)") {
    // an unclosed anchor in a nav block must not count EVERY later
    // block as 100% link text (HTML parsers implicitly close <a> at
    // block boundaries)
    val page = "<div><a href=\"/nav\">menu" + // never closed
      "<p>this real article paragraph survives the broken anchor</p>" +
      "<p>and so does this second paragraph of body text</p></div>"
    assert(MainTextUtil.mainText(page) ==
      "this real article paragraph survives the broken anchor\n" +
        "and so does this second paragraph of body text")
    // within ONE block the unclosed anchor still counts as link text
    assert(m("<p><a href=\"/x\">all of this text is inside the " +
      "anchor forever and drops") == null)
    // a legitimately closed cross-block anchor: the depth reset only
    // FORGETS the open anchor; the stray </a> after the flush is a
    // no-op (depth guards at zero)
    val closed = "<a href=\"/x\">short</a><p>twenty-five plus chars " +
      "of real body text here</p>"
    assert(MainTextUtil.mainText(closed) ==
      "twenty-five plus chars of real body text here")
  }

  test("walker hardening inherited from html_to_text") {
    // script/style content never counts as content
    assert(m("<p>real content paragraph here</p>" +
      "<script>var x = 'a very long script body that would pass';" +
      "</script>") == "real content paragraph here")
    // entities decode before counting
    assert(m("<p>fish &amp; chips &amp; mushy peas today</p>") ==
      "fish & chips & mushy peas today")
    // all-chrome page -> null, not ''
    assert(m("<div><a href=\"/\">Home</a></div>") == null)
    assert(m("") == null)
  }

  test("expression face + codegen parity") {
    import spark.implicits._
    val page = "<p>This paragraph carries the real article " +
      "content.</p><div><a href=\"/\">Home</a></div>"
    val df = Seq((1L, page), (2L, null.asInstanceOf[String]),
      (3L, "<div><a href=\"/\">Home</a></div>"))
      .toDF("id", "html")
      .select(col("id"), MainTextExpr.htmlMainText(col("html")).as("t"))
    val got = df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got(1L) == "This paragraph carries the real article content.")
    assert(got(2L) == null)
    assert(got(3L) == null)
  }

  test("totality fuzz: never throws") {
    val rnd = new scala.util.Random(17)
    val seeds = Seq("<p>", "</p>", "<a href=\"x\">", "</a>", "&amp;",
      "<!--", "-->", "<script>", "</script>", "text body words ",
      "<![CDATA[", "]]>", "<", ">", " ", "&#x41;")
    (1 to 400).foreach { _ =>
      val s = (1 to rnd.nextInt(20)).map(_ =>
        seeds(rnd.nextInt(seeds.length))).mkString
      MainTextUtil.mainText(s) // must not throw
    }
  }
}
