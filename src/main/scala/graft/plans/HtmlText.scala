package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction as a native codegen expression — the one
  * reference ingest stage that was still outside the engine: the
  * scraper's BeautifulSoup `.text` walk + translate cleanup
  * (`Deliverable_2/Batch Data Codes/scraper.py:214-218`) re-expressed
  * as a MAP-ONLY kernel so markup stripping runs inside whole-stage
  * codegen at scan speed instead of through a parser library.
  *
  * Contract (deliberately regex-chain-statable so a SQL oracle can
  * reproduce it exactly on well-formed input — q_html_extract pins
  * cross-engine equality):
  *   1. `<script>`/`<style>` elements drop WITH their content
  *      (case-insensitive; an unclosed one drops the rest — a
  *      truncated page must not leak raw JS into the corpus);
  *   2. comments `<!-- -->`, CDATA `<![CDATA[ ]]>`, declarations
  *      `<!…>`/`<?…>` drop, each leaving one space;
  *   3. block-level tags (p div h1-6 li ul ol table tr td th br hr
  *      pre blockquote article section header footer) become a
  *      newline — paragraph structure survives extraction (the
  *      C4/Dolma line-level filters downstream are line-oriented);
  *      every other tag becomes a space; a tag left open at EOF
  *      drops the dangling fragment (truncation-hardened, the
  *      probePdf posture);
  *   4. entities decode once, left-to-right, no re-scan ("&amp;lt;"
  *      → "&lt;" and stops): the HTML-4 core names (amp lt gt quot
  *      apos nbsp) plus numeric `&#NN;`/`&#xHH;`; a '&' that heads
  *      no well-formed entity stays literal;
  *   5. whitespace canonicalization: NBSP/tab → space, space runs
  *      collapse, spaces trim around newlines, newline runs
  *      collapse, ends trim — the reference's `" ".join` +
  *      `str.translate` cleanup generalized to keep line structure.
  *
  * A naive `>` terminates tags (attribute values containing '>' are
  * out of contract — same naivety as the oracle's `<[^>]*>`, so the
  * engines cannot diverge on it). Single forward pass, zero regex,
  * one StringBuilder — at 100 TB this is the difference between
  * scan-bound and parser-bound bronze normalization. */
object HtmlTextUtil {

  private[plans] val blockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "tr", "td", "th", "br", "hr", "pre", "blockquote",
    "article", "section", "header", "footer")

  /** Case-insensitive search for `needle` (lowercase) in `s` from
    * `from`; -1 if absent. */
  private[plans] def findCi(s: String, needle: String, from: Int): Int = {
    val n = needle.length
    var i = math.max(from, 0)
    val last = s.length - n
    while (i <= last) {
      var j = 0
      while (j < n && Character.toLowerCase(s.charAt(i + j)) == needle.charAt(j)) j += 1
      if (j == n) return i
      i += 1
    }
    -1
  }

  /** Scalar values only: a numeric entity in the surrogate range
    * would decode to a LONE surrogate — an invalid UTF-16 string
    * that downstream UTF-8 encoding mangles; reject it (the '&'
    * stays literal, like every other malformed entity). */
  private def validCp(cp: Int): Boolean =
    cp > 0 && Character.isValidCodePoint(cp) &&
      (cp < 0xD800 || cp > 0xDFFF)

  /** Decode the entity starting at '&' (index `i`); returns
    * (decodedOrNull, posAfter). Null decoded ⇒ no well-formed entity
    * here — caller emits '&' literally. */
  private[plans] def decodeEntity(s: String, i: Int): (String, Int) = {
    // Semicolon scan bounded to the longest well-formed entity window
    // (body ≤ 11 chars ⇒ ';' at most at i+12): an '&' on a page with
    // no ';' must cost O(1), not O(n) — bare-'&' URL params are the
    // common case on untrusted web input, and an unbounded indexOf
    // here is quadratic over the whole page.
    val lim = math.min(s.length, i + 13)
    var semi = -1
    var p = i + 1
    while (p < lim && semi < 0) {
      if (s.charAt(p) == ';') semi = p
      p += 1
    }
    if (semi < 0) return (null, i + 1)
    val body = s.substring(i + 1, semi)
    val out: String =
      if (body.startsWith("#x") || body.startsWith("#X")) {
        val hex = body.substring(2)
        if (hex.nonEmpty && hex.length <= 6 &&
            hex.forall(c => Character.digit(c, 16) >= 0)) {
          val cp = Integer.parseInt(hex, 16)
          if (validCp(cp)) new String(Character.toChars(cp)) else null
        } else null
      } else if (body.startsWith("#")) {
        val dec = body.substring(1)
        if (dec.nonEmpty && dec.length <= 7 && dec.forall(_.isDigit)) {
          val cp = Integer.parseInt(dec)
          if (validCp(cp)) new String(Character.toChars(cp)) else null
        } else null
      } else body match {
        case "amp"  => "&"
        case "lt"   => "<"
        case "gt"   => ">"
        case "quot" => "\""
        case "apos" => "'"
        case "nbsp" => " "
        case _      => null
      }
    if (out == null) (null, i + 1) else (out, semi + 1)
  }

  /** Raw markup strip + entity decode (contract steps 1-4); the
    * whitespace pass runs separately so both halves stay testable. */
  private def strip(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          sb.append(' ')
          i = if (e < 0) n else e + 3
        } else if (s.regionMatches(true, i, "<![CDATA[", 0, 9)) {
          val e = s.indexOf("]]>", i + 9)
          sb.append(' ')
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
          val e = s.indexOf('>', i + 1)
          sb.append(' ')
          i = if (e < 0) n else e + 1
        } else if (i + 1 < n &&
            (s.charAt(i + 1).isLetter || s.charAt(i + 1) == '/')) {
          // tag name (skipping a leading '/')
          var p = i + 1
          if (s.charAt(p) == '/') p += 1
          val nameStart = p
          while (p < n && (s.charAt(p).isLetterOrDigit)) p += 1
          val name = s.substring(nameStart, p).toLowerCase
          val closing = s.charAt(i + 1) == '/'
          val gt = s.indexOf('>', p)
          if (gt < 0) { i = n } // dangling open tag at EOF: drop
          else if (!closing && (name == "script" || name == "style")) {
            val close = findCi(s, "</" + name, gt + 1)
            sb.append(' ')
            if (close < 0) i = n
            else {
              val cgt = s.indexOf('>', close)
              i = if (cgt < 0) n else cgt + 1
            }
          } else {
            sb.append(if (blockTags.contains(name)) '\n' else ' ')
            i = gt + 1
          }
        } else { sb.append(c); i += 1 } // bare '<' stays literal text
      } else if (c == '&') {
        val (dec, next) = decodeEntity(s, i)
        if (dec == null) { sb.append('&'); i = next }
        else { sb.append(dec); i = next }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Contract step 5. */
  private def normalizeWs(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var pendingNl = false
    var emitted = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\n' || c == '\r') { pendingNl = true; pendingSpace = false }
      else if (c == ' ' || c == '\t' || c == '\u00A0') {
        if (!pendingNl) pendingSpace = true
      } else {
        if (pendingNl) { if (emitted) sb.append('\n') }
        else if (pendingSpace && emitted) sb.append(' ')
        pendingNl = false; pendingSpace = false
        sb.append(c); emitted = true
      }
      i += 1
    }
    sb.toString
  }

  def extract(s: String): String = normalizeWs(strip(s))
}

/** The scraper's non-body extractions (`scraper.py:221-236`): page
  * title, machine-readable date, headline list — the metadata the
  * reference pulls alongside the text. Each is a bounded forward
  * scan; inner markup inside title/h1 strips through the same
  * [[HtmlTextUtil.extract]] contract (BeautifulSoup-`.text`
  * behavior), flattened to one line. */
object HtmlMetaUtil {

  /** Inner text of the FIRST <tag …>…</tag> element (case-
    * insensitive), markup-stripped and single-lined; null when the
    * tag is absent or unclosed (reject, don't mis-read). */
  private def innerFirst(s: String, tag: String): String = {
    val open = findTagOpen(s, tag, 0)
    if (open < 0) return null
    val gt = s.indexOf('>', open)
    if (gt < 0) return null
    val close = findCiSeq(s, "</" + tag, gt + 1)
    if (close < 0) return null
    HtmlTextUtil.extract(s.substring(gt + 1, close)).replace('\n', ' ')
  }

  /** Case-insensitive scan for "<tag" followed by whitespace or '>'
    * (so "<time" does not match "<timer">); -1 if absent. */
  private def findTagOpen(s: String, tag: String, from: Int): Int = {
    var i = from
    while (i >= 0) {
      i = findCiSeq(s, "<" + tag, i)
      if (i < 0) return -1
      val after = i + 1 + tag.length
      if (after >= s.length || s.charAt(after) == '>' ||
        s.charAt(after).isWhitespace || s.charAt(after) == '/')
        return i
      i += 1
    }
    -1
  }

  private def findCiSeq(s: String, needle: String, from: Int,
      until: Int = Int.MaxValue): Int = {
    val n = needle.length
    var i = math.max(from, 0)
    val last = math.min(s.length, until) - n
    while (i <= last) {
      var j = 0
      while (j < n &&
        Character.toLowerCase(s.charAt(i + j)) ==
          Character.toLowerCase(needle.charAt(j))) j += 1
      if (j == n) return i
      i += 1
    }
    -1
  }

  /** Value of attribute `name` inside the tag span (open, end):
    * ONE walk over the tag tracking the active quote char, so a
    * needle INSIDE another quoted attribute value never satisfies
    * the lookup (<a alt="see href=evil" href="/real"> returns
    * "/real" — untrusted pages are the kernel's domain). Outside
    * quotes the name must START at a whitespace boundary
    * (data-datetime never satisfies datetime) and be FOLLOWED by
    * optional whitespace then '=' (hreflang never satisfies href —
    * the scan keeps looking); value is quoted (either quote;
    * unterminated inside the tag rejects) or an unquoted run to
    * whitespace/tag end. Null when absent or malformed. */
  private def attrValue(s: String, open: Int, end: Int,
      name: String): String = {
    val n = name.length
    var quote: Char = 0
    var i = open + 1
    while (i < end) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == quote) quote = 0
        i += 1
      } else if (c == '"' || c == '\'') {
        quote = c
        i += 1
      } else {
        if (s.charAt(i - 1).isWhitespace && i + n <= end && {
          var j = 0
          while (j < n && Character.toLowerCase(s.charAt(i + j)) ==
            Character.toLowerCase(name.charAt(j))) j += 1
          j == n
        }) {
          var p = i + n
          while (p < end && s.charAt(p).isWhitespace) p += 1
          if (p < end && s.charAt(p) == '=') {
            p += 1
            while (p < end && s.charAt(p).isWhitespace) p += 1
            if (p >= end) return null
            val q = s.charAt(p)
            return if (q == '"' || q == '\'') {
              val e = s.indexOf(q, p + 1)
              if (e < 0 || e > end) null else s.substring(p + 1, e)
            } else {
              var e = p
              while (e < end && !s.charAt(e).isWhitespace) e += 1
              s.substring(p, e)
            }
          }
          // name at a boundary but no '=': keep walking (hreflang
          // must not block a later real href)
        }
        i += 1
      }
    }
    null
  }

  def title(s: String): String = innerFirst(s, "title")

  /** `datetime` attribute of the FIRST <time> tag (the scraper's
    * `soup.find("time").get("datetime")`); null when no <time> tag
    * or the tag has no datetime attribute. */
  def timeAttr(s: String): String = {
    val open = findTagOpen(s, "time", 0)
    if (open < 0) return null
    val gt = s.indexOf('>', open)
    // Unclosed <time> at EOF: reject, don't mis-read — an unbounded
    // end would let the attribute scan (and the unquoted-value
    // branch) read arbitrary text from the rest of the document.
    if (gt < 0) return null
    attrValue(s, open, gt, "datetime")
  }

  /** href values of every <a> tag, document order, one per line —
    * the scraper's outlink pass (`scraper.py:126-150`) and the input
    * to any crawl-graph / URL-dedup stage. Values come back VERBATIM
    * (no entity decode — the oracle-regexp contract); null when the
    * page has no links. An unclosed <a> at EOF or an unterminated
    * quoted value drops THAT tag (reject-don't-misread). */
  def links(s: String): String = {
    val out = new java.lang.StringBuilder
    var found = false
    var i = 0
    var continue = true
    while (continue) {
      val open = findTagOpen(s, "a", i)
      if (open < 0) continue = false
      else {
        val gt = s.indexOf('>', open)
        if (gt < 0) continue = false // truncated tag at EOF: drop
        else {
          val v = attrValue(s, open, gt, "href")
          if (v != null) {
            if (found) out.append('\n')
            out.append(v)
            found = true
          }
          i = gt + 1
        }
      }
    }
    if (found) out.toString else null
  }

  /** Case-insensitive "</tag" at a NAME BOUNDARY (next char '>' or
    * whitespace) — "</a" must not match "</abbr"/"</article". */
  private def findCloseTag(s: String, tag: String, from: Int): Int = {
    var i = from
    while (i >= 0) {
      val c = findCiSeq(s, "</" + tag, i)
      if (c < 0) return -1
      val after = c + 2 + tag.length
      if (after >= s.length || s.charAt(after) == '>' ||
        s.charAt(after).isWhitespace) return c
      i = c + 1
    }
    -1
  }

  /** href + anchor TEXT of every <a> tag, document order, one
    * "href\ttext" line per link — anchor text is the link graph's
    * LABEL (what search ranking and weak-supervision pipelines index
    * a target page under; hrefs alone lose it). The text is the
    * markup-stripped inner span to the matching </a> (boundary-aware
    * — "</abbr" doesn't close an anchor), single-lined; tabs in
    * either field collapse to spaces so the two-field line stays
    * parseable. Anchors don't nest: a NEW <a> open tag implicitly
    * closes an open one (the HTML5 parser rule — real pages rely on
    * it), so the text span ends at the matching </a> OR the next <a>
    * open, whichever comes first, and a dangling anchor can never
    * swallow the links after it. An <a> with NEITHER before EOF
    * drops (reject-don't-misread: unlike [[links]], the text needs
    * an end); no links -> null (r14). */
  def linksWithText(s: String): String = {
    val out = new java.lang.StringBuilder
    var found = false
    var i = 0
    var continue = true
    def emit(href: String, from: Int, until: Int): Unit = {
      val txt = HtmlTextUtil.extract(s.substring(from, until))
        .replace('\n', ' ').replace('\t', ' ')
      if (found) out.append('\n')
      out.append(href.replace('\t', ' ')).append('\t').append(txt)
      found = true
    }
    while (continue) {
      val open = findTagOpen(s, "a", i)
      if (open < 0) continue = false
      else {
        val gt = s.indexOf('>', open)
        if (gt < 0) continue = false // truncated tag at EOF: drop
        else {
          val v = attrValue(s, open, gt, "href")
          if (v == null) i = gt + 1
          else {
            val close = findCloseTag(s, "a", gt + 1)
            val nextOpen = findTagOpen(s, "a", gt + 1)
            if (close >= 0 && (nextOpen < 0 || close < nextOpen)) {
              emit(v, gt + 1, close)
              i = close + 3
            } else if (nextOpen >= 0) { // implicit close at next <a>
              emit(v, gt + 1, nextOpen)
              i = nextOpen
            } else i = gt + 1 // dangling at EOF: drop
          }
        }
      }
    }
    if (found) out.toString else null
  }

  /** content attribute of the FIRST <meta> tag whose name attribute
    * equals `key` (case-insensitive) — the robots/noindex signal a
    * crawl pipeline filters on before a page enters the corpus.
    * Attribute ORDER inside the tag doesn't matter (content-before-
    * name is common); absent tag/attribute -> null. */
  def metaContent(s: String, key: String): String = {
    var i = 0
    while (i >= 0) {
      val open = findTagOpen(s, "meta", i)
      if (open < 0) return null
      val gt = s.indexOf('>', open)
      if (gt < 0) return null // truncated tag at EOF: reject
      val name = attrValue(s, open, gt, "name")
      if (name != null && name.equalsIgnoreCase(key))
        return attrValue(s, open, gt, "content")
      i = gt + 1
    }
    null
  }

  /** 1-arg codegen entry for the robots field (generated code calls
    * single-argument methods on the util). */
  def robotsContent(s: String): String = metaContent(s, "robots")

  /** href of the first LIVE <base> tag that carries one — RFC 3986
    * §5.1.1: content can override the resolution base, and real
    * CDN-served pages do, so outlink resolution against the page URL
    * alone yields wrong edges for them. Per the HTML spec only the
    * first <base> with an href is honored. A <base> inside a comment
    * span is markup-dead and must NOT hijack resolution (decoy
    * <base> tags in commented-out headers are common), so the scan
    * skips "<!--"…"-->" regions; a tag truncated at EOF or an
    * unterminated comment tail rejects (reject-don't-misread). The
    * value comes back VERBATIM — it may itself be relative, and the
    * caller resolves it against the retrieval URI (§5.1.3). Null
    * when the page has no live <base href>. */
  def baseHref(s: String): String = {
    var i = 0
    while (true) {
      val open = findTagOpen(s, "base", i)
      if (open < 0) return null
      val cm = s.lastIndexOf("<!--", open)
      if (cm >= 0 && {
        val ce = s.indexOf("-->", cm)
        ce < 0 || ce > open
      }) {
        val ce = s.indexOf("-->", cm)
        if (ce < 0) return null // comment swallows the rest
        i = ce + 3
      } else {
        val gt = s.indexOf('>', open)
        if (gt < 0) return null // truncated tag at EOF
        val v = attrValue(s, open, gt, "href")
        if (v != null) return v
        i = gt + 1 // href-less <base>: keep looking
      }
    }
    null
  }

  /** Publication date of the page — the temporal-filtering signal a
    * training corpus is sliced on (dated-before-cutoff selection,
    * dedup tie-breaks toward the earliest capture). Pinned
    * precedence, restricted to markup-DECLARED dates (the
    * trafilatura/newspaper heuristic order, minus free-text
    * guessing):
    *   1. the FIRST <meta> whose `property` OR `name` equals
    *      "article:published_time" (the OpenGraph form — property=
    *      on real pages, name= on sloppy ones);
    *   2. the FIRST <meta name="date" content=...> (the classic
    *      Dublin-Core-ish form);
    *   3. the FIRST <time datetime=...>.
    * Values come back VERBATIM (callers normalize/parse); a tag
    * truncated at EOF rejects, like every scanner here. Null when
    * the page declares no date. */
  def publishedTime(s: String): String = {
    var metaDate: String = null
    var i = 0
    var scanning = true
    while (scanning) {
      val open = findTagOpen(s, "meta", i)
      if (open < 0) scanning = false
      else {
        val gt = s.indexOf('>', open)
        if (gt < 0) scanning = false // truncated tag at EOF: reject
        else {
          val p = attrValue(s, open, gt, "property")
          val key = if (p != null) p else attrValue(s, open, gt, "name")
          if (key != null) {
            if (key.equalsIgnoreCase("article:published_time")) {
              val v = attrValue(s, open, gt, "content")
              if (v != null) return v
            } else if (metaDate == null && key.equalsIgnoreCase("date")) {
              metaDate = attrValue(s, open, gt, "content")
            }
          }
          i = gt + 1
        }
      }
    }
    if (metaDate != null) metaDate else timeAttr(s)
  }

  /** All <h1> texts in document order, one per line (the scraper's
    * `soup.find_all(["h1"])`); null when the page has none. */
  def h1s(s: String): String = {
    val out = new java.lang.StringBuilder
    var i = 0
    var found = false
    var continue = true
    while (continue) {
      val open = findTagOpen(s, "h1", i)
      if (open < 0) continue = false
      else {
        val gt = s.indexOf('>', open)
        if (gt < 0) continue = false
        else {
          val close = findCiSeq(s, "</h1", gt + 1)
          if (close < 0) continue = false
          else {
            if (found) out.append('\n')
            out.append(HtmlTextUtil.extract(s.substring(gt + 1, close))
              .replace('\n', ' '))
            found = true
            i = close + 4
          }
        }
      }
    }
    if (found) out.toString else null
  }
}

/** Sitemap extraction — the discovery half of the crawl stack
  * ([[RobotsMatch]] gates fetching; sitemaps feed the frontier).
  * Bounded forward scans in the [[HtmlMetaUtil]] style. */
object SitemapUtil {

  /** Decode exactly the five XML predefined entities, one pass,
    * left-to-right, no re-scan — sitemap URLs are XML-escaped by
    * spec ('&' in query strings arrives as '&amp;'); anything else
    * (numeric refs included) stays literal so a SQL replace-chain
    * oracle can reproduce the decode. */
  private[plans] def xmlUnescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val rest = n - i
        if (rest >= 5 && s.startsWith("&amp;", i)) { sb.append('&'); i += 5 }
        else if (rest >= 4 && s.startsWith("&lt;", i)) { sb.append('<'); i += 4 }
        else if (rest >= 4 && s.startsWith("&gt;", i)) { sb.append('>'); i += 4 }
        else if (rest >= 6 && s.startsWith("&quot;", i)) { sb.append('"'); i += 6 }
        else if (rest >= 6 && s.startsWith("&apos;", i)) { sb.append('\''); i += 6 }
        else { sb.append('&'); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** All <loc> inner texts in document order (urlset AND
    * sitemapindex use the same element), whitespace-trimmed,
    * XML-unescaped, one per line; null when none. An unclosed <loc>
    * drops (reject, don't misread). Case-insensitive tags; CDATA is
    * out of contract (stays literal). */
  def locs(s: String): String = {
    val out = new java.lang.StringBuilder
    var found = false
    var i = 0
    var continue = true
    while (continue) {
      val open = findCiSeqPub(s, "<loc", i)
      if (open < 0) continue = false
      else {
        val after = open + 4
        // tag-name boundary: "<loc>" or "<loc " (attributes legal)
        if (after >= s.length ||
            (s.charAt(after) != '>' && !s.charAt(after).isWhitespace)) {
          i = open + 1
        } else {
          val gt = s.indexOf('>', open)
          if (gt < 0) continue = false
          else {
            val close = findCiSeqPub(s, "</loc", gt + 1)
            if (close < 0) continue = false
            else {
              val v = xmlUnescape(s.substring(gt + 1, close).trim)
              if (v.nonEmpty) {
                if (found) out.append('\n')
                out.append(v)
                found = true
              }
              i = close + 5
            }
          }
        }
      }
    }
    if (found) out.toString else null
  }

  private def findCiSeqPub(s: String, needle: String, from: Int): Int = {
    val n = needle.length
    var i = math.max(from, 0)
    val last = s.length - n
    while (i <= last) {
      var j = 0
      while (j < n &&
        Character.toLowerCase(s.charAt(i + j)) ==
          Character.toLowerCase(needle.charAt(j))) j += 1
      if (j == n) return i
      i += 1
    }
    -1
  }
}

/** html_meta(html, field): the scraper's metadata extractions as one
  * parameterized kernel — field ∈ {title, time, h1, links, robots,
  * base, links_text}.
  * Null in -> null out; an absent element -> null (never ''). */
case class HtmlMeta(child: Expression, field: String)
  extends UnaryExpression {

  require(
    Set("title", "time", "h1", "links", "robots", "base",
      "links_text", "published").contains(field),
    "html_meta field must be title|time|h1|links|robots|base|" +
      s"links_text|published, got $field")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_meta expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  private def extract(s: String): String = field match {
    case "title" => HtmlMetaUtil.title(s)
    case "time"  => HtmlMetaUtil.timeAttr(s)
    case "h1"    => HtmlMetaUtil.h1s(s)
    case "links" => HtmlMetaUtil.links(s)
    case "robots" => HtmlMetaUtil.metaContent(s, "robots")
    case "base"  => HtmlMetaUtil.baseHref(s)
    case "links_text" => HtmlMetaUtil.linksWithText(s)
    case "published" => HtmlMetaUtil.publishedTime(s)
  }

  override def nullSafeEval(input: Any): Any = {
    val r = extract(input.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = HtmlMetaUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val utf8 = classOf[UTF8String].getName
    val fn = field match {
      case "title" => "title"
      case "time"  => "timeAttr"
      case "h1"    => "h1s"
      case "links" => "links"
      case "robots" => "robotsContent"
      case "base"  => "baseHref"
      case "links_text" => "linksWithText"
      case "published" => "publishedTime"
    }
    nullSafeCodeGen(ctx, ev, x => {
      val tmp = ctx.freshName("meta")
      s"""
        |String $tmp = $util.$fn($x.toString());
        |if ($tmp == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $utf8.fromString($tmp); }
      """.stripMargin
    })
  }

  override def prettyName: String = "html_meta"
  override protected def withNewChildInternal(newChild: Expression): HtmlMeta =
    copy(child = newChild)
}

/** html_to_text(html): markup-stripped, entity-decoded, whitespace-
  * canonicalized text (see [[HtmlTextUtil]] for the exact contract).
  * Null -> null. */
case class HtmlToText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_to_text expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(HtmlTextUtil.extract(input.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val util = HtmlTextUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val utf8 = classOf[UTF8String].getName
      s"${ev.value} = $utf8.fromString($util.extract($x.toString()));"
    })

  override def prettyName: String = "html_to_text"
  override protected def withNewChildInternal(newChild: Expression): HtmlToText =
    copy(child = newChild)
}

object HtmlTextExpr {
  def htmlToText(html: Column): Column =
    Bridge.toColumn(HtmlToText(Bridge.toExpression(html)))

  def htmlTitle(html: Column): Column =
    Bridge.toColumn(HtmlMeta(Bridge.toExpression(html), "title"))

  def htmlTime(html: Column): Column =
    Bridge.toColumn(HtmlMeta(Bridge.toExpression(html), "time"))

  def htmlH1s(html: Column): Column =
    Bridge.toColumn(HtmlMeta(Bridge.toExpression(html), "h1"))

  def htmlLinks(html: Column): Column =
    Bridge.toColumn(HtmlMeta(Bridge.toExpression(html), "links"))

  def htmlRobots(html: Column): Column =
    Bridge.toColumn(HtmlMeta(Bridge.toExpression(html), "robots"))

  def htmlBaseHref(html: Column): Column =
    Bridge.toColumn(HtmlMeta(Bridge.toExpression(html), "base"))

  def htmlLinksWithText(html: Column): Column =
    Bridge.toColumn(HtmlMeta(Bridge.toExpression(html), "links_text"))

  def htmlPublished(html: Column): Column =
    Bridge.toColumn(HtmlMeta(Bridge.toExpression(html), "published"))

  def sitemapLocs(xml: Column): Column =
    Bridge.toColumn(SitemapLocs(Bridge.toExpression(xml)))
}

/** sitemap_locs(xml): every <loc> URL of a sitemap or sitemap index,
  * one per line, XML-unescaped ([[SitemapUtil]]). Null in -> null
  * out; no locs -> null. */
case class SitemapLocs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sitemap_locs expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val r = SitemapUtil.locs(input.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = SitemapUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val utf8 = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, x => {
      val tmp = ctx.freshName("locs")
      s"""
        |String $tmp = $util.locs($x.toString());
        |if ($tmp == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $utf8.fromString($tmp); }
      """.stripMargin
    })
  }

  override def prettyName: String = "sitemap_locs"
  override protected def withNewChildInternal(newChild: Expression): SitemapLocs =
    copy(child = newChild)
}
