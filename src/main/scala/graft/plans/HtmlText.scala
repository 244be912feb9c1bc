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

  private val blockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "tr", "td", "th", "br", "hr", "pre", "blockquote",
    "article", "section", "header", "footer")

  /** Case-insensitive search for `needle` (lowercase) in `s` from
    * `from`; -1 if absent. */
  private def findCi(s: String, needle: String, from: Int): Int = {
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
  private def decodeEntity(s: String, i: Int): (String, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 12) return (null, i + 1)
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
}
