package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Main-content extraction (boilerplate removal) — the curation
  * stage between raw page text and a training corpus: navigation,
  * footers, cookie banners and link farms survive html_to_text but
  * poison a corpus (C4, RefinedWeb and Dolma all strip boilerplate
  * before any quality gate sees the text). The classic
  * jusText/boilerpipe CORE signal — short, link-dense blocks are
  * chrome; long, link-sparse blocks are content — is enough for the
  * bulk of the win and is exactly statable, so it grades like every
  * other kernel.
  *
  * Contract (pinned; q_main_text drives it against a
  * by-construction oracle):
  *   1. the walk is [[HtmlTextUtil]]'s (same tag naivety, same
  *      script/style-with-content drop, same comment/CDATA/decl
  *      drop, same one-pass entity decode, bare '<' literal,
  *      dangling open tag at EOF drops the fragment);
  *   2. BLOCKS: text accumulates into the current block; every
  *      block-level tag (open or close, the [[HtmlTextUtil]] set)
  *      flushes it. Inline tags separate words but do not flush.
  *   3. LINK SPAN: chars emitted between <a …> and </a> count as
  *      link chars (nesting tracked as a depth; an <a/> self-close
  *      opens nothing); whitespace counts toward neither side. A
  *      block-tag flush RESETS the anchor depth (r14 — HTML parsers
  *      implicitly close <a> at block boundaries): one unclosed
  *      anchor must not count every later block as 100% link text
  *      and silently drop the rest of the page.
  *   4. KEEP RULE: a block survives iff its normalized text (all
  *      whitespace runs → one space, ends trimmed — blocks are
  *      single-line by construction) is at least 25 chars AND
  *      link chars * 3 <= non-whitespace chars (link density
  *      <= 1/3).
  *   5. Output: surviving blocks joined by '\n'; null when none
  *      survive (no content ≠ empty content, the links()/meta
  *      convention).
  * Single forward pass, zero regex, O(|html|). */
object MainTextUtil {

  private val minChars = 25

  /** All-whitespace collapse to single spaces + trim (blocks are
    * single-line; source newlines inside a paragraph are soft
    * wraps). */
  private def collapse(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pending = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' ||
        c == '\u00A0') pending = true
      else {
        if (pending && sb.length > 0) sb.append(' ')
        pending = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  def mainText(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder
    val block = new java.lang.StringBuilder(256)
    var nwTotal = 0
    var nwLink = 0
    var inA = 0
    var kept = false
    def emit(str: String): Unit = {
      block.append(str)
      var k = 0
      while (k < str.length) {
        val ch = str.charAt(k)
        if (!(ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r' ||
          ch == '\u00A0')) {
          nwTotal += 1
          if (inA > 0) nwLink += 1
        }
        k += 1
      }
    }
    def flush(): Unit = {
      if (block.length > 0) {
        val txt = collapse(block.toString)
        if (txt.length >= minChars && nwLink * 3 <= nwTotal) {
          if (kept) out.append('\n')
          out.append(txt)
          kept = true
        }
      }
      block.setLength(0)
      nwTotal = 0
      nwLink = 0
    }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          emit(" ")
          i = if (e < 0) n else e + 3
        } else if (s.regionMatches(true, i, "<![CDATA[", 0, 9)) {
          val e = s.indexOf("]]>", i + 9)
          emit(" ")
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n &&
            (s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
          val e = s.indexOf('>', i + 1)
          emit(" ")
          i = if (e < 0) n else e + 1
        } else if (i + 1 < n &&
            (s.charAt(i + 1).isLetter || s.charAt(i + 1) == '/')) {
          var p = i + 1
          if (s.charAt(p) == '/') p += 1
          val nameStart = p
          while (p < n && s.charAt(p).isLetterOrDigit) p += 1
          val name = s.substring(nameStart, p)
            .toLowerCase(java.util.Locale.ROOT)
          val closing = s.charAt(i + 1) == '/'
          val gt = s.indexOf('>', p)
          if (gt < 0) { i = n } // dangling open tag at EOF: drop
          else if (!closing && (name == "script" || name == "style")) {
            val close = HtmlTextUtil.findCi(s, "</" + name, gt + 1)
            emit(" ")
            if (close < 0) i = n
            else {
              val cgt = s.indexOf('>', close)
              i = if (cgt < 0) n else cgt + 1
            }
          } else {
            if (name == "a") {
              if (closing) { if (inA > 0) inA -= 1 }
              else if (s.charAt(gt - 1) != '/') inA += 1
            }
            if (HtmlTextUtil.blockTags.contains(name)) {
              flush()
              inA = 0 // implicit </a> at a block boundary (rule 3)
            } else emit(" ")
            i = gt + 1
          }
        } else { emit(String.valueOf(c)); i += 1 } // bare '<' literal
      } else if (c == '&') {
        val (dec, next) = HtmlTextUtil.decodeEntity(s, i)
        if (dec == null) emit("&") else emit(dec)
        i = next
      } else { emit(String.valueOf(c)); i += 1 }
    }
    flush()
    if (out.length == 0) null else out.toString
  }
}

/** html_main_text(html): boilerplate-stripped main content per
  * [[MainTextUtil]]'s pinned block/link-density contract. Null in ->
  * null out; a page with NO surviving block -> null (all-chrome
  * pages drop from the corpus, they do not enter as ''). */
case class HtmlMainText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_main_text expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val r = MainTextUtil.mainText(input.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = MainTextUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val utf8 = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, x => {
      val tmp = ctx.freshName("main")
      s"""
        |String $tmp = $util.mainText($x.toString());
        |if ($tmp == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $utf8.fromString($tmp); }
      """.stripMargin
    })
  }

  override def prettyName: String = "html_main_text"
  override protected def withNewChildInternal(newChild: Expression): HtmlMainText =
    copy(child = newChild)
}

object MainTextExpr {
  def htmlMainText(html: Column): Column =
    Bridge.toColumn(HtmlMainText(Bridge.toExpression(html)))
}
