package graft.text

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Wikitext → plain text (the WikiExtractor-class cleanup for Wikipedia
  * dumps — with the `xml` extractor, the full wiki landing path). The
  * markup grammar is public (MediaWiki); the passes, in order:
  *
  *  0. XML entities decoded (dump wikitext arrives XML-escaped — every
  *     structural pass matches on the decoded characters);
  *  1. HTML comments removed;
  *  2. `<ref…>…</ref>` / `<ref…/>` citations removed;
  *  3. `{| … |}` tables and `{{ … }}` templates removed NEST-AWARE
  *     (depth-counted scan — regexes cannot balance braces; an
  *     unterminated structure drops to end-of-text, WikiExtractor's
  *     behavior);
  *  4. `[[File:…]]`/`[[Image:…]]` media links removed nest-aware (their
  *     captions legally contain nested `[[…]]` links);
  *  5. `[[target|label]]` → label, `[[target]]` → target;
  *  6. `[proto://url label]` → label, bare external link → dropped;
  *  7. bold/italic quote runs (`'''''`, `'''`, `''`) removed;
  *  8. `== heading ==` markers stripped (text kept), list bullets
  *     (`*`, `#`, `:`, `;` at line start) stripped;
  *  9. leftover inline HTML tags stripped;
  * 10. whitespace collapsed + trimmed.
  */
object Wikitext {

  /** Remove balanced `open…close` structures, depth-aware. */
  private def stripNested(s: String, open: String, close: String): String = {
    if (s.indexOf(open) < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var depth = 0
    while (i < s.length) {
      if (s.regionMatches(i, open, 0, open.length)) { depth += 1; i += open.length }
      else if (depth > 0 && s.regionMatches(i, close, 0, close.length)) {
        depth -= 1; i += close.length
      } else {
        if (depth == 0) sb.append(s.charAt(i))
        i += 1
      }
    }
    sb.toString
  }

  /** Resolve `[[…]]` links: media namespaces dropped whole (nest-aware),
    * others keep the label (after the LAST top-level `|`) or target. */
  private def links(s: String): String = {
    if (s.indexOf("[[") < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.regionMatches(i, "[[", 0, 2)) {
        // find the matching ]] at depth 0
        var depth = 1
        var j = i + 2
        var end = -1
        while (end < 0 && j < s.length - 1) {
          if (s.regionMatches(j, "[[", 0, 2)) { depth += 1; j += 2 }
          else if (s.regionMatches(j, "]]", 0, 2)) {
            depth -= 1; if (depth == 0) end = j else j += 2
          } else j += 1
        }
        if (end < 0) { i = s.length } // unterminated link: drop to end
        else {
          val inner = s.substring(i + 2, end)
          val ns = inner.takeWhile(_ != ':').toLowerCase(java.util.Locale.ROOT)
          if (ns == "file" || ns == "image" || ns == "category") ()
          else {
            // label = after the last depth-0 '|'
            var k = 0; var d = 0; var bar = -1
            while (k < inner.length) {
              if (inner.regionMatches(k, "[[", 0, 2)) { d += 1; k += 2 }
              else if (inner.regionMatches(k, "]]", 0, 2)) { d -= 1; k += 2 }
              else { if (d == 0 && inner.charAt(k) == '|') bar = k; k += 1 }
            }
            sb.append(links(if (bar < 0) inner else inner.substring(bar + 1)))
          }
          i = end + 2
        }
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  def clean(s: String): String = {
    // entities FIRST: dump wikitext arrives XML-escaped (a <ref> is
    // stored as &lt;ref&gt;), and every structural pass below matches
    // on the decoded characters — WikiExtractor's order
    var t = graft.sources.Xml.decode(s)
    t = t.replaceAll("(?s)<!--.*?-->", " ")
    t = t.replaceAll("(?is)<ref[^>]*/>", " ")
    t = t.replaceAll("(?is)<ref[^>]*>.*?</ref>", " ")
    t = stripNested(t, "{|", "|}")
    t = stripNested(t, "{{", "}}")
    t = links(t)
    t = t.replaceAll("\\[(?:https?|ftp)://[^\\s\\]]*+\\s*+([^\\]]*)\\]", "$1")
    t = t.replace("'''''", "").replace("'''", "").replace("''", "")
    t = t.replaceAll("(?m)^(={1,6})\\s*(.*?)\\s*={1,6}\\s*$", "$2")
    t = t.replaceAll("(?m)^[*#:;]+\\s*", "")
    t = t.replaceAll("(?s)<[^>]+>", " ")
    t.replaceAll("\\s+", " ").trim
  }

  def cleanU(s: UTF8String): UTF8String = UTF8String.fromString(clean(s.toString))
}

/** Codegen'd wikitext cleanup of a string column — see [[Wikitext]]. */
case class WikitextClean(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_wikitext_clean"
  override def nullSafeEval(input: Any): Any =
    Wikitext.cleanU(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.Wikitext.cleanU($c)")
  override protected def withNewChildInternal(newChild: Expression): WikitextClean =
    copy(child = newChild)
}
