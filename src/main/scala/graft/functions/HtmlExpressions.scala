package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML-to-text extraction — the markup-removal front of a web-crawl
  * training-data pipeline (the step between a WARC payload and every
  * downstream text stage: quality filters, dedup, tokenization).
  *
  * This is a SINGLE-PASS state-machine parser, not a regex chain: one
  * scan handles tag structure (with quoted attribute values, so a `>`
  * inside `title="a>b"` does not end the tag), `<script>`/`<style>`
  * raw-text elements (scanned to their case-insensitive close tag —
  * an embedded `"</b>"` string literal does not escape the script),
  * comments/doctype, character-entity decoding (named subset + decimal
  * and hex numeric, one pass — decoding `&amp;#65;` yields the literal
  * text `&#65;`, never `A`), and whitespace collapse. A regexp_replace
  * chain would re-scan the document once per rule and still mis-handle
  * quoted `>`; this fuses into whole-stage codegen as one static call.
  *
  * Contract (mirrors mainstream extractors): when a `<body` tag exists
  * only body content is extracted, otherwise the whole document; the
  * `<title>` is head metadata, surfaced separately by [[HtmlTitle]];
  * `<a href>` values are surfaced by [[HtmlLinks] ] in document order
  * (entity-decoded, as a browser would resolve them). All whitespace
  * runs collapse to a single space and the result is trimmed, so the
  * output is oracle-portable (`regexp_replace(s, '\s+', ' ', 'g')`).
  */
object Html {

  /** Tags whose content is raw text up to the matching close tag. */
  private val RawText = Set("script", "style")

  private final class Out {
    val sb = new java.lang.StringBuilder
    private var pendingWs = false
    def ws(): Unit = if (sb.length > 0) pendingWs = true
    def ch(c: Char): Unit = {
      if (c == ' ' || Character.isWhitespace(c)) { ws(); return }
      if (pendingWs) { sb.append(' '); pendingWs = false }
      sb.append(c)
    }
    def cp(code: Int): Unit =
      if (Character.isValidCodePoint(code) && code != 0) {
        if (code == 0xa0 || (code <= 0xffff && Character.isWhitespace(code.toChar))) ws()
        else {
          if (pendingWs) { sb.append(' '); pendingWs = false }
          sb.appendCodePoint(code)
        }
      }
    override def toString: String = sb.toString
  }

  /** Decode the entity starting at `i` (which points at '&').
    * Appends to `out`; returns the index AFTER the consumed entity, or
    * i+1 with a literal '&' appended when it isn't a valid entity. */
  private def entity(s: String, i: Int, out: Out): Int = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 12) { out.ch('&'); return i + 1 }
    val name = s.substring(i + 1, semi)
    name match {
      case "amp"  => out.ch('&')
      case "lt"   => out.ch('<')
      case "gt"   => out.ch('>')
      case "quot" => out.ch('"')
      case "apos" => out.ch('\'')
      case "nbsp" => out.ch(' ')
      case _ if name.length > 1 && name.charAt(0) == '#' =>
        val num = name.substring(1)
        try {
          val code =
            if (num.length > 1 && (num.charAt(0) == 'x' || num.charAt(0) == 'X'))
              Integer.parseInt(num.substring(1), 16)
            else Integer.parseInt(num, 10)
          out.cp(code)
        } catch { case _: NumberFormatException => out.ch('&'); return i + 1 }
      case _ => out.ch('&'); return i + 1
    }
    semi + 1
  }

  /** Lower-case tag name starting at `i`; empty when not a name char. */
  private def tagName(s: String, i: Int): String = {
    var j = i
    while (j < s.length && (Character.isLetterOrDigit(s.charAt(j)) || s.charAt(j) == '-')) j += 1
    s.substring(i, j).toLowerCase(java.util.Locale.ROOT)
  }

  /** Scan attributes from `i` to the tag-closing '>' honoring quoted
    * values; when `hrefOut` is non-null and an `href` attribute is
    * seen, its (entity-decoded) value is appended. Returns the index
    * after '>'; s.length when unterminated. */
  private def attrs(s: String, start: Int,
                    hrefOut: java.util.ArrayList[UTF8String]): Int = {
    var i = start
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '>') return i + 1
      if (c == '"' || c == '\'') {
        val end = s.indexOf(c, i + 1)
        i = if (end < 0) s.length else end + 1
      } else if (hrefOut != null && (c == 'h' || c == 'H') &&
                 s.regionMatches(true, i, "href", 0, 4) &&
                 (i == start || Character.isWhitespace(s.charAt(i - 1)))) {
        var j = i + 4
        while (j < s.length && Character.isWhitespace(s.charAt(j))) j += 1
        if (j < s.length && s.charAt(j) == '=') {
          j += 1
          while (j < s.length && Character.isWhitespace(s.charAt(j))) j += 1
          if (j < s.length && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
            val q = s.charAt(j)
            val end = s.indexOf(q, j + 1)
            val raw = if (end < 0) s.substring(j + 1) else s.substring(j + 1, end)
            val o = new Out
            var k = 0
            while (k < raw.length) {
              if (raw.charAt(k) == '&') k = entity(raw, k, o)
              else { o.ch(raw.charAt(k)); k += 1 }
            }
            hrefOut.add(UTF8String.fromString(o.toString))
            i = if (end < 0) s.length else end + 1
          } else i += 4
        } else i += 4
      } else i += 1
    }
    s.length
  }

  /** Full single-pass parse. Returns (text, titleOrNull, hrefs, pairs)
    * where pairs are (href, collapsed anchor text) for every
    * `<a href=…>` element — the labeled edge list a crawl link graph is
    * built from. A new `<a>` implicitly closes an open one (nested
    * anchors are invalid HTML); an anchor open at EOF still flushes. */
  def parse(html: String)
      : (String, String, java.util.ArrayList[UTF8String],
         java.util.ArrayList[Array[UTF8String]]) = {
    val all = new Out            // whole-document text
    val body = new Out           // text after a <body> open tag
    val title = new Out
    val hrefs = new java.util.ArrayList[UTF8String]()
    val pairs = new java.util.ArrayList[Array[UTF8String]]()
    var sawBody = false
    var inBody = false
    var inTitle = false
    var inAnchor = false
    var curHref: UTF8String = null
    var anchor = new Out
    def flushAnchor(): Unit = {
      if (inAnchor && curHref != null)
        pairs.add(Array(curHref, UTF8String.fromString(anchor.toString)))
      inAnchor = false; curHref = null
    }
    var i = 0
    val n = html.length
    def emit(c: Char): Unit = {
      if (inTitle) title.ch(c)
      else { all.ch(c); if (inBody) body.ch(c); if (inAnchor) anchor.ch(c) }
    }
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
          all.ws(); if (inBody) body.ws(); if (inAnchor) anchor.ws()
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val end = html.indexOf('>', i + 1)          // doctype / processing instr
          i = if (end < 0) n else end + 1
        } else {
          val closing = i + 1 < n && html.charAt(i + 1) == '/'
          val nameAt = if (closing) i + 2 else i + 1
          val name = tagName(html, nameAt)
          if (name.isEmpty) { emit('<'); i += 1 }    // bare '<' in text
          else {
            val afterName = nameAt + name.length
            val hrefsBefore = hrefs.size()
            i = attrs(html, afterName,
              if (!closing && name == "a") hrefs else null)
            if (name == "a") {
              flushAnchor() // a close OR a new open ends the current one
              if (!closing) {
                inAnchor = true
                curHref =
                  if (hrefs.size() > hrefsBefore) hrefs.get(hrefs.size() - 1)
                  else null
                anchor = new Out
              }
            }
            // every tag is at least a whitespace boundary in the text
            all.ws(); if (inBody) body.ws(); if (inAnchor) anchor.ws()
            if (!closing && RawText(name)) {
              // raw-text element: scan to the case-insensitive close tag
              val close = "</" + name
              var j = i
              var found = -1
              while (found < 0 && j <= n - close.length) {
                if (html.regionMatches(true, j, close, 0, close.length)) found = j
                j += 1
              }
              if (found < 0) i = n
              else {
                val gt = html.indexOf('>', found)
                i = if (gt < 0) n else gt + 1
              }
            } else name match {
              case "body"  => if (!closing) { sawBody = true; inBody = true }
                              else inBody = false
              case "title" => inTitle = !closing && title.sb.length == 0
              case _       => ()
            }
            if (closing && name == "title") inTitle = false
          }
        }
      } else if (c == '&') {
        val o = if (inTitle) title else all
        val next = entity(html, i, o)
        if (!inTitle && inBody) entity(html, i, body)
        if (!inTitle && inAnchor) entity(html, i, anchor)
        i = next
      } else { emit(c); i += 1 }
    }
    flushAnchor() // unterminated <a …> at EOF still yields its pair
    val text = (if (sawBody) body else all).toString
    val t = title.toString
    (text, if (t.isEmpty) null else t, hrefs, pairs)
  }

  /** Single-pass TABLE extraction: every `<td>`/`<th>` cell's decoded,
    * collapsed text, grouped into rows and top-level tables in document
    * order. Implicit closes per the HTML parser contract (`<td>a<td>b`,
    * `<tr>` runs without `</tr>`) are honored by flush-on-open; a
    * NESTED `<table>` inside a cell is not extracted separately — its
    * text flows into the containing cell (documented subset: depth-1
    * tables only). Empty rows (no cells) are dropped. */
  def tables(html: String): java.util.ArrayList[(Int, Int, Array[UTF8String])] = {
    val out = new java.util.ArrayList[(Int, Int, Array[UTF8String])]()
    var tableIdx = -1    // index of the CURRENT top-level table, -1 outside
    var depth = 0        // <table> nesting depth
    var rowIdx = 0
    var inCell = false
    var cell = new Out
    var row = new java.util.ArrayList[UTF8String]()
    def flushCell(): Unit = if (inCell) {
      row.add(UTF8String.fromString(cell.toString)); inCell = false
    }
    def flushRow(): Unit = {
      flushCell()
      if (!row.isEmpty) {
        out.add((tableIdx, rowIdx, row.toArray(new Array[UTF8String](row.size()))))
        rowIdx += 1
      }
      row = new java.util.ArrayList[UTF8String]()
    }
    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
          if (inCell) cell.ws()
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val end = html.indexOf('>', i + 1)
          i = if (end < 0) n else end + 1
        } else {
          val closing = i + 1 < n && html.charAt(i + 1) == '/'
          val nameAt = if (closing) i + 2 else i + 1
          val name = tagName(html, nameAt)
          if (name.isEmpty) { if (inCell) cell.ch('<'); i += 1 }
          else {
            i = attrs(html, nameAt + name.length, null)
            name match {
              case "table" if !closing =>
                depth += 1
                if (depth == 1) { tableIdx += 1; rowIdx = 0 }
              case "table" =>
                if (depth == 1) flushRow()
                depth = math.max(0, depth - 1)
              case "tr" if depth == 1 =>
                flushRow() // open implicitly closes the previous row
              case "td" | "th" if depth == 1 =>
                if (!closing) { flushCell(); inCell = true; cell = new Out }
                else flushCell()
              case rt if !closing && RawText(rt) =>
                val close = "</" + rt
                var j = i; var found = -1
                while (found < 0 && j <= n - close.length) {
                  if (html.regionMatches(true, j, close, 0, close.length)) found = j
                  j += 1
                }
                if (found < 0) i = n
                else { val gt = html.indexOf('>', found); i = if (gt < 0) n else gt + 1 }
              case _ => ()
            }
            if (inCell) cell.ws() // any tag is a whitespace boundary
          }
        }
      } else if (c == '&') {
        if (inCell) i = entity(html, i, cell)
        else i += 1
      } else { if (inCell) cell.ch(c); i += 1 }
    }
    flushRow() // unterminated table at EOF still yields its rows
    out
  }

  /** Generic attribute scan from `start` (just past the tag name) to
    * the closing '>': returns (lowercased name → entity-decoded value)
    * for every `name="v"` / `name='v'` / `name=bare` attribute, plus
    * the index after '>'. Valueless attributes map to "". */
  private def scanAttrs(s: String, start: Int)
      : (java.util.HashMap[String, String], Int) = {
    val m = new java.util.HashMap[String, String]()
    var i = start
    val n = s.length
    while (i < n) {
      var c = s.charAt(i)
      if (c == '>') return (m, i + 1)
      if (c == '/' || Character.isWhitespace(c)) { i += 1 }
      else {
        // attribute name: letters/digits plus the -, :, _ of data-/og: attrs
        var j = i
        while (j < n && (Character.isLetterOrDigit(s.charAt(j)) ||
          s.charAt(j) == '-' || s.charAt(j) == ':' || s.charAt(j) == '_')) j += 1
        if (j == i) { i += 1 } // stray char
        else {
          val name = s.substring(i, j).toLowerCase(java.util.Locale.ROOT)
          i = j
          while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
          if (i < n && s.charAt(i) == '=') {
            i += 1
            while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
            if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
              val q = s.charAt(i)
              val end = s.indexOf(q, i + 1)
              val raw = if (end < 0) s.substring(i + 1) else s.substring(i + 1, end)
              val o = new Out
              var k = 0
              while (k < raw.length) {
                if (raw.charAt(k) == '&') k = entity(raw, k, o)
                else { o.ch(raw.charAt(k)); k += 1 }
              }
              m.putIfAbsent(name, o.toString)
              i = if (end < 0) n else end + 1
            } else { // bare value: to whitespace or '>'
              val vStart = i
              while (i < n && !Character.isWhitespace(s.charAt(i)) &&
                s.charAt(i) != '>') i += 1
              m.putIfAbsent(name, s.substring(vStart, i))
            }
          } else m.putIfAbsent(name, "")
        }
      }
      if (i < n) { c = s.charAt(i); () }
    }
    (m, n)
  }

  /** Markdown emitter: block separation as pending newlines plus a
    * next-line prefix (heading hashes, list markers, blockquote '>'),
    * single-space whitespace collapse within a line — the [[Out]]
    * discipline lifted to block structure. */
  private final class Md {
    val sb = new java.lang.StringBuilder
    private var pendingNl = 0
    private var pendingWs = false
    private var prefixNext = ""
    /** Request ≥`nl` newlines before the next content, which will be
      * prefixed with `prefix` (later block() calls override both). */
    def block(nl: Int, prefix: String): Unit = {
      if (sb.length > 0) pendingNl = math.max(pendingNl, nl)
      prefixNext = prefix
      pendingWs = false
    }
    def ws(): Unit =
      if (sb.length > 0 && pendingNl == 0) pendingWs = true
    private def flushSep(): Unit = {
      if (pendingNl > 0) {
        var k = 0
        while (k < pendingNl) { sb.append('\n'); k += 1 }
        pendingNl = 0; pendingWs = false
      } else if (pendingWs) { sb.append(' '); pendingWs = false }
      if (prefixNext.nonEmpty) { sb.append(prefixNext); prefixNext = "" }
    }
    /** Inline marker / pre-rendered fragment: separators flush, the
      * string appends verbatim (no per-char collapse). */
    def mark(s: String): Unit = if (s.nonEmpty) { flushSep(); sb.append(s) }
    def ch(c: Char): Unit = {
      if (Character.isWhitespace(c)) { ws(); return }
      flushSep(); sb.append(c)
    }
    override def toString: String = sb.toString
  }

  /** Single-pass HTML → Markdown: the curation format most LLM-data
    * pipelines prefer over flat text (structure survives — headings,
    * lists, emphasis, links — while markup noise goes). Best-effort
    * CommonMark subset, documented:
    *  - `h1..h6` → `#…` headings; `p`/`div`/`section`/`article`/
    *    `table`/`tr`/`pre` → paragraph breaks; `br` → line break
    *  - `ul`/`ol`/`li` → `-` / `1.` items, nested lists indent two
    *    spaces per level (ordered counters per level)
    *  - `b`/`strong` → `**`, `i`/`em` → `*`, `code` → backticks
    *    (marker pairs follow the tags; unbalanced HTML yields
    *    unbalanced markers — best-effort, never a crash)
    *  - `<a href>` → `[text](href)` (anchor text captured through its
    *    own emitter; nested/unterminated anchors follow [[parse]]'s
    *    implicit-close rule); `<img>` → `![alt](src)`
    *  - `blockquote` → a `> `-prefixed block (first line only —
    *    documented subset); `<head>` content, script/style raw text
    *    and comments are skipped whole
    * Whitespace collapses per line exactly like [[parse]]; `<pre>`
    * content collapses too (documented — use the raw HTML for exact
    * code blocks). */
  /** Tags legal inside <head> — anything else opening while inHead
    * implies the head closed implicitly (HTML5). */
  private val MarkdownHeadOnly = Set("head", "title", "meta", "link",
    "base", "style", "script", "noscript", "template", "html")

  def markdown(html: String): String = {
    val md = new Md
    var inHead = false
    var inAnchor = false
    var curHref: String = null
    var anchor = new Md
    val listOrdered = new java.util.ArrayList[Boolean]()
    val listCounter = new java.util.ArrayList[Int]()
    def out: Md = if (inAnchor) anchor else md
    def flushAnchor(): Unit = {
      if (inAnchor) {
        val txt = anchor.toString.trim
        if (curHref != null && curHref.nonEmpty)
          md.mark("[" + txt + "](" + curHref + ")")
        else md.mark(txt)
      }
      inAnchor = false; curHref = null
    }
    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
          out.ws()
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val end = html.indexOf('>', i + 1)
          i = if (end < 0) n else end + 1
        } else {
          val closing = i + 1 < n && html.charAt(i + 1) == '/'
          val nameAt = if (closing) i + 2 else i + 1
          val name = tagName(html, nameAt)
          if (name.isEmpty) { out.ch('<'); i += 1 }
          else {
            val afterName = nameAt + name.length
            // tags that need their attributes take the map; the rest skip
            val wantsAttrs = !closing && (name == "a" || name == "img")
            val (attrMap, after) =
              if (wantsAttrs) scanAttrs(html, afterName)
              else (null, attrs(html, afterName, null))
            i = after
            // real crawl pages routinely omit </head>: any opening tag
            // that isn't head-only content implies the head ended (the
            // HTML5 implicit close), else the whole document renders
            // empty markdown
            if (inHead && !closing && !MarkdownHeadOnly(name)) inHead = false
            name match {
              case "head" => inHead = !closing
              case "body" => inHead = false; md.block(2, "")
              case _ if inHead => () // head content never renders
              case "a" =>
                flushAnchor()
                if (!closing) {
                  inAnchor = true
                  curHref = if (attrMap != null) attrMap.get("href") else null
                  anchor = new Md
                }
              case "img" if !closing =>
                val src = if (attrMap == null) null else attrMap.get("src")
                val alt = Option(if (attrMap == null) null else attrMap.get("alt")).getOrElse("")
                if (src != null && src.nonEmpty)
                  out.mark("![" + alt + "](" + src + ")")
              case h if h.length == 2 && h.charAt(0) == 'h' &&
                  h.charAt(1) >= '1' && h.charAt(1) <= '6' =>
                if (!closing) md.block(2, "#" * (h.charAt(1) - '0') + " ")
                else md.block(2, "")
              case "p" | "div" | "section" | "article" | "table" | "tr" |
                   "pre" =>
                md.block(2, "")
              case "br" => out.block(1, "")
              case "blockquote" =>
                if (!closing) md.block(2, "> ") else md.block(2, "")
              case "ul" | "ol" =>
                if (!closing) {
                  listOrdered.add(name == "ol"); listCounter.add(0)
                  md.block(if (listOrdered.size() == 1) 2 else 1, "")
                } else if (!listOrdered.isEmpty) {
                  listOrdered.remove(listOrdered.size() - 1)
                  listCounter.remove(listCounter.size() - 1)
                  md.block(if (listOrdered.isEmpty) 2 else 1, "")
                }
              case "li" if !closing =>
                val depth = math.max(listOrdered.size() - 1, 0)
                val marker =
                  if (!listOrdered.isEmpty && listOrdered.get(depth)) {
                    listCounter.set(depth, listCounter.get(depth) + 1)
                    s"${listCounter.get(depth)}. "
                  } else "- "
                md.block(1, "  " * depth + marker)
              case "b" | "strong" => out.mark("**")
              case "i" | "em" => out.mark("*")
              case "code" => out.mark("`")
              case _ => out.ws()
            }
            if (!closing && RawText(name)) {
              val close = "</" + name
              var j = i
              var found = -1
              while (found < 0 && j <= n - close.length) {
                if (html.regionMatches(true, j, close, 0, close.length)) found = j
                j += 1
              }
              if (found < 0) i = n
              else {
                val gt = html.indexOf('>', found)
                i = if (gt < 0) n else gt + 1
              }
            }
          }
        }
      } else if (c == '&') {
        if (inHead) { val skip = new Out; i = entity(html, i, skip) }
        else {
          // decode through a throwaway Out, then feed the result —
          // keeps one entity table for every walk
          val o = new Out; o.ch('.')  // seed so ws() registers
          val next = entity(html, i, o)
          val t = o.toString
          if (t.length <= 1) out.ws() // entity collapsed to whitespace
          else t.substring(1).foreach(out.ch)
          i = next
        }
      } else { if (!inHead) out.ch(c) else () ; i += 1 }
    }
    flushAnchor()
    md.toString.trim
  }

  def markdownU(html: UTF8String): UTF8String =
    UTF8String.fromString(markdown(html.toString))

  /** Single-pass `<meta>` / `<link rel="canonical">` extraction:
    * (key, content) pairs in document order, where key is the meta's
    * `name`/`property`/`http-equiv` (lowercased, in that precedence)
    * and content its entity-decoded `content`; a canonical link emits
    * ("canonical", href). Raw-text elements (script/style) are skipped
    * whole, so a meta-looking string inside JavaScript never leaks. */
  def metas(html: String): java.util.ArrayList[Array[UTF8String]] = {
    val out = new java.util.ArrayList[Array[UTF8String]]()
    var i = 0
    val n = html.length
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) i = n
      else if (html.regionMatches(lt, "<!--", 0, 4)) {
        val end = html.indexOf("-->", lt + 4)
        i = if (end < 0) n else end + 3
      } else if (lt + 1 < n && (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?')) {
        val end = html.indexOf('>', lt + 1)
        i = if (end < 0) n else end + 1
      } else {
        val closing = lt + 1 < n && html.charAt(lt + 1) == '/'
        val nameAt = if (closing) lt + 2 else lt + 1
        val name = tagName(html, nameAt)
        if (name.isEmpty) i = lt + 1
        else if (!closing && (name == "meta" || name == "link")) {
          val (am, after) = scanAttrs(html, nameAt + name.length)
          if (name == "meta") {
            val key = Option(am.get("name")).filter(_.nonEmpty)
              .orElse(Option(am.get("property")).filter(_.nonEmpty))
              .orElse(Option(am.get("http-equiv")).filter(_.nonEmpty))
            val content = Option(am.get("content"))
            for (k <- key; v <- content) out.add(Array(
              UTF8String.fromString(k.toLowerCase(java.util.Locale.ROOT)),
              UTF8String.fromString(v)))
          } else {
            val rel = Option(am.get("rel")).map(_.toLowerCase(java.util.Locale.ROOT))
            val href = Option(am.get("href"))
            if (rel.contains("canonical") && href.nonEmpty) out.add(Array(
              UTF8String.fromString("canonical"),
              UTF8String.fromString(href.get)))
          }
          i = after
        } else if (!closing && RawText(name)) {
          val close = "</" + name
          var j = lt + 1
          var found = -1
          while (found < 0 && j <= n - close.length) {
            if (html.regionMatches(true, j, close, 0, close.length)) found = j
            j += 1
          }
          if (found < 0) i = n
          else { val gt = html.indexOf('>', found); i = if (gt < 0) n else gt + 1 }
        } else {
          val gt = html.indexOf('>', lt + 1)
          i = if (gt < 0) n else gt + 1
        }
      }
    }
    out
  }

  // ---- static entry points used by codegen ----

  def metasU(html: UTF8String): GenericArrayData = {
    val ps = metas(html.toString)
    val rows = new Array[Any](ps.size())
    var i = 0
    while (i < rows.length) {
      val p = ps.get(i)
      rows(i) = org.apache.spark.sql.catalyst.InternalRow(p(0), p(1))
      i += 1
    }
    new GenericArrayData(rows)
  }

  def tablesU(html: UTF8String): GenericArrayData = {
    val ts = tables(html.toString)
    val rows = new Array[Any](ts.size())
    var i = 0
    while (i < rows.length) {
      val (t, r, cells) = ts.get(i)
      rows(i) = org.apache.spark.sql.catalyst.InternalRow(
        t, r, new GenericArrayData(cells.asInstanceOf[Array[Any]]))
      i += 1
    }
    new GenericArrayData(rows)
  }

  def textU(html: UTF8String): UTF8String =
    UTF8String.fromString(parse(html.toString)._1)

  def titleU(html: UTF8String): UTF8String = {
    val t = parse(html.toString)._2
    if (t == null) null else UTF8String.fromString(t)
  }

  def linksU(html: UTF8String): GenericArrayData =
    new GenericArrayData(parse(html.toString)._3.toArray)

  def linkPairsU(html: UTF8String): GenericArrayData = {
    val pairs = parse(html.toString)._4
    val rows = new Array[Any](pairs.size())
    var i = 0
    while (i < rows.length) {
      val p = pairs.get(i)
      rows(i) = org.apache.spark.sql.catalyst.InternalRow(p(0), p(1))
      i += 1
    }
    new GenericArrayData(rows)
  }
}

private[functions] trait HtmlStringInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = self.child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} requires a string input, got ${t.simpleString}")
  }
}

/** Visible text of an HTML document (body-only when a body tag exists),
  * whitespace-collapsed — see [[Html]]. */
case class HtmlToText(child: Expression)
    extends UnaryExpression with HtmlStringInput {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_text"
  override def nullSafeEval(input: Any): Any =
    Html.textU(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Html.textU($c)")
  override protected def withNewChildInternal(newChild: Expression): HtmlToText =
    copy(child = newChild)
}

/** Single-pass HTML → Markdown (see [[Html.markdown]] for the
  * documented CommonMark subset). */
case class HtmlMarkdown(child: Expression)
    extends UnaryExpression with HtmlStringInput {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_markdown"
  override def nullSafeEval(input: Any): Any =
    Html.markdownU(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Html.markdownU($c)")
  override protected def withNewChildInternal(newChild: Expression): HtmlMarkdown =
    copy(child = newChild)
}

/** First `<title>` content of an HTML document; null when absent. */
case class HtmlTitle(child: Expression)
    extends UnaryExpression with HtmlStringInput {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_html_title"
  override def nullSafeEval(input: Any): Any =
    Html.titleU(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Html.titleU($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): HtmlTitle =
    copy(child = newChild)
}

/** `<a href>` values in document order, entity-decoded. */
case class HtmlLinks(child: Expression)
    extends UnaryExpression with HtmlStringInput {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_html_links"
  override def nullSafeEval(input: Any): Any =
    Html.linksU(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Html.linksU($c)")
  override protected def withNewChildInternal(newChild: Expression): HtmlLinks =
    copy(child = newChild)
}

/** `(href, anchor text)` structs in document order — the labeled edge
  * list of the crawl link graph. Anchor text is entity-decoded and
  * whitespace-collapsed by the same one-pass walk as the body text;
  * `<a>` without href yields no pair (its text still flows into the
  * page text). */
/** `(table_idx, row_idx, cells)` structs for every row of every
  * TOP-LEVEL `<table>` in document order — cells entity-decoded and
  * whitespace-collapsed; implicit `<td>`/`<tr>` closes honored; a
  * nested table's text flows into its containing cell (depth-1 subset,
  * see [[Html.tables]]). */
case class HtmlTables(child: Expression)
    extends UnaryExpression with HtmlStringInput {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("table_idx", IntegerType, nullable = false),
      StructField("row_idx", IntegerType, nullable = false),
      StructField("cells", ArrayType(StringType, containsNull = false),
        nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_html_tables"
  override def nullSafeEval(input: Any): Any =
    Html.tablesU(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Html.tablesU($c)")
  override protected def withNewChildInternal(newChild: Expression): HtmlTables =
    copy(child = newChild)
}

/** `<meta>` / canonical-link (key, content) pairs in document order —
  * see [[Html.metas]]. */
case class HtmlMetaPairs(child: Expression)
    extends UnaryExpression with HtmlStringInput {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("content", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_html_meta"
  override def nullSafeEval(input: Any): Any =
    Html.metasU(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Html.metasU($c)")
  override protected def withNewChildInternal(newChild: Expression): HtmlMetaPairs =
    copy(child = newChild)
}

case class HtmlLinkPairs(child: Expression)
    extends UnaryExpression with HtmlStringInput {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("href", StringType, nullable = false),
      StructField("anchor", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_html_link_pairs"
  override def nullSafeEval(input: Any): Any =
    Html.linkPairsU(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Html.linkPairsU($c)")
  override protected def withNewChildInternal(newChild: Expression): HtmlLinkPairs =
    copy(child = newChild)
}
