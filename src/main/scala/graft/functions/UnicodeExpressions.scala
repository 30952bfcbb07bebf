package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization — the cleanup pass a multilingual corpus
  * gets before dedup/tokenization (mixed NFC/NFD sources hash apart,
  * stray control bytes poison quality filters, NBSP defeats whitespace
  * tokenizers). One codegen'd expression applies, in order:
  *
  *  1. canonical/compatibility normalization (`NFC`/`NFD`/`NFKC`/`NFKD`,
  *     java.text.Normalizer — the Unicode-standard forms);
  *  2. optional accent stripping: NFD-decompose, drop non-spacing marks
  *     (category Mn), re-normalize to the requested form — "café"/"café"
  *     (precomposed or combining) both become "cafe";
  *  3. optional ROOT-locale lowercasing;
  *  4. optional control-character removal (ISO control chars, which are
  *     never legitimate document text) and whitespace canonicalization:
  *     every whitespace run — including NBSP, which is not Java
  *     whitespace but is always layout in crawl text — collapses to one
  *     space, trimmed.
  *
  * Ordering matters: lowercasing after accent stripping keeps the strip
  * exact (case mappings can re-introduce combining marks), and the
  * whitespace pass runs last so earlier steps can expose new runs.
  */
object UnicodeNorm {

  private def form(name: String): java.text.Normalizer.Form = name match {
    case "NFC" => java.text.Normalizer.Form.NFC
    case "NFD" => java.text.Normalizer.Form.NFD
    case "NFKC" => java.text.Normalizer.Form.NFKC
    case "NFKD" => java.text.Normalizer.Form.NFKD
    case other => sys.error(
      s"normalizetext: form must be NFC|NFD|NFKC|NFKD, got '$other'")
  }

  /** Validate a form name eagerly (plan time), returning it. */
  def checkForm(name: String): String = { form(name); name }

  def norm(s: String, formName: String, stripAccents: Boolean,
           toLower: Boolean, cleanWs: Boolean): String = {
    val f = form(formName)
    var t = java.text.Normalizer.normalize(s, f)
    if (stripAccents) {
      val d = java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(d.length)
      var i = 0
      while (i < d.length) {
        val cp = d.codePointAt(i)
        if (Character.getType(cp) != Character.NON_SPACING_MARK)
          sb.appendCodePoint(cp)
        i += Character.charCount(cp)
      }
      t = java.text.Normalizer.normalize(sb.toString, f)
    }
    if (toLower) t = t.toLowerCase(java.util.Locale.ROOT)
    if (cleanWs) {
      val sb = new java.lang.StringBuilder(t.length)
      var pendingWs = false
      var i = 0
      while (i < t.length) {
        val cp = t.codePointAt(i)
        if (Character.isWhitespace(cp) || cp == 0xa0 || cp == 0x2007 || cp == 0x202f) {
          if (sb.length > 0) pendingWs = true // leading ws drops
        } else if (!Character.isISOControl(cp)) {
          if (pendingWs) { sb.append(' '); pendingWs = false }
          sb.appendCodePoint(cp)
        }
        i += Character.charCount(cp)
      }
      t = sb.toString
    }
    t
  }

  def normU(s: UTF8String, formName: String, stripAccents: Boolean,
            toLower: Boolean, cleanWs: Boolean): UTF8String =
    UTF8String.fromString(norm(s.toString, formName, stripAccents, toLower, cleanWs))
}

/** Deflate compression ratio of a string — the information-density
  * quality signal (repetitive spam/boilerplate compresses an order of
  * magnitude better than natural text; pipelines cut on a low-ratio
  * threshold). zlib deflate at a fixed level is deterministic for a
  * given input, so the signal is reproducible across runs and hosts. */
object DeflateRatio {
  def ratio(s: UTF8String, level: Int): Double = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(level)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }
}

/** Codegen'd deflate ratio of a string column — see [[DeflateRatio]]. */
case class DeflateRatioExpr(child: Expression, level: Int)
    extends UnaryExpression {
  require(level >= 1 && level <= 9, s"compressratio: level must be 1..9, got $level")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_deflate_ratio"

  override def nullSafeEval(input: Any): Any =
    DeflateRatio.ratio(input.asInstanceOf[UTF8String], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateRatio.ratio($c, $level)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatioExpr =
    copy(child = newChild)
}

/** Codegen'd Unicode normalization of a string column — see
  * [[UnicodeNorm.norm]]. The mode flags are plan-time literals, so the
  * generated code is a single static call inside whole-stage codegen. */
case class UnicodeNormExpr(child: Expression, formName: String,
    stripAccents: Boolean, toLower: Boolean, cleanWs: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unicode_norm"

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.normU(input.asInstanceOf[UTF8String], formName,
      stripAccents, toLower, cleanWs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.UnicodeNorm.normU($c, "$formName", $stripAccents, $toLower, $cleanWs)""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormExpr =
    copy(child = newChild)
}
