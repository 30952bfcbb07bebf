package graft

import graft.functions.UnicodeNorm
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for Unicode normalization ([[graft.functions.UnicodeNorm]])
  * and the `normalizetext` stage. Tricky code points are built with
  * explicit escapes so the source stays ASCII-auditable. */
class UnicodeNormSpec extends AnyFunSuite {

  private val combAcute = "́"   // combining acute
  private val combUml = "̈"     // combining diaeresis
  private val eAcute = "é"      // precomposed é
  private val nbsp = " "
  private val bel = ""

  private def full(s: String): String =
    UnicodeNorm.norm(s, "NFC", stripAccents = true, toLower = true, cleanWs = true)
  private def nfc(s: String): String =
    UnicodeNorm.norm(s, "NFC", stripAccents = false, toLower = false, cleanWs = true)

  test("NFC composes combining marks; accent strip flattens both spellings") {
    assert(nfc("Cafe" + combAcute) == "Caf" + eAcute)
    assert(full("Cafe" + combAcute) == "cafe")
    assert(full("Caf" + eAcute) == "cafe")
    assert(full("São Paulo") == "sao paulo")
    assert(full("Zu" + combUml + "rich") == "zurich")
  }

  test("NFKC folds compatibility forms") {
    assert(UnicodeNorm.norm("ﬁle", "NFKC", false, false, true) == "file") // fi ligature
    assert(UnicodeNorm.norm("ＡＢ", "NFKC", false, false, true) == "AB") // fullwidth
    // NFC leaves compatibility forms alone
    assert(UnicodeNorm.norm("ﬁle", "NFC", false, false, true) == "ﬁle")
  }

  test("whitespace canonicalization: runs, NBSP, tabs, control chars, trim") {
    assert(nfc("  a \t b c  ") == "a b c")
    assert(nfc("a" + bel + "b") == "ab")          // BEL removed, no space
    assert(nfc("a b") == "a b")              // line separator is ws
    assert(nfc("a" + nbsp + "b") == "a b")        // NBSP is layout
    assert(nfc("") == "")
    assert(nfc(" \t ") == "")
    // cleanWs off preserves spacing
    assert(UnicodeNorm.norm("a  b", "NFC", false, false, false) == "a  b")
  }

  test("accent strip only removes non-spacing marks, not base letters") {
    assert(full("Æon") == "æon")        // Æ → æ: letter, not mark
    assert(full("straße") == "straße")  // ß survives ROOT lower
    assert(full("Øre") == "øre")        // Ø has no decomposition
  }

  test("bad form name fails loudly at plan time") {
    val e = intercept[RuntimeException](UnicodeNorm.checkForm("NFX"))
    assert(e.getMessage.contains("NFC|NFD|NFKC|NFKD"))
  }
}

class NormalizeTextStageSpec extends SparkSpec {
  import graft.engine.Engine

  test("normalizetext stage: default overwrite, null passthrough, codegen path") {
    val ctx = newCtx()
    val df = spark.sql(
      "SELECT 1 AS id, 'Café  MENU' AS text " +
      "UNION ALL SELECT 2, cast(null as string)")
    val out = graft.text.TextStages.normalizetext(
      graft.spec.ComponentSpec("normalizetext",
        Map("stripAccents" -> true, "lower" -> true)), ctx)(df)
      .orderBy("id").collect()
    assert(out(0).getString(1) == "cafe menu")
    assert(out(1).isNullAt(1))
  }

  test("normalizetext via engine config with explicit form") {
    val out = Engine.runJson(newCtx(), s"""{
      "source": {"file": {"path": "$sfDir/documents.parquet"}},
      "extractor": {"parquet": {}},
      "transformers": [
        {"code": {"language": "sql", "code":
          "SELECT doc_id, concat('\\ufb01x  ', text) AS text FROM __input"}},
        {"normalizetext": {"form": "NFKC"}}],
      "loader": {"memory": {}} }""")
    val r = out.select("text").limit(1).collect().head.getString(0)
    assert(r.startsWith("fix "))
    assert(!r.contains("  "))
  }
}
