package graft

import graft.sources.Xml
import graft.text.Wikitext
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the XML record extractor and the wikitext cleaner. */
class XmlParserSpec extends AnyFunSuite {

  test("record slicing: rowTag boundaries, name-prefix rejection, nesting is an error") {
    val doc = "<root><page><id>1</id></page><pageX>no</pageX><page><id>2</id></page></root>"
    val recs = Xml.records(doc, "page").toList
    assert(recs.size == 2)
    assert(recs.head.contains("<id>1</id>"))
    val nested = "<page><page><id>1</id></page></page>"
    val e = intercept[RuntimeException](Xml.records(nested, "page").toList)
    assert(e.getMessage.contains("nest"))
    val unterminated = "<page><id>1</id>"
    val e2 = intercept[RuntimeException](Xml.records(unterminated, "page").toList)
    assert(e2.getMessage.contains("unterminated"))
  }

  test("record fields: leaf decode, raw nested children, attributes, repeats, self-closing") {
    val rec = "<page lang=\"en\" beta>" +
      "<title>A &amp; B &#65;</title>" +
      "<empty/>" +
      "<revision><id>9</id><text bytes=\"3\">x &lt;hi&gt;</text></revision>" +
      "<tag>one</tag><tag>two</tag>" +
      "</page>"
    val f = Xml.recordFields(rec, "page")
    assert(f("_lang") == "en")
    assert(f("title") == "A & B A")              // entity + numeric decode
    assert(f("empty") == "")
    assert(f("revision").startsWith("<id>9</id>")) // raw inner XML, not decoded
    assert(f("revision").contains("&lt;hi&gt;"))
    assert(f("tag") == "one\ntwo")               // repeats concatenate
  }

  test("same-name nesting inside a child resolves to the MATCHING close tag") {
    val rec = "<page><a>outer <a>inner</a> tail</a><b>ok</b></page>"
    val f = Xml.recordFields(rec, "page")
    assert(f("a") == "outer <a>inner</a> tail")
    assert(f("b") == "ok")
  }
}

class WikitextSpec extends AnyFunSuite {
  private def c(s: String) = Wikitext.clean(s)

  test("templates and tables strip nest-aware; unterminated drops to end") {
    assert(c("a {{tpl|x={{inner}}}} b") == "a b")
    assert(c("a {| t \n| {{tpl}} cell\n|} b") == "a b")
    assert(c("a {{never closed...") == "a")
  }

  test("links: piped label, plain target, media dropped whole, nested captions") {
    assert(c("[[Target|label]]") == "label")
    assert(c("[[Plain]]") == "Plain")
    assert(c("x [[File:Pic.png|thumb|A [[nested]] caption]] y") == "x y")
    assert(c("x [[Image:I.jpg|cap]] y [[Category:Z]] z") == "x y z")
    assert(c("[[a|b|c]]") == "c")             // label = last pipe
    assert(c("see [[link") == "see")          // unterminated drops
  }

  test("external links, quotes, headings, bullets, refs, comments, tags") {
    assert(c("[https://x.org/1 ext label] tail") == "ext label tail")
    assert(c("'''''all''''' '''b''' ''i''") == "all b i")
    assert(c("== Head ==\nbody") == "Head body")
    assert(c("* one\n# two\n:; three") == "one two three")
    assert(c("a<ref name=\"r\">cite</ref> b<ref x/> c") == "a b c")
    assert(c("a <!-- hidden --> b <br/> c") == "a b c")
  }

  test("entities decode FIRST (dump wikitext arrives XML-escaped)") {
    assert(c("&lt;ref&gt;cite&lt;/ref&gt; kept &amp; sound") == "kept & sound")
    assert(c("A &#66; C") == "A B C")
  }
}

class XmlStageSpec extends SparkSpec {
  import graft.engine.Engine

  test("xml extractor through the engine: schema learning, gz shard, wikitext chain") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xml_spec").toString
    def page(id: Int, text: String) =
      s"<page><title>T$id</title><id>$id</id><text>$text</text></page>"
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.xml"),
      s"<mw>${page(1, "'''x''' [[A|a]]")}${page(2, "{{t}} plain")}</mw>".getBytes("UTF-8"))
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/b.xml.gz"))
    gz.write(s"<mw>${page(3, "z")}</mw>".getBytes("UTF-8")); gz.close()
    val out = Engine.runJson(newCtx(), s"""{
      "source": {"file": {"path": "$dir"}},
      "extractor": {"xml": {"rowTag": "page"}},
      "transformers": [{"wikitext": {}}],
      "loader": {"memory": {}} }""").orderBy("id")
    assert(out.columns.toSeq == Seq("title", "id", "text"))
    val rows = out.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("T1", "T2", "T3"))
    assert(rows.map(_.getString(2)).toSeq == Seq("x a", "plain", "z"))
  }
}
