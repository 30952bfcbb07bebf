package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding subword tokenizer — a REAL trained BPE (Sennrich
  * et al. 2016), not the regex approximation in `tokenize`: merges are
  * learned from corpus word frequencies (driver-side, bounded sample —
  * the kmeans/IVF training pattern) and applied per row by this
  * codegen'd expression with the merge table shipped in the plan.
  *
  * Symbol model: words split on whitespace; a word's initial symbols
  * are its Unicode code points plus a final end-of-word marker symbol
  * ([[Bpe.EOW]], a private-use code point that cannot collide with
  * fixture text). Merges apply in rank order (lowest rank first,
  * leftmost occurrence first within a pass) — byte-identical to the
  * reference implementation in [[Bpe.encodeWord]], which the driver
  * verdict + specs differentially check.
  *
  * Null text → null; empty/whitespace-only text → empty array.
  */
case class BpeEncode(child: Expression, merges: Array[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  override def nullSafeEval(input: Any): Any =
    Bpe.encodeToArrayData(input.asInstanceOf[UTF8String], merges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeMerges", merges, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Bpe.encodeToArrayData($c, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object Bpe {

  /** End-of-word marker symbol — U+E000 (private use area): no fixture
    * or crawl text legitimately contains it, so detokenization is the
    * exact inverse of encoding. */
  val EOW = "\uE000"

  /** Whitespace per Character.isWhitespace — matches the `tokenize`
    * stage's split. */
  private def words(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  /** A word's initial symbol sequence: code points + the EOW marker. */
  def baseSymbols(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length + 1)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out += EOW
    out.toArray
  }

  /** Greedy rank-ordered merge application: repeatedly merge the
    * adjacent pair with the LOWEST rank present in the sequence
    * (leftmost first within a pass) until no ranked pair remains —
    * the standard BPE inference loop. */
  def encodeWord(word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var syms = baseSymbols(word)
    if (ranks.isEmpty) return syms
    var done = false
    while (!done && syms.length > 1) {
      // find the lowest-rank adjacent pair
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        // merge EVERY occurrence of that pair, left to right
        val a = syms(bestIdx); val b = syms(bestIdx + 1)
        val merged = a + b
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += merged; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
      }
    }
    syms
  }

  // rank tables are built from the plan-shipped merge array once per
  // executor (identity-keyed: addReferenceObj ships one instance per
  // plan), not per row
  private val rankCache =
    java.util.Collections.synchronizedMap(
      new java.util.IdentityHashMap[Array[String], java.util.HashMap[String, Integer]]())

  def ranksOf(merges: Array[String]): java.util.HashMap[String, Integer] = {
    val got = rankCache.get(merges)
    if (got != null) got
    else {
      val m = new java.util.HashMap[String, Integer](merges.length * 2)
      var i = 0
      while (i < merges.length) { m.put(merges(i), Int.box(i)); i += 1 }
      rankCache.put(merges, m)
      m
    }
  }

  def encode(text: String, merges: Array[String]): Array[String] = {
    val ranks = ranksOf(merges)
    words(text).flatMap(w => encodeWord(w, ranks))
  }

  def encodeToArrayData(text: UTF8String, merges: Array[String]): GenericArrayData =
    new GenericArrayData(
      encode(text.toString, merges).map(UTF8String.fromString(_): Any))

  /** Exact inverse of [[encode]] up to whitespace normalization:
    * concatenating the tokens and turning each EOW marker into a single
    * space reproduces the word sequence. */
  def decode(tokens: Seq[String]): String =
    tokens.mkString("").replace(EOW, " ").trim

  /** Classic BPE training over (word, frequency) pairs: `numMerges`
    * rounds, each merging the most frequent adjacent symbol pair
    * across the weighted vocabulary — ties broken by the
    * lexicographically SMALLEST "a b" pair string, so training is
    * fully deterministic for a given word-frequency table. Stops early
    * when no pair occurs twice. Returns rank-ordered "a b" merge
    * strings. Cost: O(numMerges · Σ word lengths) driver arithmetic —
    * bounded by the caller's sample contract. */
  def train(wordFreqs: Seq[(String, Long)], numMerges: Int): Array[String] = {
    var vocab: Array[(Array[String], Long)] =
      wordFreqs.map { case (w, f) => (baseSymbols(w), f) }.toArray
    val out = new scala.collection.mutable.ArrayBuffer[String](numMerges)
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val counts = new java.util.HashMap[String, Long]()
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = syms(i) + " " + syms(i + 1)
          counts.put(k, counts.getOrDefault(k, 0L) + f)
          i += 1
        }
      }
      var bestPair: String = null
      var bestCount = 1L // a pair must occur at least twice to merge
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue > bestCount ||
            (e.getValue == bestCount && bestPair != null && e.getKey < bestPair)) {
          bestCount = e.getValue; bestPair = e.getKey
        }
      }
      if (bestPair == null) exhausted = true
      else {
        out += bestPair
        val sp = bestPair.indexOf(' ')
        val a = bestPair.substring(0, sp); val b = bestPair.substring(sp + 1)
        val merged = a + b
        vocab = vocab.map { case (syms, f) =>
          if (syms.length < 2) (syms, f)
          else {
            val res = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                res += merged; j += 2
              } else { res += syms(j); j += 1 }
            }
            (res.toArray, f)
          }
        }
        round += 1
      }
    }
    out.toArray
  }
}
