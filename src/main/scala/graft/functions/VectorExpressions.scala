package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expression for the similarity hot path.
  *
  * `aggregate(zip_with(a, b, multiply), 0d, plus)` is semantically right
  * but the lambda machinery is interpreted per element — at millions of
  * candidate pairs × 64+ dims it dominates the similarity operators'
  * runtime. This expression computes the dot product in ONE tight
  * primitive loop, with `doGenCode` so it stays inside whole-stage
  * codegen (builder brief: custom Expression only where the built-ins
  * genuinely can't express the semantics *efficiently*).
  *
  * Null handling: a null array → null result; null ELEMENTS are skipped
  * (contribute 0), matching the HOF form with a coalesce guard.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_array_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    val (lf, rf) = (elemType(left) == FloatType, elemType(right) == FloatType)
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        sum += xv * yv
      }
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      def get(arr: String, t: DataType) = t match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _ => s"$arr.getDouble($i)"
      }
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $sum += ${get(a, elemType(left))} * ${get(b, elemType(right))};
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Native word-n-gram shingle hashing for MinHash/Jaccard: tokenizes on
  * whitespace and emits the DISTINCT xxhash64 (seed 42, Spark's default)
  * of each n-token shingle joined by single spaces — byte-identical to
  * `transform(wordShingles(text, n), s -> xxhash64(s))` (asserted in
  * specs), but one tight loop instead of per-position interpreted
  * `slice`+`concat_ws` lambdas. Texts shorter than n tokens hash the
  * whole token sequence (same fallback as wordShingles).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input and n >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val hashes = ShingleHashes.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(hashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.functions.ShingleHashes.compute($c, $n))")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private val Seed = 42L // xxhash64's default seed in Spark

  /** One-pass tokenize + shingle + hash. Whitespace = Java regex \s
    * (space, \t, \n, \x0B, \f, \r) to match `split(trim(s), "\s+")`. */
  def compute(str: org.apache.spark.unsafe.types.UTF8String, n: Int): Array[Long] = {
    val bytes = str.getBytes
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
    // token [start, end) offsets
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    while (i < bytes.length) {
      while (i < bytes.length && isWs(bytes(i))) i += 1
      if (i < bytes.length) {
        starts.add(i)
        while (i < bytes.length && !isWs(bytes(i))) i += 1
        ends.add(i)
      }
    }
    val nTok = starts.size()
    val width = if (nTok < n) math.max(nTok, 1) else n
    val nShingles = if (nTok <= width) 1 else nTok - width + 1
    val buf = new Array[Byte](bytes.length + width) // large enough for any shingle
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](nShingles)
    var outLen = 0
    var s = 0
    while (s < nShingles) {
      var len = 0
      var t = 0
      while (t < width && s + t < nTok) {
        if (t > 0) { buf(len) = ' '; len += 1 }
        val from = starts.get(s + t); val to = ends.get(s + t)
        System.arraycopy(bytes, from, buf, len, to - from)
        len += to - from
        t += 1
      }
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, Seed)
      if (seen.add(h)) { out(outLen) = h; outLen += 1 }
      s += 1
    }
    if (outLen == out.length) out else java.util.Arrays.copyOf(out, outLen)
  }
}

object VectorExpressions {
  private val registered =
    java.util.Collections.synchronizedSet(new java.util.HashSet[Int]())

  /** Register the native functions in the session's function registry
    * (idempotent per session) — the supported path for using a custom
    * Expression from the Column DSL. */
  def ensure(spark: SparkSession): Unit =
    if (registered.add(System.identityHashCode(spark.sessionState))) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_array_dot",
        (exprs: Seq[Expression]) => ArrayDot(exprs.head, exprs(1)),
        "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_shingle_hashes",
        (exprs: Seq[Expression]) => {
          val n = exprs(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
            case other => sys.error(s"graft_shingle_hashes: n must be an int literal, got $other")
          }
          ShingleHashes(exprs.head, n)
        },
        "built-in")
    }

  /** Native dot product of two float/double array columns. */
  def arrayDot(a: Column, b: Column): Column =
    call_function("graft_array_dot", a, b)

  /** Native distinct word-n-gram shingle hashes of a string column. */
  def shingleHashes(text: Column, n: Int): Column =
    call_function("graft_shingle_hashes", text,
      org.apache.spark.sql.functions.lit(n))
}
