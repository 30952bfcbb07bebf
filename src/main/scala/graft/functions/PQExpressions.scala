package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization (PQ) primitives for the IVF-PQ similarity path —
  * the encoding that makes ANN candidate exchanges carry BYTES instead
  * of vectors at 100-TB scale.
  *
  * A `dim`-dimensional unit vector splits into `m` contiguous subvectors
  * of `dim/m` elements; each subvector is replaced by the index of its
  * nearest (Euclidean) centroid from a per-subspace codebook of `kc`
  * entries. A vector becomes `m` code bytes (e.g. 64 floats → 8 bytes),
  * and the approximate inner product against a query is recovered by
  * table lookup (ADC): the query precomputes `lut[j*kc + c] =
  * dot(q_unit[sub_j], centroid(j,c))` once, and every candidate scores
  * with `m` array reads instead of `dim` multiply-adds.
  *
  * All three expressions normalize NOTHING themselves except the input
  * vector (to unit length, inside [[PQ.unitOf]]) — so ADC output is
  * directly an approximate COSINE, comparable across queries.
  *
  * The codebook rides in the expression as a constructor value (trained
  * driver-side, kc·dim doubles — a few KB), shipped with the serialized
  * plan and surfaced to generated code via `addReferenceObj`, the same
  * pattern Spark uses for literal arrays. Null vector → null result;
  * null ELEMENTS read as 0 (matching [[ArrayDot]]).
  */
case class PQEncode(child: Expression, codebook: Array[Double], m: Int, kc: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (codebook.length % (m * kc) == 0 && codebook.length > 0)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName codebook length ${codebook.length} is not m*kc*sub")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    PQ.encode(input.asInstanceOf[ArrayData], isFloat, codebook, m, kc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PQ.encode($c, $isFloat, $cb, $m, $kc)")
  }

  override protected def withNewChildInternal(newChild: Expression): PQEncode =
    copy(child = newChild)
}

/** ADC lookup table for one query vector: `lut[j*kc + c]` is the inner
  * product of the query's unit-normalized j-th subvector with centroid
  * `c` of subspace `j`. See [[PQEncode]]. */
case class PQLut(child: Expression, codebook: Array[Double], m: Int, kc: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (codebook.length % (m * kc) == 0 && codebook.length > 0)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName codebook length ${codebook.length} is not m*kc*sub")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    PQ.lut(input.asInstanceOf[ArrayData], isFloat, codebook, m, kc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PQ.lut($c, $isFloat, $cb, $m, $kc)")
  }

  override protected def withNewChildInternal(newChild: Expression): PQLut =
    copy(child = newChild)
}

/** Asymmetric-distance score: `sum_j lut[j*kc + codes[j]]` — the
  * approximate cosine between the LUT's query and the codes' vector.
  * `kc` is recovered from the operand lengths, so any (lut, codes) pair
  * produced by [[PQLut]]/[[PQEncode]] with the same codebook composes. */
case class PQAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(ByteType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double> lut, array<tinyint> codes), " +
        s"got ${l.simpleString} and ${r.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(a: Any, b: Any): Any =
    PQ.adc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.functions.PQ.adc($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PQAdc =
    copy(left = newLeft, right = newRight)
}

object PQ {

  /** Unit-normalize up to `dim` elements of `arr` into a double array
    * (null elements read 0; the zero vector stays zero). */
  private def unitOf(arr: ArrayData, isFloat: Boolean, dim: Int): Array[Double] = {
    val n = math.min(arr.numElements(), dim)
    val v = new Array[Double](dim)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        v(i) = x
        s += x * x
      }
      i += 1
    }
    if (s > 0.0) {
      val inv = 1.0 / math.sqrt(s)
      i = 0
      while (i < dim) { v(i) *= inv; i += 1 }
    }
    v
  }

  /** Nearest-centroid code per subspace of the unit-normalized vector.
    * Ties break to the LOWER centroid index (strict `<`). */
  def encode(arr: ArrayData, isFloat: Boolean, cb: Array[Double],
             m: Int, kc: Int): ArrayData = {
    val sub = cb.length / (m * kc)
    val v = unitOf(arr, isFloat, m * sub)
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val vOff = j * sub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < kc) {
        val cbOff = (j * kc + c) * sub
        var d = 0.0
        var t = 0
        while (t < sub) {
          val diff = v(vOff + t) - cb(cbOff + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Per-subspace inner-product lookup table of the unit-normalized
    * query against every centroid: `m*kc` doubles. */
  def lut(arr: ArrayData, isFloat: Boolean, cb: Array[Double],
          m: Int, kc: Int): ArrayData = {
    val sub = cb.length / (m * kc)
    val v = unitOf(arr, isFloat, m * sub)
    val out = new Array[Double](m * kc)
    var j = 0
    while (j < m) {
      val vOff = j * sub
      var c = 0
      while (c < kc) {
        val cbOff = (j * kc + c) * sub
        var d = 0.0
        var t = 0
        while (t < sub) { d += v(vOff + t) * cb(cbOff + t); t += 1 }
        out(j * kc + c) = d
        c += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def adc(lut: ArrayData, codes: ArrayData): Double = {
    val m = codes.numElements()
    if (m == 0) return 0.0
    val kc = lut.numElements() / m
    var s = 0.0
    var j = 0
    while (j < m) {
      s += lut.getDouble(j * kc + (codes.getByte(j) & 0xFF))
      j += 1
    }
    s
  }

  /** Driver-side PQ training: per-subspace EUCLIDEAN Lloyd's over the
    * unit-normalized sample (PQ quantizes raw subvectors, unlike the
    * spherical coarse codebook). Initial centroids = the first `kc`
    * sample subvectors; an emptied cell keeps its previous centroid;
    * assignment ties break to the lower index. Fully deterministic for
    * a given sample order. Returns the flat
    * `[(j*kc + c)*sub + t]`-indexed codebook.
    * Cost: O(iters · |sample| · kc · dim) driver arithmetic — bounded
    * by the caller's `trainRows` contract. */
  def train(sample: Array[Array[Double]], dim: Int, m: Int, kc: Int,
            iters: Int): Array[Double] = {
    require(dim % m == 0, s"pq: dim $dim not divisible by pqM $m")
    require(kc >= 2 && kc <= 256, s"pq: pqK $kc out of [2, 256]")
    val sub = dim / m
    def unit(v: Array[Double]): Array[Double] = {
      var s = 0.0; v.foreach(x => s += x * x)
      val n = math.sqrt(s)
      val out = java.util.Arrays.copyOf(v, dim)
      if (n > 0) { var i = 0; while (i < dim) { out(i) /= n; i += 1 } }
      out
    }
    val pts = sample.map(unit)
    val cb = new Array[Double](m * kc * sub)
    var j = 0
    while (j < m) {
      val vOff = j * sub
      // init: first kc subvectors (clamped when the sample is smaller)
      var c = 0
      while (c < kc) {
        val src = pts(math.min(c, pts.length - 1))
        System.arraycopy(src, vOff, cb, (j * kc + c) * sub, sub)
        c += 1
      }
      var it = 0
      while (it < iters) {
        val sums = Array.fill(kc)(new Array[Double](sub))
        val counts = new Array[Long](kc)
        pts.foreach { p =>
          var best = 0
          var bestD = Double.MaxValue
          var ci = 0
          while (ci < kc) {
            val off = (j * kc + ci) * sub
            var d = 0.0
            var t = 0
            while (t < sub) {
              val diff = p(vOff + t) - cb(off + t); d += diff * diff; t += 1
            }
            if (d < bestD) { bestD = d; best = ci }
            ci += 1
          }
          val acc = sums(best)
          var t = 0
          while (t < sub) { acc(t) += p(vOff + t); t += 1 }
          counts(best) += 1
        }
        var ci = 0
        while (ci < kc) {
          if (counts(ci) > 0) {
            val off = (j * kc + ci) * sub
            var t = 0
            while (t < sub) { cb(off + t) = sums(ci)(t) / counts(ci); t += 1 }
          }
          ci += 1
        }
        it += 1
      }
      j += 1
    }
    cb
  }
}
