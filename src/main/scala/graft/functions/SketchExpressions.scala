package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable sketch aggregates (Apache DataSketches, already on the
  * Spark classpath): KLL quantile sketches and Misra–Gries-family
  * frequent-items sketches. These are the 100-TB re-aggregation
  * spelling of quantiles and heavy-hitters: compute a small binary per
  * FINE grain once (per day / per shard), then union to ANY coarser
  * grain without rescanning the raw table — exactly what exact
  * `percentile` / `count group-by-item top-k` cannot do. The pair
  * completes the shipped hllsketch/hllmerge distinct-count rollup
  * (stages/StatStages.scala).
  *
  * Determinism contract (matters for the driver oracle): KLL compaction
  * draws random offsets, and a frequent-items sketch's ESTIMATES depend
  * on merge order — so queries must gate these through error-BOUND
  * verdicts (the hll_rollup recipe), never hash-exact estimate values.
  * The BOUNDS are sound regardless of order: KLL rank error ≤
  * getNormalizedRankError at 99 % confidence; frequent-items
  * NO_FALSE_NEGATIVES returns every item whose true count exceeds the
  * sketch's error threshold, with lb ≤ true ≤ ub deterministic
  * guarantees.
  */
object KllOps {
  def empty(k: Int): KllDoublesSketch = KllDoublesSketch.newHeapInstance(k)
  def fromBytes(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** `graft_kll_agg(value, k)`: per-group KLL quantile sketch of a double
  * column → binary. ObjectHashAggregate with map-side partials: each
  * task reduces its slice to one ~3 KB sketch before the exchange. */
case class KllAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"graft_kll_agg: k must be in [8, 65535], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input (cast upstream), got ${t.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_agg"

  override def createAggregationBuffer(): KllDoublesSketch = KllOps.empty(k)
  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }
  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }
  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = KllOps.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllAgg = copy(child = newChildren.head)
}

/** `graft_kll_merge(sketch)`: union previously-built KLL sketch binaries
  * to a coarser grain → merged binary. The buffer adopts the FIRST
  * input sketch's k (merging into a fresh lower-k buffer would silently
  * degrade accuracy), so a merge of k=400 shard sketches stays k=400. */
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllMergeAgg.Holder] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary KLL sketch column, got ${t.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_merge"

  override def createAggregationBuffer(): KllMergeAgg.Holder = new KllMergeAgg.Holder
  override def update(buf: KllMergeAgg.Holder, input: InternalRow): KllMergeAgg.Holder = {
    val v = child.eval(input)
    if (v != null) buf.absorb(KllOps.fromBytes(v.asInstanceOf[Array[Byte]]))
    buf
  }
  override def merge(buf: KllMergeAgg.Holder, other: KllMergeAgg.Holder): KllMergeAgg.Holder = {
    other.sketch.foreach(buf.absorb)
    buf
  }
  override def eval(buf: KllMergeAgg.Holder): Any =
    buf.sketch.getOrElse(KllOps.empty(200)).toByteArray
  override def serialize(buf: KllMergeAgg.Holder): Array[Byte] =
    buf.sketch.map(_.toByteArray).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): KllMergeAgg.Holder = {
    val h = new KllMergeAgg.Holder
    if (bytes.nonEmpty) h.absorb(KllOps.fromBytes(bytes))
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg = copy(child = newChildren.head)
}

object KllMergeAgg {
  /** First absorbed sketch becomes the buffer (keeps its k). */
  final class Holder {
    var sketch: Option[KllDoublesSketch] = None
    def absorb(s: KllDoublesSketch): Unit = sketch match {
      case None => sketch = Some(s)
      case Some(b) => b.merge(s)
    }
  }
}

/** `graft_kll_quantile(sketch, p)`: the INCLUSIVE-rank quantile estimate
  * of a KLL sketch binary; null for an empty sketch. Post-aggregate
  * projection over merged rows — CodegenFallback is off the hot path. */
case class KllQuantile(child: Expression, p: Double)
    extends UnaryExpression with CodegenFallback {
  require(p >= 0 && p <= 1, s"graft_kll_quantile: p must be in [0, 1], got $p")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary KLL sketch, got ${t.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kll_quantile"
  override def nullSafeEval(input: Any): Any = {
    val s = KllOps.fromBytes(input.asInstanceOf[Array[Byte]])
    if (s.isEmpty) null else s.getQuantile(p)
  }
  override protected def withNewChildInternal(newChild: Expression): KllQuantile =
    copy(child = newChild)
}

/** `graft_kll_n(sketch)`: the total update count a KLL sketch has
  * absorbed (exact — the stream length, not an estimate). */
case class KllN(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary KLL sketch, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_n"
  override def nullSafeEval(input: Any): Any =
    KllOps.fromBytes(input.asInstanceOf[Array[Byte]]).getN
  override protected def withNewChildInternal(newChild: Expression): KllN =
    copy(child = newChild)
}

object FreqOps {
  private val serDe = new ArrayOfStringsSerDe
  def empty(maxMapSize: Int): ItemsSketch[String] = new ItemsSketch[String](maxMapSize)
  def toBytes(s: ItemsSketch[String]): Array[Byte] = s.toByteArray(serDe)
  def fromBytes(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serDe)
}

/** `graft_freq_agg(item, weight, maxMapSize)`: per-group frequent-items
  * sketch (Misra–Gries family) of a string column → binary. Map-side
  * partials bound every task's state to `maxMapSize` counters. */
case class FreqAgg(
    item: Expression,
    weight: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"graft_freq_agg: maxMapSize must be a power of two >= 8, got $maxMapSize")

  override def children: Seq[Expression] = Seq(item, weight)
  override def checkInputDataTypes(): TypeCheckResult =
    if (item.dataType == StringType && weight.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string item, long weight), got " +
        s"${item.dataType.simpleString}, ${weight.dataType.simpleString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_agg"

  override def createAggregationBuffer(): ItemsSketch[String] = FreqOps.empty(maxMapSize)
  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val i = item.eval(input)
    val w = weight.eval(input)
    if (i != null && w != null) {
      val wl = w.asInstanceOf[Long]
      if (wl > 0) buf.update(i.asInstanceOf[UTF8String].toString, wl)
    }
    buf
  }
  override def merge(buf: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
    buf.merge(other); buf
  }
  override def eval(buf: ItemsSketch[String]): Any = FreqOps.toBytes(buf)
  override def serialize(buf: ItemsSketch[String]): Array[Byte] = FreqOps.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] = FreqOps.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqAgg =
    copy(item = newChildren(0), weight = newChildren(1))
}

/** `graft_freq_merge(sketch, maxMapSize)`: union frequent-items sketch
  * binaries to a coarser grain → merged binary. */
case class FreqMergeAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"graft_freq_merge: maxMapSize must be a power of two >= 8, got $maxMapSize")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary frequent-items sketch, got ${t.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_merge"

  override def createAggregationBuffer(): ItemsSketch[String] = FreqOps.empty(maxMapSize)
  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.merge(FreqOps.fromBytes(v.asInstanceOf[Array[Byte]]))
    buf
  }
  override def merge(buf: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
    buf.merge(other); buf
  }
  override def eval(buf: ItemsSketch[String]): Any = FreqOps.toBytes(buf)
  override def serialize(buf: ItemsSketch[String]): Array[Byte] = FreqOps.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] = FreqOps.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqMergeAgg = copy(child = newChildren.head)
}

/** `graft_freq_items(sketch, k)`: the NO_FALSE_NEGATIVES frequent items
  * of a sketch binary as `array<struct<item, est, lb, ub>>`, ordered
  * (est DESC, item ASC — the item tie-break keeps the OUTPUT order
  * deterministic even though est values are merge-order-dependent);
  * k > 0 truncates, k = 0 returns all. NO_FALSE_NEGATIVES is the sound
  * direction for curation: every truly-frequent item is present. */
case class FreqItems(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 0, s"graft_freq_items: k must be >= 0, got $k")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary frequent-items sketch, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false),
      StructField("lb", LongType, nullable = false),
      StructField("ub", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_items"
  override def nullSafeEval(input: Any): Any = {
    val s = FreqOps.fromBytes(input.asInstanceOf[Array[Byte]])
    val rows = s.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    val sorted = rows.sortBy(r => (-r.getEstimate, r.getItem))
    val take = if (k == 0) sorted else sorted.take(k)
    new GenericArrayData(take.map { r =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(r.getItem), r.getEstimate, r.getLowerBound, r.getUpperBound))
    })
  }
  override protected def withNewChildInternal(newChild: Expression): FreqItems =
    copy(child = newChild)
}
