package graft.split

import graft.engine.EtlContext
import graft.spec.ComponentSpec
import graft.stages.Stages
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-management stages for training pipelines: deterministic,
  * key-stable train/val/test splitting and hash sampling. A row's split
  * depends only on (key, salt) — never on partitioning, row order, or
  * cluster size — so splits are reproducible across runs and engines,
  * and adding data never moves existing rows between splits. The
  * assignment is a pure per-row projection (md5 bucket), no shuffle.
  */
object SplitStages {

  private val Buckets = 10000

  /** md5-derived bucket in [0, 10000): first 6 hex digits → int mod 1e4.
    * Matches the DuckDB expression
    * `('0x' || substr(md5(key || salt), 1, 6))::BIGINT % 10000`. */
  private def bucket(key: org.apache.spark.sql.Column, salt: String) =
    conv(substring(md5(concat(key.cast("string"), lit(salt)).cast("binary")), 1, 6),
      16, 10).cast("bigint") % Buckets

  /** `datasplit`: assign each row a split label from `splits`
    * (ordered list of `{name, fraction}`) by hashing `keyField` (or
    * `keyExpr`) with optional `salt`. Fractions are cut on the bucket
    * space in declared order; the last split absorbs rounding
    * remainder. Output column: `split` (configurable via
    * `outputField`). */
  def datasplit(spec: ComponentSpec, ctx: EtlContext): DataFrame => DataFrame =
    Stages.common(spec, ctx) { df =>
      val key = spec.str("keyExpr") match {
        case Some(e) => expr(e)
        case None => col(spec.strOr("keyField", "doc_id"))
      }
      val salt = spec.strOr("salt", "")
      val splits = spec.list("splits").map {
        case m: Map[_, _] =>
          val mm = m.asInstanceOf[Map[String, Any]]
          (mm.getOrElse("name", sys.error("datasplit: split name required")).toString,
           mm.getOrElse("fraction", sys.error("datasplit: split fraction required"))
             .toString.toDouble)
        case other => sys.error(s"datasplit: split entry must be a map, got $other")
      }
      require(splits.nonEmpty, "datasplit: splits required")
      require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
        s"datasplit: fractions must sum to 1, got ${splits.map(_._2).sum}")
      val b = bucket(key, salt)
      // cumulative thresholds over the bucket space, declared order
      val thresholds = splits.scanLeft(0L) { case (acc, (_, f)) =>
        acc + math.round(f * Buckets)
      }.tail
      val labeled = splits.map(_._1).zip(thresholds).dropRight(1)
        .foldRight(lit(splits.last._1)) { case ((name, t), els) =>
          when(b < t, lit(name)).otherwise(els)
        }
      df.withColumn(spec.strOr("outputField", "split"), labeled)
    }

  /** `pack`: contiguous token-budget packing — assign each document a
    * `chunk_id` so that consecutive documents (in `orderField` order)
    * accumulate into chunks of at most ~`budget` tokens:
    * `chunk_id = floor(exclusive_prefix_sum(tokens) / budget)` — the
    * standard streaming pack used to fill training context windows.
    *
    * Scale shape: a GLOBAL ordered prefix sum, done in two phases so it
    * never funnels the data through one task (a bare
    * `Window.orderBy(...)` without partitions would): range-partition
    * on the order key, windowed prefix sum WITHIN each partition, then
    * add per-partition base offsets. The offsets are one tiny
    * driver-side aggregation (numPartitions rows) — the classic
    * distributed scan pattern. Output columns: `chunk_id`,
    * `chunk_offset` (the doc's exclusive token offset within its chunk).
    */
  def pack(spec: ComponentSpec, ctx: EtlContext): DataFrame => DataFrame =
    Stages.common(spec, ctx) { df =>
      import org.apache.spark.sql.expressions.Window
      val orderField = spec.strOr("orderField", "doc_id")
      val tokenField = spec.strOr("tokenField", "n_tokens")
      val budget = spec.long("budget").getOrElse(sys.error("pack: budget required"))
      require(budget > 0, "pack: budget must be positive")
      val nPart = spec.int("partitions",
        math.max(df.sparkSession.sparkContext.defaultParallelism, 1))

      // materialize the range partitioning ONCE (localCheckpoint):
      // phase 1's offsets and phase 2's window must see the SAME
      // partition boundaries, but RangePartitioner re-SAMPLES on every
      // execution — an un-checkpointed plan executes twice (offsets
      // collect + output job) and can land rows in different partitions
      // than the offsets describe (caught by the sf0.1 self-check)
      val parts = df.repartitionByRange(nPart, col(orderField))
        .withColumn("__pid", spark_partition_id())
        .localCheckpoint(true)
      // phase 1: per-partition token totals → base offsets (driver-side:
      // numPartitions rows, not data rows)
      val totals = parts.groupBy("__pid")
        .agg(sum(col(tokenField).cast("long")).as("__t"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val maxPid = if (totals.isEmpty) -1 else totals.keys.max
      val offsets = (0 to maxPid).scanLeft(0L)((acc, pid) =>
        acc + totals.getOrElse(pid, 0L))
      val offsetExpr = offsets.zipWithIndex.dropRight(1)
        .foldLeft(lit(0L)) { case (els, (off, pid)) =>
          when(col("__pid") === pid, lit(off)).otherwise(els)
        }
      // phase 2: exclusive prefix sum within each range partition + base
      val w = Window.partitionBy("__pid").orderBy(orderField)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cumBefore =
        (sum(col(tokenField).cast("long")).over(w) - col(tokenField).cast("long")) +
          offsetExpr
      parts
        .withColumn("__cum", cumBefore)
        .withColumn("chunk_id", floor(col("__cum") / budget))
        .withColumn("chunk_offset", col("__cum") % budget)
        .drop("__pid", "__cum")
    }

  /** `hashsample`: keep a deterministic `fraction` of rows by the same
    * md5 bucket — the reproducible alternative to `TABLESAMPLE`/rand().
    * Options: `keyField`/`keyExpr`, `fraction` (required), `salt`. */
  def hashsample(spec: ComponentSpec, ctx: EtlContext): DataFrame => DataFrame =
    Stages.common(spec, ctx) { df =>
      val key = spec.str("keyExpr") match {
        case Some(e) => expr(e)
        case None => col(spec.strOr("keyField", "doc_id"))
      }
      val frac = spec.str("fraction")
        .getOrElse(sys.error("hashsample: fraction required")).toDouble
      require(frac > 0 && frac <= 1, s"hashsample: fraction in (0,1], got $frac")
      df.where(bucket(key, spec.strOr("salt", "")) < math.round(frac * Buckets))
    }
}
