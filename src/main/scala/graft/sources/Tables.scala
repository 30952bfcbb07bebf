package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StructType, TimestampNTZType, TimestampType}

/** Loader for the driver-generated testdata tables (TESTDATA.md) — and
  * the ONE authority for the `events.ts` time-encoding contract.
  *
  * The fixture's `ts` column has drifted across driver regenerations:
  *   - rounds 1–7: parquet TIMESTAMP(NANOS) int64 — Spark can't read
  *     nanos natively, so sessions set
  *     `spark.sql.legacy.parquet.nanosAsLong=true` and the column
  *     surfaces as a nano-epoch LONG;
  *   - round 8+: parquet `timestamp[us]` with no timezone — Spark reads
  *     it as `TimestampNTZType` (naive wall clock; the fixture's wall
  *     clock is UTC, which is how the DuckDB oracle reads it too).
  * It may drift again. Every consumer (batch shim, streaming schema,
  * temporal stages, code hooks) must derive from THIS file, never
  * hardcode an encoding: [[normalizeTs]] maps any of the three
  * encodings to a `TimestampType` micros column whose UTC rendering
  * equals the fixture's naive wall clock, and [[rawSchemaDDL]] exposes
  * the on-disk schema for streaming sources (which don't infer).
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Event-time columns subject to the encoding drift above. */
  private val tsCols: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  /** NTZ naive wall clock (UTC semantics) → `TimestampType` instant.
    * Session-timezone-safe: a bare `cast` interprets the naive value in
    * the session zone, so compose with `from_utc_timestamp` to cancel
    * the zone (identity when the session is UTC, as all engine sessions
    * are). */
  private def ntzAsUtcInstant(c: Column, spark: SparkSession): Column = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    if (tz == "UTC") c.cast(TimestampType)
    else from_utc_timestamp(c.cast(TimestampType), tz)
  }

  /** `TimestampType` instant → NTZ naive UTC wall clock (inverse of
    * [[ntzAsUtcInstant]], same session-zone cancellation). */
  def instantToNtz(c: Column, spark: SparkSession): Column = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    if (tz == "UTC") c.cast(TimestampNTZType)
    else to_utc_timestamp(c, tz).cast(TimestampNTZType)
  }

  /** Epoch micros (UTC) for a time column in ANY of the fixture's
    * encodings — the integral currency all temporal comparisons run in. */
  def epochMicrosOf(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c))
      case TimestampNTZType => unix_micros(ntzAsUtcInstant(col(c), df.sparkSession))
      // nano-epoch long (legacy nanosAsLong shim). Integral `div`, NOT
      // `/`: the fractional divide promotes the nano-long to double
      // first, and doubles space 256 ns apart at 2024-epoch magnitude —
      // micros came out off-by-one vs any engine that truncates exactly
      case LongType => expr(s"`$c` div 1000")
      case other => sys.error(
        s"events-ts contract: column '$c' has unsupported time encoding $other " +
        "(expected TIMESTAMP, TIMESTAMP_NTZ, or nano-epoch BIGINT)")
    }

  /** Normalize a drifting time column to `TimestampType` micros whose
    * UTC rendering equals the fixture's naive wall clock. Idempotent;
    * errors on a non-time encoding (LOUD beats a silently skewed
    * timeline — round 8 shipped 1000×-compressed sessions silently). */
  def normalizeTs(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case TimestampType => df
      case _ => df.withColumn(c, timestamp_micros(epochMicrosOf(df, c)))
    }

  /** On-disk schema of a fixture table (footer read, driver-side only) —
    * the streaming sources' single source of truth, replacing hand-
    * written DDL that round 8 proved rots when the fixture drifts. */
  def rawSchema(spark: SparkSession, sfDir: String, name: String): StructType =
    spark.read.parquet(s"$sfDir/$name.parquet").schema

  def rawSchemaDDL(spark: SparkSession, sfDir: String, name: String): String =
    rawSchema(spark, sfDir, name).toDDL

  /** Resolved on-disk encoding of `events.ts` (diagnostics / specs). */
  def eventsTsType(spark: SparkSession, sfDir: String): DataType =
    rawSchema(spark, sfDir, "events")("ts").dataType

  // `spark.read.parquet` reads the footer for the schema at plan-build
  // time (driver IO). The fixture tables are immutable per (session,
  // dir), so cache the built plans — Verify/Bench construct a fresh
  // EtlContext per query and would otherwise pay 10 footer reads × N
  // queries of pure driver latency. LRU-bounded at MaxSessions (a cached
  // Dataset strongly references its session, so a WeakHashMap keyed on
  // the session could never actually collect — an explicit bound is the
  // honest policy): plans of old sessions are evicted, not accumulated.
  private val MaxSessions = 8
  private val planCache = new java.util.LinkedHashMap[
      SparkSession, scala.collection.concurrent.TrieMap[(String, String), DataFrame]](
      16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[SparkSession,
          scala.collection.concurrent.TrieMap[(String, String), DataFrame]]): Boolean =
      size > MaxSessions
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val perSession = planCache.synchronized {
      var m = planCache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
        planCache.put(spark, m)
      }
      m
    }
    perSession.getOrElseUpdate(
      (sfDir, name), {
        val df = spark.read.parquet(s"$sfDir/$name.parquet")
        tsCols.getOrElse(name, Nil).foldLeft(df)(normalizeTs)
      })
  }
}
