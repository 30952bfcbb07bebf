package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loader for the driver-generated testdata tables (TESTDATA.md).
  *
  * The `events` table carries a parquet TIMESTAMP(NANOS) column, which
  * Spark cannot read natively (max precision = micros). Sessions set
  * `spark.sql.legacy.parquet.nanosAsLong=true`; this loader converts the
  * resulting nano-epoch long back to a micros timestamp, losslessly for
  * the fixture data (micro-precision values). All table access in
  * queries/benches goes through here so the shim lives in one place.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Columns that are TIMESTAMP(NANOS) in the fixture parquet. */
  private val nanosCols: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

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
        nanosCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
          if (d.schema(c).dataType == LongType)
            // integral `div`, NOT `/`: the fractional divide promotes the
            // nano-long to double first, and doubles space 256 ns apart at
            // 2024-epoch magnitude — micros came out off-by-one vs any
            // engine that truncates exactly (caught by the asof_join
            // raw-micros oracle; hour-bucketed queries never noticed)
            d.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
          else d
        }
      })
  }
}
