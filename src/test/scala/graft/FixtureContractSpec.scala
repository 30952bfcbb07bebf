package graft

import graft.sources.Tables
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Sentinel for driver-side fixture drift. The testdata regenerates
  * between rounds without notice (round 8: events.ts TIMESTAMP(NANOS)
  * int64 → timestamp[us] NTZ, which crashed four temporal queries and
  * silently corrupted two streaming ones). This spec pins the CONTRACT
  * the engine relies on — table presence, column names, and the
  * normalized events timeline — so the next drift fails here with a
  * named cause, not downstream in six query oracles.
  */
class FixtureContractSpec extends SparkSpec {

  private val expectedCols = Map(
    "region" -> Seq("r_regionkey", "r_name"),
    "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"),
    "events" -> Seq("event_id", "ts", "user_id", "event_type", "value",
      "props"),
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  test("all 10 fixture tables exist with the column names the queries use") {
    Tables.names.foreach { t =>
      val cols = Tables.load(spark, sfDir, t).columns.toSeq
      assert(cols == expectedCols(t),
        s"fixture drift in '$t': on-disk columns $cols != expected " +
        s"${expectedCols(t)} — audit every query touching it")
    }
  }

  test("events.ts: on-disk encoding is a covered one and normalizes to TimestampType") {
    val onDisk = Tables.eventsTsType(spark, sfDir)
    assert(Set[org.apache.spark.sql.types.DataType](
      TimestampType, TimestampNTZType,
      org.apache.spark.sql.types.LongType).contains(onDisk),
      s"events.ts drifted to UNCOVERED encoding $onDisk — extend " +
      "sources.Tables.epochMicrosOf (the one authority) first")
    val loaded = Tables.load(spark, sfDir, "events")
    assert(loaded.schema("ts").dataType == TimestampType,
      "Tables.load must hand every consumer a TimestampType timeline")
    // the 2024-era fixture timeline: a wildly-off epoch means a unit bug
    // (the r8 failure mode was a silently 1000×-compressed timeline)
    val bounds = loaded.selectExpr("min(unix_micros(ts))", "max(unix_micros(ts))")
      .collect()(0)
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val y2k = 946684800000000L  // 2000-01-01 in epoch micros
    val y2100 = 4102444800000000L
    assert(lo > y2k && hi < y2100,
      s"events timeline [$lo, $hi] µs is outside (2000, 2100) — unit " +
      "mis-scaling in the ts normalization (nanos/micros/millis mix-up)")
  }

  test("streaming schema DDL derives from the footer and round-trips") {
    val ddl = Tables.rawSchemaDDL(spark, sfDir, "events")
    val parsed = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    assert(parsed.fieldNames.toSeq == expectedCols("events"), ddl)
  }
}
