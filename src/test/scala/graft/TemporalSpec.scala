package graft

import graft.spec.ComponentSpec
import graft.temporal.TemporalStages
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** As-of and range (interval) joins — semantics on hand-built frames
  * where every expected row is enumerable: inclusive vs strict time
  * matching, tolerance cut-off, row-atomic attachment (a null value in
  * the matched row must NOT fall through to an older row), left-outer
  * nulls, interval bounds, the keyless bin path, and the maxBins
  * contract. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  // numeric (epoch-seconds) time columns: the stages accept numeric or
  // timestamp; numerics keep expected values exactly enumerable
  private def left(): DataFrame =
    Seq((1L, "k1", 10.0), (2L, "k1", 20.0), (3L, "k1", 25.0), (4L, "k2", 15.0))
      .toDF("eid", "k", "t")

  private def asof(df: DataFrame, right: DataFrame, opts: (String, Any)*): DataFrame = {
    val ctx = newCtx()
    right.createOrReplaceTempView("asof_right")
    TemporalStages.asofJoin(ComponentSpec("asofjoin",
      Map("right" -> "asof_right", "on" -> "k", "leftTime" -> "t") ++ opts.toMap),
      ctx)(df)
  }

  test("asofjoin: inclusive picks at-or-before; strict excludes the instant") {
    val right = Seq(("k1", 10.0, "r10"), ("k1", 20.0, "r20"), ("k2", 99.0, "r99"))
      .toDF("k", "t", "v")
    val inc = asof(left(), right).orderBy("eid")
      .select("eid", "v").as[(Long, Option[String])].collect().toSeq
    assert(inc == Seq((1L, Some("r10")), (2L, Some("r20")), (3L, Some("r20")),
      (4L, None)))
    val strict = asof(left(), right, "strict" -> true).orderBy("eid")
      .select("eid", "v").as[(Long, Option[String])].collect().toSeq
    assert(strict == Seq((1L, None), (2L, Some("r10")), (3L, Some("r20")),
      (4L, None)))
  }

  test("asofjoin: tolerance discards stale matches; matchedTimeField emitted") {
    val right = Seq(("k1", 10.0, "r10")).toDF("k", "t", "v")
    val out = asof(left(), right, "tolerance" -> 5, "matchedTimeField" -> "mt")
      .orderBy("eid")
      .select("eid", "v", "mt").as[(Long, Option[String], Option[Double])]
      .collect().toSeq
    // eid1 at t=10 (lag 0) and eid2 at t=20 would match r10 (lag 10) —
    // only lag <= 5 survives
    assert(out == Seq((1L, Some("r10"), Some(10.0)), (2L, None, None),
      (3L, None, None), (4L, None, None)))
  }

  test("asofjoin: a null VALUE in the newest right row does not fall through") {
    val right = Seq(("k1", 5.0, Some("old")), ("k1", 15.0, None))
      .toDF("k", "t", "v")
    val out = asof(left(), right).orderBy("eid")
      .select("eid", "v").as[(Long, Option[String])].collect().toSeq
    // eid2/eid3 (t=20/25): newest right row is t=15 whose v IS null —
    // row-atomic semantics must yield null, not "old"
    assert(out == Seq((1L, Some("old")), (2L, None), (3L, None), (4L, None)))
  }

  test("asofjoin: null-TIME right rows are never adopted as a match") {
    // a right row with a null time sorts into the nulls-first prefix of
    // BOTH scan directions — without the rPart filter it would be
    // adopted as the fill match for the extreme left row (null matched
    // time, real value). All three directions must ignore it.
    val right = Seq(("k1", Option(5.0), "real"), ("k1", Option.empty[Double], "ghost"))
      .toDF("k", "t", "v")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val out = asof(left(), right, "direction" -> dir).orderBy("eid")
        .select("eid", "v").as[(Long, Option[String])].collect().toSeq
      assert(out.forall(_._2 forall (_ != "ghost")), s"$dir: $out")
    }
  }

  test("asofjoin: null keys never match (equi-join semantics)") {
    val points = Seq((1L, Option("k1"), 10.0), (2L, Option.empty[String], 10.0))
      .toDF("eid", "k", "t")
    val right = Seq((Option("k1"), 5.0, "r5"), (Option.empty[String], 5.0, "rnull"))
      .toDF("k", "t", "v")
    val out = asof(points, right).orderBy("eid")
      .select("eid", "v").as[(Long, Option[String])].collect().toSeq
    // the null-key left row must NOT be filled from the null-key right
    // row (the window would otherwise group them together)
    assert(out == Seq((1L, Some("r5")), (2L, None)))
  }

  test("asofjoin: collision and missing-column errors name the problem") {
    val right = Seq(("k1", 5.0, 1.0)).toDF("k", "t", "eid")
    val e = intercept[Exception] { asof(left(), right).collect() }
    assert(e.getMessage.contains("collide"))
    val e2 = intercept[Exception] {
      asof(left(), Seq(("k1", 1.0)).toDF("k", "t"), "select" -> Seq("nope")).collect()
    }
    assert(e2.getMessage.contains("nope"))
  }

  test("sessionize batch: gap splits sessions; every session emits") {
    // key a: events at 0, 10, 100, 105 s with gap 50 s → two sessions;
    // key b: single event → one singleton session
    val df = Seq(("a", 0.0), ("a", 10.0), ("a", 100.0), ("a", 105.0),
      ("b", 7.0)).toDF("user_id", "t")
    val ctx = newCtx()
    val out = TemporalStages.sessionizeBatch(ComponentSpec("sessionize",
      Map("keyField" -> "user_id", "tsField" -> "t", "gapMs" -> 50000)),
      ctx)(df)
      .orderBy("key", "session_start")
      .as[(String, Double, Double, Long)].collect().toSeq
    assert(out == Seq(("a", 0.0, 10.0, 2L), ("a", 100.0, 105.0, 2L),
      ("b", 7.0, 7.0, 1L)))
  }

  test("rolling: inclusive [t-w, t] per-key frame; count and sum") {
    val df = Seq(("a", 0.0, 1L), ("a", 5.0, 10L), ("a", 10.0, 100L),
      ("a", 30.0, 1000L), ("b", 10.0, 7L)).toDF("user_id", "t", "v")
    val ctx = newCtx()
    val out = TemporalStages.rolling(ComponentSpec("rolling",
      Map("keyField" -> "user_id", "tsField" -> "t", "window" -> 10,
        "aggs" -> Seq("count", "sum:v"))), ctx)(df)
      .orderBy("user_id", "t")
      .select("user_id", "t", "rolling_n", "rolling_sum_v")
      .as[(String, Double, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("a", 0.0, 1L, 1L),       // only itself
      ("a", 5.0, 2L, 11L),      // 0 and 5
      ("a", 10.0, 3L, 111L),    // 0 (inclusive lower bound), 5, 10
      ("a", 30.0, 1L, 1000L),   // window passed
      ("b", 10.0, 1L, 7L)))     // keys isolated
  }

  private def range(points: DataFrame, intervals: DataFrame,
                    opts: (String, Any)*): DataFrame = {
    val ctx = newCtx()
    intervals.createOrReplaceTempView("range_right")
    TemporalStages.rangeJoin(ComponentSpec("rangejoin",
      Map("right" -> "range_right", "leftTime" -> "t") ++ opts.toMap),
      ctx)(points)
  }

  test("rangejoin: keyless bin path — exact [start,end) containment, once per pair") {
    val points = Seq((1L, 5.0), (2L, 10.0), (3L, 19.999999), (4L, 20.0))
      .toDF("pid", "t")
    val intervals = Seq(("w1", 10.0, 20.0), ("w2", 0.0, 6.0)).toDF("w", "start", "end")
    val out = range(points, intervals, "binWidth" -> 2)
      .select("pid", "w").as[(Long, String)].collect().toSeq.sorted
    // end-exclusive: t=20.0 matches nothing; t=10.0 matches w1's start
    assert(out == Seq((1L, "w2"), (2L, "w1"), (3L, "w1")))
    val incl = range(points, intervals, "binWidth" -> 2, "endInclusive" -> true)
      .select("pid", "w").as[(Long, String)].collect().toSeq.sorted
    assert(incl == Seq((1L, "w2"), (2L, "w1"), (3L, "w1"), (4L, "w1")))
  }

  test("rangejoin: keyed path joins on key + range without binWidth") {
    val points = Seq((1L, "a", 5.0), (2L, "b", 5.0)).toDF("pid", "k", "t")
    val intervals = Seq(("a", 0.0, 10.0, "wa"), ("b", 6.0, 10.0, "wb"))
      .toDF("k", "start", "end", "w")
    val out = range(points, intervals, "on" -> "k")
      .select("pid", "w").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "wa"))) // pid2's key-b interval starts after t
  }

  test("rangejoin: keyless without binWidth is rejected; maxBins fails loud") {
    val points = Seq((1L, 5.0)).toDF("pid", "t")
    val intervals = Seq(("w", 0.0, 10.0)).toDF("w", "start", "end")
    val e = intercept[Exception] { range(points, intervals).collect() }
    assert(e.getMessage.contains("binWidth"))
    val e2 = intercept[Exception] {
      range(points, intervals, "binWidth" -> 1, "maxBins" -> 5).collect()
    }
    // raise_error surfaces wrapped in task-failure exceptions — scan the chain
    val msgs = Iterator.iterate[Throwable](e2)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("maxBins"))
  }

  private def ivj(left: DataFrame, right: DataFrame,
                  opts: (String, Any)*): DataFrame = {
    val ctx = newCtx()
    right.createOrReplaceTempView("ivj_right")
    TemporalStages.intervalJoin(ComponentSpec("intervaljoin",
      Map("right" -> "ivj_right", "leftStart" -> "ls", "leftEnd" -> "le",
        "rightStart" -> "rs", "rightEnd" -> "re") ++ opts.toMap),
      ctx)(left)
  }

  test("intervaljoin: binned overlap — once per pair, half-open vs closed ends") {
    val left = Seq((1L, 0.0, 10.0), (2L, 20.0, 30.0), (3L, 45.0, 50.0))
      .toDF("lid", "ls", "le")
    val right = Seq(("a", 5.0, 25.0), ("b", 30.0, 40.0), ("c", 9.999999, 20.0))
      .toDF("rid", "rs", "re")
    // binWidth much smaller than spans: pairs share MANY bins — each
    // must still surface exactly once (the canonical-bin rule)
    val out = ivj(left, right, "binWidth" -> 2)
      .select("lid", "rid").as[(Long, String)].collect().toSeq.sorted
    // 1×a (5<10), 2×a (20<25), 1×c (9.999999<10); [20,30)×[30,40) NOT
    // overlapping half-open; 2×c touches only at 20 (rs<le but ls<re:
    // 20<20 false)
    assert(out == Seq((1L, "a"), (1L, "c"), (2L, "a")))
    val incl = ivj(left, right, "binWidth" -> 2, "endInclusive" -> true)
      .select("lid", "rid").as[(Long, String)].collect().toSeq.sorted
    assert(incl == Seq((1L, "a"), (1L, "c"), (2L, "a"), (2L, "b"), (2L, "c")))
  }

  test("intervaljoin: keyed path without binWidth; keyless without binWidth rejected") {
    val left = Seq((1L, "u", 0.0, 10.0), (2L, "v", 0.0, 10.0))
      .toDF("lid", "k", "ls", "le")
    val right = Seq(("u", 5.0, 15.0, "wu"), ("v", 11.0, 15.0, "wv"))
      .toDF("k", "rs", "re", "rid")
    val out = ivj(left, right, "on" -> "k")
      .select("lid", "rid").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "wu"))) // v's interval starts after le
    val e = intercept[Exception] {
      ivj(left.drop("k"), right.drop("k")).collect()
    }
    assert(e.getMessage.contains("binWidth"))
  }

  test("intervaljoin: reversed interval fails loud on either side") {
    val left = Seq((1L, 10.0, 0.0)).toDF("lid", "ls", "le")
    val right = Seq(("a", 0.0, 5.0)).toDF("rid", "rs", "re")
    val e = intercept[Exception] { ivj(left, right, "binWidth" -> 5).collect() }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("precedes start"), msgs)
  }

  test("rangejoin: reversed interval (end < start) fails loud, not silent-empty") {
    val points = Seq((1L, 5.0)).toDF("pid", "t")
    val intervals = Seq(("w", 100.0, 10.0)).toDF("w", "start", "end")
    val e = intercept[Exception] {
      range(points, intervals, "binWidth" -> 10).collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("precedes start"), msgs)
  }

  test("rangejoin: rightPrefix avoids collisions; unprefixed collision errors") {
    val points = Seq((1L, 5.0)).toDF("w", "t")
    val intervals = Seq(("x", 0.0, 10.0)).toDF("w", "start", "end")
    val e = intercept[Exception] {
      range(points, intervals, "binWidth" -> 10).collect()
    }
    assert(e.getMessage.contains("collides"))
    val ok = range(points, intervals, "binWidth" -> 10, "rightPrefix" -> "iv_")
    assert(ok.columns.toSeq == Seq("w", "t", "iv_w", "iv_start", "iv_end"))
    assert(ok.count() == 1)
  }

  test("asofjoin directions: forward picks at-or-after; nearest picks the closer, tie → backward") {
    val right = Seq(("k1", 8.0, "r8"), ("k1", 21.0, "r21"), ("k1", 30.0, "r30"))
      .toDF("k", "t", "v")
    // left (k1): t=10, 20, 25; k2: t=15 (no right rows)
    val fwd = asof(left(), right, "direction" -> "forward").orderBy("eid")
      .select("eid", "v").as[(Long, Option[String])].collect().toSeq
    // 10 → r21 (earliest ≥ 10), 20 → r21, 25 → r30, k2 → none
    assert(fwd == Seq((1L, Some("r21")), (2L, Some("r21")), (3L, Some("r30")),
      (4L, None)))
    val near = asof(left(), right, "direction" -> "nearest").orderBy("eid")
      .select("eid", "v").as[(Long, Option[String])].collect().toSeq
    // 10: |10-8|=2 < |21-10|=11 → r8; 20: |20-21|=1 < |20-8| → r21;
    // 25: |25-21|=4 < |30-25|=5 → r21
    assert(near == Seq((1L, Some("r8")), (2L, Some("r21")), (3L, Some("r21")),
      (4L, None)))
    // tie: left at 14.5 is 6.5 from both r8 and r21 → backward (r8)
    val tied = asof(Seq((9L, "k1", 14.5)).toDF("eid", "k", "t"), right,
      "direction" -> "nearest")
      .select("v").as[Option[String]].collect().toSeq
    assert(tied == Seq(Some("r8")))
    // forward tolerance measures the LEAD: 10 → r21 lead 11 > 5 → null;
    // 25 → r30 lead 5 ≤ 5 → kept (inclusive bound)
    val fwdTol = asof(left(), right, "direction" -> "forward", "tolerance" -> 5)
      .orderBy("eid").select("eid", "v").as[(Long, Option[String])].collect().toSeq
    assert(fwdTol == Seq((1L, None), (2L, Some("r21")), (3L, Some("r30")), (4L, None)))
  }

  test("asofjoin: strict + forward excludes the same-instant right row; multi-key join") {
    val ctx = newCtx()
    val right = Seq(("k1", 20.0, "r20"), ("k1", 21.0, "r21"))
      .toDF("k", "t", "v")
    right.createOrReplaceTempView("asof_right2")
    def run(strict: Boolean) = TemporalStages.asofJoin(ComponentSpec("asofjoin",
      Map("right" -> "asof_right2", "on" -> "k", "leftTime" -> "t",
        "direction" -> "forward", "strict" -> strict)),
      ctx)(Seq((1L, "k1", 20.0)).toDF("eid", "k", "t"))
      .select("v").as[Option[String]].collect().toSeq
    assert(run(strict = false) == Seq(Some("r20"))) // inclusive: at-or-after
    assert(run(strict = true) == Seq(Some("r21")))  // strict: after only
    // multiple equi-keys: both must match
    val right2 = Seq(("k1", "x", 5.0, "rx"), ("k1", "y", 5.0, "ry"))
      .toDF("k", "k2", "t", "v")
    right2.createOrReplaceTempView("asof_right3")
    val out = TemporalStages.asofJoin(ComponentSpec("asofjoin",
      Map("right" -> "asof_right3", "on" -> "k,k2", "leftTime" -> "t")),
      ctx)(Seq((1L, "k1", "x", 9.0), (2L, "k1", "z", 9.0))
        .toDF("eid", "k", "k2", "t"))
      .orderBy("eid").select("eid", "v")
      .as[(Long, Option[String])].collect().toSeq
    assert(out == Seq((1L, Some("rx")), (2L, None)))
  }

  // The fixture's on-disk ts encoding has drifted once (TIMESTAMP(NANOS)
  // int64 → timestamp[us] NTZ, round 8) and will drift again. All three
  // encodings the contract covers must flow through the temporal stages
  // and land on the SAME timeline — sources.Tables is the one authority.
  test("events-ts contract: nanos-long / micros-NTZ / micros-LTZ all land on one timeline") {
    import graft.sources.Tables
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val base = Seq((1L, "k1", 10000000L), (2L, "k1", 3600000123L),
      (3L, "k2", 7200500000L))
    val ltz = base.toDF("eid", "k", "us")
      .select(col("eid"), col("k"), timestamp_micros(col("us")).as("t"))
    val ntz = ltz.withColumn("t", col("t").cast(TimestampNTZType))
    val nanos = base.toDF("eid", "k", "us")
      .select(col("eid"), col("k"), expr("us * 1000").as("t"))
    for ((df, enc) <- Seq((ltz, "ltz"), (ntz, "ntz"), (nanos, "nanos"))) {
      val norm = Tables.normalizeTs(df, "t")
      assert(norm.schema("t").dataType == TimestampType, enc)
      val got = norm.select(col("eid"), unix_micros(col("t")))
        .as[(Long, Long)].collect().toMap
      base.foreach { case (eid, _, us) => assert(got(eid) == us, s"$enc eid=$eid") }
    }
  }

  test("asofjoin accepts NTZ natively and matchedTimeField round-trips the NTZ type") {
    import org.apache.spark.sql.types.TimestampNTZType
    def enc(df: DataFrame, to: Option[org.apache.spark.sql.types.DataType]): DataFrame =
      to match {
        case Some(t) => df.withColumn("t", timestamp_micros((col("t") * 1000000).cast("long")).cast(t))
        case None => df
      }
    val right = Seq(("k1", 10.0, "r10"), ("k1", 20.0, "r20"), ("k2", 99.0, "r99"))
      .toDF("k", "t", "v")
    // reference run on numeric-seconds time
    val ref = asof(left(), right, "matchedTimeField" -> "mt").orderBy("eid")
      .select("eid", "v").as[(Long, Option[String])].collect().toSeq
    for (t <- Seq(org.apache.spark.sql.types.TimestampType, TimestampNTZType)) {
      val out = asof(enc(left(), Some(t)), enc(right, Some(t)),
        "matchedTimeField" -> "mt")
      assert(out.schema("mt").dataType == t, s"matchedTimeField must be $t")
      val got = out.orderBy("eid")
        .select("eid", "v").as[(Long, Option[String])].collect().toSeq
      assert(got == ref, s"encoding $t disagrees with numeric reference")
    }
  }

  test("sessionize + rolling accept NTZ natively, same sessions as LTZ") {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val ctx = newCtx()
    val evs = Seq(("u1", 0L), ("u1", 600L), ("u1", 4000L), ("u2", 100L))
      .toDF("user_id", "s")
    def run(t: org.apache.spark.sql.types.DataType): Seq[(String, Long, Long, Long)] = {
      val df = evs.select(col("user_id"),
        timestamp_micros((col("s") * 1000000).cast("long")).cast(t).as("ts"))
      TemporalStages.sessionizeBatch(ComponentSpec("sessionize",
        Map("gapMs" -> 1800000)), ctx)(df)
        .select(col("key"), unix_micros(col("session_start").cast(TimestampType)),
          unix_micros(col("session_end").cast(TimestampType)), col("n_events"))
        .as[(String, Long, Long, Long)].collect().toSeq.sorted
    }
    assert(run(TimestampNTZType) == run(TimestampType))
    val rolled = TemporalStages.rolling(ComponentSpec("rolling",
      Map("keyField" -> "user_id", "tsField" -> "ts", "window" -> 1000)), ctx)(
      evs.select(col("user_id"),
        timestamp_micros((col("s") * 1000000).cast("long"))
          .cast(TimestampNTZType).as("ts")))
    assert(rolled.where(col("rolling_n") === 2).count() == 1) // u1@600 sees u1@0
  }

  test("resample: agg mode buckets on the grid; first/last tie-break deterministically") {
    val ctx = newCtx()
    // numeric (epoch-seconds) time path; bucket width 10 s
    val df = Seq(("a", 1.0, 5L), ("a", 9.0, 7L), ("a", 9.0, 3L), ("a", 12.0, 9L),
      ("b", 21.0, 1L)).toDF("k", "t", "v")
    val out = TemporalStages.resample(ComponentSpec("resample",
      Map("keyField" -> "k", "tsField" -> "t", "every" -> 10,
        "aggs" -> Seq("count", "sum:v", "first:v", "last:v"))), ctx)(df)
      .orderBy("k", "bucket_ts")
      .select("k", "bucket_ts", "n", "sum_v", "first_v", "last_v")
      .as[(String, Double, Long, Long, Long, Long)].collect().toSeq
    // t=9.0 appears twice (v=7, v=3): first = min (ats, v) → 3? NO —
    // first picks the time-EARLIEST row; both share t, tie broken by
    // value → v=3; last picks time-latest, tie → larger value → v=7
    assert(out == Seq(
      ("a", 0.0, 3L, 15L, 5L, 7L),
      ("a", 10.0, 1L, 9L, 9L, 9L),
      ("b", 20.0, 1L, 1L, 1L, 1L)))
  }

  test("resample ffill: gap buckets carry the previous bucket ATOMICALLY with is_gap") {
    val ctx = newCtx()
    val df = Seq(("a", 5.0, 10L), ("a", 35.0, 20L)).toDF("k", "t", "v")
    val out = TemporalStages.resample(ComponentSpec("resample",
      Map("keyField" -> "k", "tsField" -> "t", "every" -> 10,
        "aggs" -> Seq("count", "sum:v"), "fill" -> "ffill")), ctx)(df)
      .orderBy("bucket_ts")
      .select("k", "bucket_ts", "n", "sum_v", "is_gap")
      .as[(String, Double, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      ("a", 0.0, 1L, 10L, false),
      ("a", 10.0, 1L, 10L, true), // filled from bucket 0, flagged
      ("a", 20.0, 1L, 10L, true),
      ("a", 30.0, 1L, 20L, false)))
  }

  test("resample linear: gaps interpolate between nearest observed buckets; observed rows exact") {
    val ctx = newCtx()
    // a: buckets 0 (v=10) and 3 (v=40) observed → gaps 1,2 interpolate
    // 10 + (40-10)·k/3; count interpolates too (both observed n=1 → 1.0)
    val df = Seq(("a", 5.0, 10L), ("a", 35.0, 40L)).toDF("k", "t", "v")
    val out = TemporalStages.resample(ComponentSpec("resample",
      Map("keyField" -> "k", "tsField" -> "t", "every" -> 10,
        "aggs" -> Seq("count", "sum:v"), "fill" -> "linear")), ctx)(df)
      .orderBy("bucket_ts")
      .select("k", "bucket_ts", "n", "sum_v", "is_gap")
      .as[(String, Double, Double, Double, Boolean)].collect().toSeq
    assert(out == Seq(
      ("a", 0.0, 1.0, 10.0, false),
      ("a", 10.0, 1.0, 20.0, true),
      ("a", 20.0, 1.0, 30.0, true),
      ("a", 30.0, 1.0, 40.0, false)))
  }

  test("resample linear: non-numeric aggregate rejected with the ffill pointer") {
    val ctx = newCtx()
    val df = Seq(("a", 5.0, "x")).toDF("k", "t", "s")
    val err = intercept[Exception](TemporalStages.resample(ComponentSpec("resample",
      Map("keyField" -> "k", "tsField" -> "t", "every" -> 10,
        "aggs" -> Seq("last:s"), "fill" -> "linear")), ctx)(df))
    assert(err.getMessage.contains("NUMERIC") && err.getMessage.contains("ffill"))
  }

  test("resample: maxBuckets fails loud; missing `every` rejected") {
    val ctx = newCtx()
    val df = Seq(("a", 0.0, 1L), ("a", 1e6, 2L)).toDF("k", "t", "v")
    val wide = TemporalStages.resample(ComponentSpec("resample",
      Map("keyField" -> "k", "tsField" -> "t", "every" -> 1,
        "fill" -> "ffill", "maxBuckets" -> 100)), ctx)(df)
    val err = intercept[Exception](wide.collect())
    assert(err.getMessage.contains("maxBuckets"))
    val noEvery = intercept[Exception](TemporalStages.resample(
      ComponentSpec("resample", Map("keyField" -> "k")), ctx)(df))
    assert(noEvery.getMessage.contains("every"))
  }

  test("delta: per-key ordered lag gaps; tie-break; first row null") {
    val ctx = newCtx()
    val ev = Seq(
      ("u1", 10.0, 1L, 100L), ("u1", 20.0, 2L, 130L), ("u1", 20.0, 3L, 90L),
      ("u2", 5.0, 4L, 7L))
      .toDF("u", "t", "eid", "v")
    val out = TemporalStages.delta(ComponentSpec("delta",
      Map("keyField" -> "u", "tsField" -> "t", "tieField" -> "eid",
        "valueFields" -> Seq("v"))), ctx)(ev)
      .select(col("eid"), col("dt_us"), col("v_delta"))
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((None, None)))                        // key's first row
    assert(out(2L) == ((Some(10000000L), Some(30L))))
    assert(out(3L) == ((Some(0L), Some(-40L))))              // tie: eid orders
    assert(out(4L) == ((None, None)))                        // other key
  }

  test("cumulate: per-key running count and exact sums; tie-break; count-only") {
    val ctx = newCtx()
    val ev = Seq(
      ("u1", 10.0, 1L, 100L), ("u1", 20.0, 2L, 130L), ("u1", 20.0, 3L, 90L),
      ("u2", 5.0, 4L, 7L))
      .toDF("u", "t", "eid", "v")
    val out = TemporalStages.cumulate(ComponentSpec("cumulate",
      Map("keyField" -> "u", "tsField" -> "t", "tieField" -> "eid",
        "valueFields" -> Seq("v"))), ctx)(ev)
      .select(col("eid"), col("cum_n"), col("v_cumsum"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((1L, 100L)))
    assert(out(2L) == ((2L, 230L)))
    assert(out(3L) == ((3L, 320L)))   // tie at t=20: eid completes the order
    assert(out(4L) == ((1L, 7L)))     // other key restarts
    // no valueFields → running count only, no *_cumsum columns
    val countOnly = TemporalStages.cumulate(ComponentSpec("cumulate",
      Map("keyField" -> "u", "tsField" -> "t", "tieField" -> "eid")), ctx)(ev)
    assert(countOnly.columns.toSeq ==
      ev.columns.toSeq :+ "cum_n")
  }

  test("datefeatures: UTC calendar fields, ISO dow/week, part guard") {
    val ctx = newCtx()
    val df = Seq("2024-01-01 00:30:00", "2024-03-15 12:34:56")
      .toDF("s").withColumn("ts", col("s").cast("timestamp"))
    val out = TemporalStages.dateFeatures(ComponentSpec("datefeatures",
      Map("field" -> "ts", "parts" -> Seq("year", "month", "day", "dow",
        "hour", "minute", "second", "week", "doy"))), ctx)(df)
      .select("s", "ts_year", "ts_month", "ts_day", "ts_dow", "ts_hour",
        "ts_minute", "ts_second", "ts_week", "ts_doy")
      .collect().map(r => r.getString(0) -> (1 to 9).map(r.getInt)).toMap
    // 2024-01-01 is a Monday: ISO dow 1, ISO week 1, doy 1
    assert(out("2024-01-01 00:30:00") == Seq(2024, 1, 1, 1, 0, 30, 0, 1, 1))
    // 2024-03-15 is a Friday: dow 5, ISO week 11, doy 75 (leap year)
    assert(out("2024-03-15 12:34:56") == Seq(2024, 3, 15, 5, 12, 34, 56, 11, 75))
    assert(intercept[Exception](TemporalStages.dateFeatures(
      ComponentSpec("datefeatures", Map("field" -> "ts",
        "parts" -> Seq("zodiac"))), ctx)(df)).getMessage.contains("zodiac"))
    assert(intercept[Exception](TemporalStages.dateFeatures(
      ComponentSpec("datefeatures", Map("field" -> "nope")), ctx)(df))
      .getMessage.contains("nope"))
  }

  test("eventpaths: ordered journeys, null placeholder, maxSteps truncation") {
    val ctx = newCtx()
    val ev = Seq(
      ("u1", 1.0, 1L, Some("A")), ("u1", 2.0, 2L, Some("B")), ("u1", 3.0, 3L, Some("C")),
      ("u2", 1.0, 4L, Some("A")), ("u2", 2.0, 5L, Some("B")), ("u2", 3.0, 6L, Some("C")),
      ("u3", 1.0, 7L, Some("B")), ("u3", 2.0, 8L, None))
      .toDF("u", "t", "eid", "state")
    def run(opts: (String, Any)*) = TemporalStages.eventPaths(
      ComponentSpec("eventpaths", Map("keyField" -> "u", "tsField" -> "t",
        "tieField" -> "eid", "stateField" -> "state") ++ opts.toMap), ctx)(ev)
      .as[(String, Long)].collect().toMap
    assert(run() == Map("A>B>C" -> 2L, "B>(null)" -> 1L))
    // maxSteps truncates the journey prefix
    assert(run("maxSteps" -> 2) == Map("A>B" -> 2L, "B>(null)" -> 1L))
    assert(run("sep" -> "|", "maxSteps" -> 2) ==
      Map("A|B" -> 2L, "B|(null)" -> 1L))
    assert(intercept[Exception](run("maxSteps" -> 0))
      .getMessage.contains("maxSteps"))
    assert(intercept[Exception](TemporalStages.eventPaths(
      ComponentSpec("eventpaths", Map("keyField" -> "u")), ctx)(ev))
      .getMessage.contains("stateField"))
  }

  test("lagfeatures: k-step lags/leads per key; tie order; width guard") {
    val ctx = newCtx()
    val ev = Seq(
      ("u1", 1.0, 1L, 10L), ("u1", 2.0, 2L, 20L), ("u1", 2.0, 3L, 30L),
      ("u2", 9.0, 4L, 99L))
      .toDF("u", "t", "eid", "v")
    val out = TemporalStages.lagFeatures(ComponentSpec("lagfeatures",
      Map("keyField" -> "u", "tsField" -> "t", "tieField" -> "eid",
        "valueFields" -> Seq("v"), "lags" -> 2, "leads" -> 1)), ctx)(ev)
      .select(col("eid"), col("v_lag1"), col("v_lag2"), col("v_lead1"))
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((None, None, Some(20L))))
    assert(out(2L) == ((Some(10L), None, Some(30L)))) // tie: eid orders
    assert(out(3L) == ((Some(20L), Some(10L), None)))
    assert(out(4L) == ((None, None, None)))           // other key isolated
    assert(intercept[Exception](TemporalStages.lagFeatures(
      ComponentSpec("lagfeatures", Map("keyField" -> "u", "tsField" -> "t",
        "valueFields" -> Seq("v"), "lags" -> 40)), ctx)(ev))
      .getMessage.contains("32"))
    assert(intercept[Exception](TemporalStages.lagFeatures(
      ComponentSpec("lagfeatures", Map("keyField" -> "u")), ctx)(ev))
      .getMessage.contains("valueFields"))
  }

  test("transitions: Markov matrix hand values; null state; selfLoops; minCount") {
    val ctx = newCtx()
    // u1: A→B→B→null→A (ties broken by eid); u2: A→B at EQUAL ts
    val ev = Seq(
      ("u1", 1.0, 1L, Some("A")), ("u1", 2.0, 2L, Some("B")),
      ("u1", 3.0, 3L, Some("B")), ("u1", 4.0, 4L, None),
      ("u1", 5.0, 5L, Some("A")),
      ("u2", 9.0, 6L, Some("A")), ("u2", 9.0, 7L, Some("B")))
      .toDF("u", "t", "eid", "state")
    def run(opts: (String, Any)*) = TemporalStages.transitions(
      ComponentSpec("transitions", Map("keyField" -> "u", "tsField" -> "t",
        "tieField" -> "eid", "stateField" -> "state") ++ opts.toMap), ctx)(ev)
      .select("from_state", "to_state", "n", "n_from", "p")
      .as[(Option[String], Option[String], Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val out = run()
    assert(out == Map(
      (Some("A"), Some("B")) -> ((2L, 2L, 1.0)),   // u1 first hop + u2's tie-ordered hop
      (Some("B"), Some("B")) -> ((1L, 2L, 0.5)),
      (Some("B"), None)      -> ((1L, 2L, 0.5)),   // NULL is a real state
      ((None: Option[String]), Some("A")) -> ((1L, 1L, 1.0))))
    // selfLoops=false drops B→B BEFORE the matrix: B's mass renormalizes
    val noSelf = run("selfLoops" -> false)
    assert(!noSelf.contains((Some("B"), Some("B"))))
    assert(noSelf((Some("B"), None)) == ((1L, 1L, 1.0)))
    // minCount prunes AFTER n_from is fixed (p still over the full matrix)
    val pruned = run("minCount" -> 2)
    assert(pruned == Map((Some("A"), Some("B")) -> ((2L, 2L, 1.0))))
    // stateField required; unknown column fails loud
    assert(intercept[Exception](TemporalStages.transitions(
      ComponentSpec("transitions", Map("keyField" -> "u", "tsField" -> "t")),
      ctx)(ev)).getMessage.contains("stateField"))
    assert(intercept[Exception](TemporalStages.transitions(
      ComponentSpec("transitions", Map("keyField" -> "u", "tsField" -> "t",
        "stateField" -> "zzz")), ctx)(ev)).getMessage.contains("zzz"))
  }

  test("funnel: strict ordering, stall contiguity, conversion window") {
    val ctx = newCtx()
    // numeric (epoch-second) times keep every expectation enumerable
    val ev = Seq(
      // u1 completes all three in order
      (1L, 10.0, "a"), (1L, 20.0, "b"), (1L, 30.0, "c"),
      // u2: step-3 event BEFORE step 2 — must not count (strictly after)
      (2L, 10.0, "a"), (2L, 15.0, "c"), (2L, 20.0, "b"),
      // u3: skips step 2 entirely — a later 'c' never advances past 1
      (3L, 10.0, "a"), (3L, 40.0, "c"),
      // u4: same-instant step 2 (ts == t1) is NOT strictly after
      (4L, 10.0, "a"), (4L, 10.0, "b"),
      // u5: never enters the funnel
      (5L, 10.0, "b"), (5L, 20.0, "c"))
      .toDF("u", "t", "e")
    def run(opts: (String, Any)*): Map[Long, (Int, Long, Long)] =
      TemporalStages.funnel(ComponentSpec("funnel",
        Map("keyField" -> "u", "tsField" -> "t", "typeField" -> "e",
          "steps" -> Seq("a", "b", "c")) ++ opts.toMap), ctx)(ev)
        .select(col("key"), col("steps_completed"),
          unix_micros(col("first_ts")), unix_micros(col("last_ts")))
        .as[(Long, Int, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val out = run()
    assert(out.keySet == Set(1L, 2L, 3L, 4L)) // u5 never enters
    assert(out(1L) == ((3, 10000000L, 30000000L)))
    assert(out(2L) == ((2, 10000000L, 20000000L))) // early 'c' ignored
    assert(out(3L) == ((1, 10000000L, 10000000L))) // skipped step stalls
    assert(out(4L) == ((1, 10000000L, 10000000L))) // same instant ≠ after
    // window anchored at step 1: u1's step 3 at t1+20 falls outside a
    // 15-second window, step 2 at t1+10 stays inside
    val win = run("window" -> 15)
    assert(win(1L) == ((2, 10000000L, 20000000L)))
    // fewer than 2 steps rejected
    val err = intercept[Exception](TemporalStages.funnel(ComponentSpec(
      "funnel", Map("steps" -> Seq("a"))), ctx)(ev))
    assert(err.getMessage.contains("steps"))
  }

  test("cohortretention: cohort = first-event period; distinct keys per period") {
    val ctx = newCtx()
    val ev = Seq(
      // u1 first in week of 2024-01-01 (Mon), active weeks 0, 1, 1 (dup)
      (1L, "2024-01-02 10:00:00", ""), (1L, "2024-01-08 10:00:00", ""),
      (1L, "2024-01-09 10:00:00", ""),
      // u2 same cohort, active week 0 only
      (2L, "2024-01-03 00:00:00", ""),
      // u3 cohorts one week later, active weeks 0 and 2
      (3L, "2024-01-10 00:00:00", ""), (3L, "2024-01-22 12:00:00", ""))
      .toDF("u", "tss", "pad")
      .select(col("u"), to_timestamp(col("tss")).as("ts"))
    val out = TemporalStages.cohortRetention(ComponentSpec("cohortretention",
      Map("keyField" -> "u", "tsField" -> "ts")), ctx)(ev)
      .select("cohort", "period", "active")
      .as[(String, Int, Long)].collect().toSet
    assert(out == Set(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L),
      ("2024-01-08", 0, 1L), ("2024-01-08", 2, 1L)))
    // maxPeriods caps the triangle; day period uses day units
    val capped = TemporalStages.cohortRetention(ComponentSpec("cohortretention",
      Map("keyField" -> "u", "tsField" -> "ts", "maxPeriods" -> 0)), ctx)(ev)
      .select("period").as[Int].collect().toSet
    assert(capped == Set(0))
    val daily = TemporalStages.cohortRetention(ComponentSpec("cohortretention",
      Map("keyField" -> "u", "tsField" -> "ts", "period" -> "day")), ctx)(ev)
      .where(col("cohort") === "2024-01-10")
      .select("period").as[Int].collect().toSet
    assert(daily == Set(0, 12)) // jan 10 → jan 22 = 12 days
  }

  test("runlength: maximal state runs; null-state runs; per-key isolation") {
    val ctx = newCtx()
    val ev = Seq(
      ("u1", 1.0, 1L, Some("A")), ("u1", 2.0, 2L, Some("A")),
      ("u1", 3.0, 3L, Some("B")), ("u1", 4.0, 4L, Some("B")),
      ("u1", 5.0, 5L, Some("B")), ("u1", 6.0, 6L, Some("A")),
      ("u1", 7.0, 7L, None), ("u1", 8.0, 8L, None),
      ("u2", 1.0, 9L, Some("X")))
      .toDF("u", "t", "eid", "st")
    val out = TemporalStages.runLength(ComponentSpec("runlength",
      Map("keyField" -> "u", "tsField" -> "t", "tieField" -> "eid",
        "stateField" -> "st")), ctx)(ev)
      .select("u", "state", "run_start", "run_end", "n_events")
      .as[(String, Option[String], Double, Double, Long)].collect()
      .map(r => (r._1, r._3) -> ((r._2, r._4, r._5))).toMap
    assert(out.size == 5)
    assert(out(("u1", 1.0)) == ((Some("A"), 2.0, 2L)))
    assert(out(("u1", 3.0)) == ((Some("B"), 5.0, 3L)))
    assert(out(("u1", 6.0)) == ((Some("A"), 6.0, 1L)))
    assert(out(("u1", 7.0)) == ((None, 8.0, 2L)), "null state is a real run")
    assert(out(("u2", 1.0)) == ((Some("X"), 1.0, 1L)))
    assert(intercept[Exception](TemporalStages.runLength(ComponentSpec(
      "runlength", Map("keyField" -> "u")), ctx)(ev))
      .getMessage.contains("stateField"))
  }

  test("autocorr: exact lag-k ACF hand values; constant null; integral guard") {
    val ctx = newCtx()
    // x = 1,2,1,2,1: alternating → strongly negative at lag 1
    val ev = (1 to 5).map(i =>
      ("u", i.toDouble, i.toLong, if (i % 2 == 1) 1L else 2L))
      .toDF("u", "t", "eid", "v")
    val out = TemporalStages.autocorr(ComponentSpec("autocorr",
      Map("keyField" -> "u", "tsField" -> "t", "tieField" -> "eid",
        "valueField" -> "v", "lags" -> Seq(1, 2))), ctx)(ev)
      .select("lag", "n", "n_pairs", "acf")
      .as[(Int, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // k=1: (200 − 420 + 196)/30 = −0.8; k=2: (150 − 280 + 147)/30
    assert(out(1) == ((5L, 4L, Some(-24.0 / 30.0))))
    assert(out(2) == ((5L, 3L, Some(17.0 / 30.0))))
    // constant series: zero variance → null
    val const = Seq(("u", 1.0, 1L, 3L), ("u", 2.0, 2L, 3L))
      .toDF("u", "t", "eid", "v")
    val c = TemporalStages.autocorr(ComponentSpec("autocorr",
      Map("keyField" -> "u", "tsField" -> "t", "tieField" -> "eid",
        "valueField" -> "v")), ctx)(const)
      .select("acf").as[Option[Double]].head()
    assert(c.isEmpty)
    val dbl = Seq(("u", 1.0, 1L, 0.5)).toDF("u", "t", "eid", "v")
    assert(intercept[Exception](TemporalStages.autocorr(ComponentSpec(
      "autocorr", Map("keyField" -> "u", "tsField" -> "t",
        "valueField" -> "v")), ctx)(dbl)).getMessage.contains("INTEGRAL"))
    assert(intercept[Exception](TemporalStages.autocorr(ComponentSpec(
      "autocorr", Map("keyField" -> "u", "tsField" -> "t",
        "valueField" -> "v", "lags" -> Seq(99))), ctx)(ev))
      .getMessage.contains("lag"))
  }

  test("changepoint: exact CUSUM shift position; tie earliest; guards") {
    val ctx = newCtx()
    // u1: 1,1,1,9,9 — shift after position 3: C = 5·P − t·21 peaks
    // |−48| at t=3; u2 constant → every C = 0, tie → earliest t=1
    val ev = Seq(
      ("u1", 1.0, 1L, 1L), ("u1", 2.0, 2L, 1L), ("u1", 3.0, 3L, 1L),
      ("u1", 4.0, 4L, 9L), ("u1", 5.0, 5L, 9L),
      ("u2", 1.0, 6L, 4L), ("u2", 2.0, 7L, 4L),
      ("u3", 1.0, 8L, 5L)) // single observation: no interior → absent
      .toDF("u", "t", "eid", "v")
    val out = TemporalStages.changepoint(ComponentSpec("changepoint",
      Map("keyField" -> "u", "tsField" -> "t", "tieField" -> "eid",
        "valueField" -> "v")), ctx)(ev)
      .select("u", "n", "cp_index", "cusum_max", "cusum_rate")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("u1") == ((5L, 3L, 48L, 48.0 / 25.0)))
    assert(out("u2") == ((2L, 1L, 0L, 0.0)))
    assert(!out.contains("u3"))
    val dbl = Seq(("u", 1.0, 1L, 0.5)).toDF("u", "t", "eid", "v")
    assert(intercept[Exception](TemporalStages.changepoint(ComponentSpec(
      "changepoint", Map("keyField" -> "u", "tsField" -> "t",
        "valueField" -> "v")), ctx)(dbl)).getMessage.contains("INTEGRAL"))
  }

  test("ewma: seeded recursion hand values; window truncation; nulls dropped") {
    val ctx = newCtx()
    val ev = Seq(
      ("u1", 1.0, 1L, Some(4L)), ("u1", 2.0, 2L, Some(2L)),
      ("u1", 3.0, 3L, Some(1L)), ("u1", 4.0, 4L, None),
      ("u2", 1.0, 5L, Some(8L)))
      .toDF("u", "t", "eid", "v")
    def run(opts: (String, Any)*) = TemporalStages.ewma(ComponentSpec("ewma",
      Map("field" -> "v", "keyField" -> "u", "tsField" -> "t",
        "tieField" -> "eid") ++ opts.toMap), ctx)(ev)
      .select(col("eid"), col("v_ewma")).as[(Long, Double)].collect().toMap
    // α=0.25 seed-first recursion: 4 → 4·.75+2·.25 = 3.5 → 3.5·.75+.25
    val out = run()
    assert(out(1L) == 4.0 && out(2L) == 3.5 && out(3L) == 2.875)
    assert(out(5L) == 8.0)           // other key seeds fresh
    assert(!out.contains(4L), "null value rows are dropped")
    // window=2 truncates: row 3 folds [2, 1] only
    assert(run("window" -> 2)(3L) == 2.0 * 0.75 + 0.25)
    // α=1: no memory — the value itself
    assert(run("alpha" -> "1.0")(3L) == 1.0)
    // guards
    assert(intercept[Exception](run("alpha" -> "0")).getMessage.contains("alpha"))
    assert(intercept[Exception](run("window" -> 0)).getMessage.contains("window"))
    assert(intercept[Exception](TemporalStages.ewma(ComponentSpec("ewma",
      Map("keyField" -> "u")), ctx)(ev)).getMessage.contains("field"))
  }
}
