package graft

import graft.spec.ComponentSpec
import graft.stages.{CubeStages, ExpectStage}
import org.apache.spark.sql.functions._

/** rollup/cube grouping-sets, declared-values pivot, expect rules. */
class CubeExpectSpec extends SparkSpec {
  import spark.implicits._

  private val sales = Seq(
    ("us", "a", 10L), ("us", "a", 20L), ("us", "b", 5L), ("eu", "a", 7L))
    .toDF("region", "prod", "amt")

  test("rollup: detail + subtotal + grand total rows with sentinel labels") {
    val ctx = newCtx()
    val out = CubeStages.rollup(ComponentSpec("rollup", Map(
        "keys" -> Seq("region", "prod"), "aggs" -> Seq("count", "sum:amt"))), ctx)(sales)
      .orderBy("gid", "region", "prod")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("eu", "a", 0L, 1L, 7L),
      ("us", "a", 0L, 2L, 30L),
      ("us", "b", 0L, 1L, 5L),
      ("eu", "(all)", 1L, 1L, 7L),
      ("us", "(all)", 1L, 3L, 35L),
      ("(all)", "(all)", 3L, 4L, 42L)))
    // ONE aggregate with Expand — not a union of per-level jobs
    val plan = CubeStages.rollup(ComponentSpec("rollup", Map(
      "keys" -> Seq("region", "prod"))), ctx)(sales)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"grouping sets should plan via Expand:\n$plan")
    assert(!plan.contains("Union"), s"rollup must not union per-level jobs:\n$plan")
  }

  test("cube mode emits every key subset") {
    val ctx = newCtx()
    val out = CubeStages.rollup(ComponentSpec("rollup", Map(
        "keys" -> Seq("region", "prod"), "mode" -> "cube")), ctx)(sales)
    // rollup gives 3 detail + 2 region + 1 total = 6; cube adds per-prod (2)
    assert(out.count() == 8)
    assert(out.where(col("region") === "(all)" && col("prod") === "a")
      .select("n").as[Long].head() == 3L)
  }

  test("pivot: declared values become columns; count fills zero") {
    val ctx = newCtx()
    val out = CubeStages.pivot(ComponentSpec("pivot", Map(
        "groupBy" -> Seq("region"), "pivotColumn" -> "prod",
        "values" -> Seq("a", "b", "zzz"))), ctx)(sales)
      .orderBy("region")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("eu", 1L, 0L, 0L), ("us", 2L, 1L, 0L)))
    val sums = CubeStages.pivot(ComponentSpec("pivot", Map(
        "groupBy" -> Seq("region"), "pivotColumn" -> "prod",
        "values" -> Seq("a", "b"), "agg" -> "sum:amt")), ctx)(sales)
      .orderBy("region")
      .as[(String, Option[Long], Option[Long])].collect().toSeq
    assert(sums == Seq(("eu", Some(7L), None), ("us", Some(30L), Some(5L))))
  }

  test("unpivot: wide→long; null values drop unless kept; mixed types loud") {
    val ctx = newCtx()
    val wide = Seq((1L, Some(10L), Some(20L)), (2L, Some(30L), None))
      .toDF("id", "x", "y")
    def run(opts: (String, Any)*) = CubeStages.unpivot(ComponentSpec("unpivot",
      Map("ids" -> Seq("id"), "values" -> Seq("x", "y")) ++ opts.toMap),
      ctx)(wide)
    val out = run().orderBy("id", "variable")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "x", 10L), (1L, "y", 20L), (2L, "x", 30L)))
    // keepNulls keeps the (2, y, null) row
    assert(run("keepNulls" -> true).count() == 4)
    // custom output names; no shuffle in the plan (Expand projection)
    val named = run("variableField" -> "k", "valueField" -> "v")
    assert(named.columns.toSeq == Seq("id", "k", "v"))
    assert(!named.queryExecution.executedPlan.toString.contains("Exchange"))
    // mixed value types are refused with the columns named
    val e = intercept[Exception](CubeStages.unpivot(ComponentSpec("unpivot",
      Map("ids" -> Seq("id"), "values" -> Seq("x", "s"))), ctx)(
      Seq((1L, 2L, "t")).toDF("id", "x", "s")))
    assert(e.getMessage.contains("share one type") && e.getMessage.contains("s:string"))
  }

  test("flatten: recursive struct promotion, single-array explode, collisions loud") {
    val ctx = newCtx()
    val df = Seq((1L, ("x", (2L, "y")), Seq(10L, 20L)))
      .toDF("id", "s", "arr")
    // two nesting levels flatten to s_*, s__2_* names
    val out = graft.stages.Stages.flatten(ComponentSpec("flatten",
        Map("explodeField" -> "arr", "indexField" -> "i")), ctx)(df)
    assert(out.columns.toSet ==
      Set("id", "i", "arr", "s__1", "s__2__1", "s__2__2"))
    assert(out.count() == 2) // array exploded
    assert(out.where(col("i") === 1).select("arr").as[Long].head() == 20L)
    // non-struct frame passes through untouched
    val plain = Seq((1L, "a")).toDF("id", "v")
    assert(graft.stages.Stages.flatten(ComponentSpec("flatten", Map.empty), ctx)(plain)
      .columns.toSeq == Seq("id", "v"))
    // name collision is a named error
    val clash = Seq((1L, 2L, Tuple1(3L))).toDF("id", "s_x", "s")
      .select(col("id"), col("s_x"), col("s").cast("struct<x: bigint>"))
    val e = intercept[Exception](graft.stages.Stages.flatten(
      ComponentSpec("flatten", Map.empty), ctx)(clash))
    assert(e.getMessage.contains("collides"), e.getMessage)
    // exploding a non-array is refused
    val e2 = intercept[Exception](graft.stages.Stages.flatten(
      ComponentSpec("flatten", Map("explodeField" -> "id")), ctx)(plain))
    assert(e2.getMessage.contains("not an array"), e2.getMessage)
  }

  test("profile: long-format per-column metrics in one aggregation") {
    val ctx = newCtx()
    val df = Seq((1L, Some("x")), (2L, None), (2L, Some("y"))).toDF("id", "tag")
    val out = ExpectStage.profile(ComponentSpec("profile", Map.empty), ctx)(df)
      .as[(String, String, String)].collect().toSeq
    assert(out == Seq(
      ("id", "distinct", "2"), ("id", "max", "2"), ("id", "min", "1"),
      ("id", "non_nulls", "3"), ("id", "nulls", "0"),
      ("tag", "distinct", "2"), ("tag", "max", "y"), ("tag", "min", "x"),
      ("tag", "non_nulls", "2"), ("tag", "nulls", "1")))
    // ONE aggregation job even with several exact distincts (Expand)
    val plan = ExpectStage.profile(ComponentSpec("profile", Map.empty), ctx)(df)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"multi-distinct should plan via Expand:\n$plan")
    // approx mode swaps in HLL sketches
    val approx = ExpectStage.profile(ComponentSpec("profile", Map(
        "columns" -> Seq("id"), "distinct" -> "approx")), ctx)(df)
      .where(col("metric") === "distinct").select("value").as[String].head()
    assert(approx == "2")
  }

  test("profile auto: wide schemas switch to HLL — no Expand in the plan") {
    val ctx = newCtx()
    val wide = spark.range(100).select(
      (0 to ExpectStage.ProfileExactMax).map(i => (col("id") % (i + 2)).as(s"c$i")): _*)
    // 9 columns > ProfileExactMax → auto lands on approx: the plan must
    // carry HLL sketches, never one Expand row-copy per column
    val auto = ExpectStage.profile(ComponentSpec("profile", Map.empty), ctx)(wide)
    val plan = auto.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"wide auto profile must not Expand:\n$plan")
    assert(auto.count() == (ExpectStage.ProfileExactMax + 1) * 5L)
    // at/below the threshold auto stays exact (the Expand plan)
    val narrow = spark.range(100).select(
      (1 to ExpectStage.ProfileExactMax).map(i => (col("id") % (i + 1)).as(s"c$i")): _*)
    val exact = ExpectStage.profile(ComponentSpec("profile", Map.empty), ctx)(narrow)
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"))
    // explicit exact always wins, even wide
    val forced = ExpectStage.profile(ComponentSpec("profile",
      Map("distinct" -> "exact")), ctx)(wide)
    assert(forced.queryExecution.executedPlan.toString.contains("Expand"))
  }

  test("rowid: distributed numbering equals the global window, across partitions") {
    val ctx = newCtx()
    val df = (0L until 500L).map(i => (i * 7 % 500, s"v$i")).toDF("k", "v")
    val out = graft.split.SplitStages.rowid(ComponentSpec("rowid", Map(
        "orderField" -> "k", "partitions" -> 7, "start" -> 10)), ctx)(df)
      .select("k", "row_id").as[(Long, Long)].collect().toSeq.sortBy(_._1)
    // dense, gapless, starts at `start`, follows global k order
    assert(out.map(_._2) == (10L until 510L))
    assert(out.map(_._1) == out.map(_._1).sorted)
    // no single-task global sort in the plan
    val plan = graft.split.SplitStages.rowid(ComponentSpec("rowid", Map(
        "orderField" -> "k", "partitions" -> 7)), ctx)(df)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("global=true"), s"must not plan a global sort:\n$plan")
  }

  test("expect: per-rule metrics, ratios, thresholds; halt poisons the action") {
    val ctx = newCtx()
    val df = Seq((1L, Some("x"), 10.0), (2L, None, -1.0), (2L, Some("y"), 5.0))
      .toDF("id", "tag", "price")
    def rules(minRatio: Double) = Seq(
      Map("name" -> "tag_not_null", "check" -> "not_null", "column" -> "tag",
        "minRatio" -> minRatio),
      Map("name" -> "id_unique", "check" -> "unique", "column" -> "id",
        "minRatio" -> minRatio),
      Map("name" -> "price_pos", "check" -> "expr", "expr" -> "price > 0",
        "minRatio" -> minRatio),
      Map("name" -> "tag_accepted", "check" -> "accepted", "column" -> "tag",
        "values" -> Seq("x", "y"), "minRatio" -> minRatio))
    val out = ExpectStage.expect(ComponentSpec("expect", Map(
        "rules" -> rules(0.5))), ctx)(df)
      .select("rule", "rows", "violations", "passed")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      ("id_unique", 3L, 1L, true),      // id 2 duplicated once
      ("price_pos", 3L, 1L, true),      // -1.0 violates
      ("tag_accepted", 3L, 1L, true),   // null tag not accepted
      ("tag_not_null", 3L, 1L, true)))  // 2/3 >= 0.5
    val strict = ExpectStage.expect(ComponentSpec("expect", Map(
        "rules" -> rules(1.0), "onFail" -> "halt")), ctx)(df)
    val e = intercept[Exception](strict.collect())
    assert(e.getMessage.contains("expect: rule"), e.getMessage)
    // empty input passes every rule (ratio defined as 1)
    val empty = ExpectStage.expect(ComponentSpec("expect", Map(
        "rules" -> rules(1.0))), ctx)(df.where(lit(false)))
      .select("passed").as[Boolean].collect().toSeq
    assert(empty == Seq(true, true, true, true))
  }

  test("expect relationship: referential integrity vs a parquet ref; null FKs pass") {
    val ctx = newCtx()
    val refPath = java.nio.file.Files
      .createTempDirectory("graft-expect-ref").toString + "/dim"
    Seq(10L, 20L).toDF("k").write.mode("overwrite").parquet(refPath)
    val df = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, Some(99L)),
      (4L, None: Option[Long])).toDF("id", "fk")
    val out = ExpectStage.expect(ComponentSpec("expect", Map(
        "rules" -> Seq(Map("name" -> "fk_known", "check" -> "relationship",
          "column" -> "fk", "refPath" -> refPath, "refColumn" -> "k",
          "minRatio" -> 0.7)))), ctx)(df)
      .select("rule", "rows", "violations", "passed")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    // 99 is unknown (1 violation); the null FK is NOT a violation
    assert(out == Seq(("fk_known", 4L, 1L, true)))
    // missing ref column names the rule; missing ref spec names the keys
    val e = intercept[Exception](ExpectStage.expect(ComponentSpec("expect", Map(
      "rules" -> Seq(Map("name" -> "r", "check" -> "relationship",
        "column" -> "fk", "refPath" -> refPath, "refColumn" -> "nope")))),
      ctx)(df))
    assert(e.getMessage.contains("nope"), e.getMessage)
    val e2 = intercept[Exception](ExpectStage.expect(ComponentSpec("expect", Map(
      "rules" -> Seq(Map("name" -> "r", "check" -> "relationship",
        "column" -> "fk", "refColumn" -> "k")))), ctx)(df))
    assert(e2.getMessage.contains("refPath"), e2.getMessage)
  }

  test("classbalance: rare class fully kept, common hash-sampled, deterministic") {
    val ctx = newCtx()
    import spark.implicits._
    val df = ((1 to 400).map(i => (i.toLong, "a")) ++
      (1001 to 1020).map(i => (i.toLong, "b")))
      .toDF("doc_id", "cls")
    def run(opts: (String, Any)*) = graft.split.SplitStages.classBalance(
      ComponentSpec("classbalance", Map("classField" -> "cls") ++ opts.toMap),
      ctx)(df)
    val out = run().select("doc_id", "cls").as[(Long, String)].collect()
    val byCls = out.groupBy(_._2).view.mapValues(_.length).toMap
    // smallest class (b, 20 rows): threshold 10000 → every row kept
    assert(byCls("b") == 20)
    // common class: thr = 20·10000/400 = 500 → ≈20 of 400 (binomial;
    // ±4.5σ bounds keep the assertion hash-stable, not flaky)
    assert(byCls("a") >= 5 && byCls("a") <= 45, s"a kept ${byCls("a")}")
    // key-stable: a second run keeps the identical set
    assert(run().select("doc_id").as[Long].collect().sorted.toSeq ==
      out.map(_._1).sorted.toSeq)
    // explicit targetCount: classes at/under it keep everything
    val t = run("targetCount" -> 100)
      .select("cls").as[String].collect().groupBy(identity).view.mapValues(_.length)
    assert(t("b") == 20 && t("a") >= 60 && t("a") <= 140, t.toMap.toString)
    // NULL class is a real class, never silently dropped
    val withNull = (Seq.tabulate(5)(i => (i.toLong, Option.empty[String])) ++
      Seq.tabulate(5)(i => (100L + i, Some("x")))).toDF("doc_id", "cls")
    val kept = graft.split.SplitStages.classBalance(ComponentSpec(
      "classbalance", Map("classField" -> "cls")), ctx)(withNull)
      .select("cls").as[Option[String]].collect()
    assert(kept.count(_.isEmpty) == 5 && kept.count(_.isDefined) == 5)
    assert(intercept[Exception](run("targetCount" -> 0).count())
      .getMessage.contains("targetCount"))
  }

  test("graphmetrics: one-row profile; parallel edges dedupe; self-loop counts") {
    val ctx = newCtx()
    import spark.implicits._
    ctx.addEdges(Seq(("a", "b"), ("a", "c"), ("b", "c"), ("b", "c"),
      ("c", "c")).toDF("src", "dst").withColumn("label", lit("e")))
    val out = graft.graph.GraphStages.graphMetrics(
      ComponentSpec("graphmetrics", Map()), ctx)(spark.emptyDataFrame)
      .select("n_vertices", "n_edges", "max_out_degree", "max_in_degree",
        "avg_degree", "density")
      .as[(Long, Long, Long, Long, Double, Double)].head()
    // distinct pairs: ab ac bc cc → E=4, V=3; out: a=2; in: c=3
    assert(out == ((3L, 4L, 2L, 3L, 8.0 / 3.0, 4.0 / 6.0)))
    // assortativity over (out-deg(src), in-deg(dst)) pairs:
    // (2,1),(2,3),(1,3),(1,3) → cov·n = −4, vx = 4, vy = 12
    val r = graft.graph.GraphStages.graphMetrics(
      ComponentSpec("graphmetrics", Map("assortativity" -> true)), ctx)(
      spark.emptyDataFrame)
      .select("assortativity").as[Option[Double]].head()
    assert(r == Some(-4.0 / (math.sqrt(4.0) * math.sqrt(12.0))))
    // a constant-degree graph has no degree variance → null
    val ctx2 = newCtx()
    ctx2.addEdges(Seq(("p", "q"), ("q", "r")).toDF("src", "dst")
      .withColumn("label", lit("e")))
    val r2 = graft.graph.GraphStages.graphMetrics(
      ComponentSpec("graphmetrics", Map("assortativity" -> true)), ctx2)(
      spark.emptyDataFrame)
      .select("assortativity").as[Option[Double]].head()
    assert(r2.isEmpty)
  }
}
