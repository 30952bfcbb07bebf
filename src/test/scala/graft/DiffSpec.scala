package graft

import graft.spec.ComponentSpec
import graft.stages.DiffStage
import org.apache.spark.sql.functions._

/** tablediff — snapshot diff by key. Locked: the four change classes,
  * changed_cols naming (sorted, comma-joined), null-safe per-column
  * compares (null vs value = changed, null vs null = equal),
  * includeUnchanged, explicit columns selection, and the guards. */
class DiffSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("graft-diff").toFile.getPath

  test("tablediff: added/removed/changed with named columns; unchanged filtered") {
    val basePath = s"$tmp/base1"
    Seq((1L, "a", Some(10)), (2L, "b", Some(20)), (3L, "c", None),
      (4L, "d", Some(40))).toDF("id", "v", "x")
      .write.mode("overwrite").parquet(basePath)
    val after = Seq((1L, "a", Some(10)),          // unchanged
      (2L, "B", Some(99)),                        // changed: v AND x
      (3L, "c", Some(30)),                        // changed: x (null -> 30)
      (5L, "e", Some(50)))                        // added; 4 removed
      .toDF("id", "v", "x")
    def run(opts: (String, Any)*) = DiffStage.tablediff(ComponentSpec("tablediff",
      Map("baseline" -> basePath, "key" -> "id") ++ opts.toMap), newCtx())(after)
    val out = run().orderBy("id")
      .as[(Long, String, String)].collect().toSeq
    assert(out == Seq(
      (2L, "changed", "v,x"),
      (3L, "changed", "x"),
      (4L, "removed", ""),
      (5L, "added", "")))
    // includeUnchanged keeps row 1
    assert(run("includeUnchanged" -> true).count() == 5)
    // explicit columns: comparing only v makes row 3 unchanged
    val vOnly = run("columns" -> "v").orderBy("id")
      .as[(Long, String, String)].collect().toSeq
    assert(vOnly == Seq(
      (2L, "changed", "v"), (4L, "removed", ""), (5L, "added", "")))
  }

  test("tablediff guards: missing key/baseline column, null key fails loud") {
    val basePath = s"$tmp/base2"
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(basePath)
    def mk(opts: Map[String, Any], df: org.apache.spark.sql.DataFrame) =
      DiffStage.tablediff(ComponentSpec("tablediff", opts), newCtx())(df)
    val ok = Seq((1L, "a")).toDF("id", "v")
    assert(intercept[Exception](mk(Map("baseline" -> basePath), ok))
      .getMessage.contains("key"))
    assert(intercept[Exception](mk(Map("baseline" -> basePath,
      "key" -> "nope"), ok)).getMessage.contains("nope"))
    val nullKey = Seq((Some(1L), "a"), (None: Option[Long], "b")).toDF("id", "v")
    val e = intercept[Exception](
      mk(Map("baseline" -> basePath, "key" -> "id"), nullKey).collect())
    assert(e.getMessage.contains("null key"), e.getMessage)
  }

  test("tablediff: self-diff is empty; diff after an upsert classifies exactly the delta") {
    val base = s"$tmp/updiff_base"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .write.mode("overwrite").parquet(base)
    def diffVs(df: org.apache.spark.sql.DataFrame) =
      DiffStage.tablediff(ComponentSpec("tablediff",
        Map("baseline" -> base, "key" -> "id")), newCtx())(df)
    assert(diffVs(spark.read.parquet(base)).count() == 0, "self-diff must be empty")
    // upsert a delta into a COPY of the table, then diff vs the original
    val table = s"$tmp/updiff_tbl"
    spark.read.parquet(base).write.mode("overwrite").parquet(table)
    val deltaPq = s"$tmp/updiff_delta"
    Seq((2L, "B"), (9L, "i")).toDF("id", "v").write.mode("overwrite").parquet(deltaPq)
    graft.engine.Engine.runJson(newCtx(), s"""{
      "source": {"file": {"path": "$deltaPq"}},
      "extractor": {"parquet": {}},
      "loader": {"parquet": {"path": "$table", "mode": "upsert", "key": "id"}} }""")
    val out = diffVs(spark.read.parquet(table)).orderBy("id")
      .as[(Long, String, String)].collect().toSeq
    assert(out == Seq((2L, "changed", "v"), (9L, "added", "")),
      s"diff must be exactly the upsert delta's effect: $out")
  }

  test("tablediff: composite keys and a full-outer single-join plan") {
    val basePath = s"$tmp/base3"
    Seq(("x", 1L, 10), ("x", 2L, 20), ("y", 1L, 30))
      .toDF("grp", "id", "v").write.mode("overwrite").parquet(basePath)
    val after = Seq(("x", 1L, 11), ("y", 1L, 30), ("y", 2L, 40))
      .toDF("grp", "id", "v")
    val out = DiffStage.tablediff(ComponentSpec("tablediff",
      Map("baseline" -> basePath, "key" -> "grp,id")), newCtx())(after)
    val rows = out.orderBy("grp", "id")
      .as[(String, Long, String, String)].collect().toSeq
    assert(rows == Seq(
      ("x", 1L, "changed", "v"),
      ("x", 2L, "removed", ""),
      ("y", 2L, "added", "")))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), s"expected one full outer join:\n$plan")
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(plan).size <= 1,
      s"tablediff must be ONE join:\n$plan")
  }
}
