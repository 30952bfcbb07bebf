package graft

import graft.engine.Engine

/** SCD Type-2 history merge on the upsert loader (`scd2: {…}`):
  * reference semantics = the merge transformer's save-or-update
  * (OMergeTransformer.java:44-77) extended with load-version history.
  * Locked here: meta stamping on first write, close+reopen on change,
  * no-op on unchanged values (idempotent re-runs), untouched keys and
  * closed history never rewritten logically, out-of-order versions
  * fail loud, bucketed layout stays delta-pruned, and the guards name
  * their fixes. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("graft-scd2").toFile.getPath

  private def write(src: String, path: String, version: Int,
                    buckets: Option[Int] = None): Unit = {
    val b = buckets.map(n => s""", "buckets": $n""").getOrElse("")
    Engine.runJson(newCtx(), s"""{
      "source": {"file": {"path": "$src"}},
      "extractor": {"parquet": {}},
      "loader": {"parquet": {"path": "$path", "mode": "upsert",
        "key": "id"$b, "scd2": {"version": $version}}} }""")
    ()
  }

  private def history(path: String): Seq[(Long, String, Long, Option[Long], Boolean)] =
    spark.read.parquet(path)
      .select("id", "v", "valid_from", "valid_to", "is_current")
      .orderBy("id", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4))).toSeq

  test("scd2: first write stamps open rows; change closes + reopens; unchanged is a no-op; new key opens") {
    val path = s"$tmp/scd2_tbl"
    val v1 = s"$tmp/scd2_v1"; val v2 = s"$tmp/scd2_v2"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .write.mode("overwrite").parquet(v1)
    write(v1, path, 1)
    assert(history(path) == Seq(
      (1L, "a", 1L, None, true), (2L, "b", 1L, None, true),
      (3L, "c", 1L, None, true)))
    // v2: id=2 changes, id=3 re-sends the SAME value, id=4 is new;
    // id=1 is absent from the delta
    Seq((2L, "B"), (3L, "c"), (4L, "d")).toDF("id", "v")
      .write.mode("overwrite").parquet(v2)
    write(v2, path, 2)
    val expected = Seq(
      (1L, "a", 1L, None, true),
      (2L, "b", 1L, Some(2L), false), (2L, "B", 2L, None, true),
      (3L, "c", 1L, None, true), // unchanged value → no-op, still v1
      (4L, "d", 2L, None, true))
    assert(history(path) == expected)
    // idempotent: re-applying the SAME batch at the SAME version
    // changes nothing (the crash re-run contract)
    write(v2, path, 2)
    assert(history(path) == expected)
  }

  test("scd2: a version at-or-before the open row it would close fails loud") {
    val path = s"$tmp/scd2_ooo_tbl"
    val v5 = s"$tmp/scd2_ooo_v5"; val v3 = s"$tmp/scd2_ooo_v3"
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(v5)
    write(v5, path, 5)
    Seq((1L, "CHANGED")).toDF("id", "v").write.mode("overwrite").parquet(v3)
    val err = intercept[Exception](write(v3, path, 3))
    assert(err.getMessage.contains("out-of-order"),
      s"expected the out-of-order error, got: ${err.getMessage}")
  }

  test("scd2 guards: missing version, meta column in delta, non-scd2 target") {
    val path = s"$tmp/scd2_guard_tbl"
    val base = s"$tmp/scd2_guard_base"
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(base)
    val noVersion = intercept[Exception](Engine.runJson(newCtx(), s"""{
      "source": {"file": {"path": "$base"}},
      "extractor": {"parquet": {}},
      "loader": {"parquet": {"path": "$path", "mode": "upsert",
        "key": "id", "scd2": {}}} }"""))
    assert(noVersion.getMessage.contains("version"))
    // a delta already carrying a meta column is ambiguous — refuse
    val metaPq = s"$tmp/scd2_guard_meta"
    Seq((1L, "a", 9L)).toDF("id", "v", "valid_from")
      .write.mode("overwrite").parquet(metaPq)
    val metaErr = intercept[Exception](write(metaPq, path, 1))
    assert(metaErr.getMessage.contains("valid_from"))
    // an existing PLAIN upsert table cannot silently become SCD2
    val plain = s"$tmp/scd2_guard_plain"
    Engine.runJson(newCtx(), s"""{
      "source": {"file": {"path": "$base"}},
      "extractor": {"parquet": {}},
      "loader": {"parquet": {"path": "$plain", "mode": "upsert", "key": "id"}} }""")
    val notScd2 = intercept[Exception](write(base, plain, 1))
    assert(notScd2.getMessage.contains("SCD2"))
  }

  test("scd2 + buckets: history equals the plain path and the delta rewrites only its buckets") {
    val plainPath = s"$tmp/scd2_eq_plain"
    val bktPath = s"$tmp/scd2_eq_bkt"
    val v1 = s"$tmp/scd2_eq_v1"; val v2 = s"$tmp/scd2_eq_v2"
    (1L to 200L).map(i => (i, s"v$i")).toDF("id", "v")
      .write.mode("overwrite").parquet(v1)
    Seq((7L, "UPDATED")).toDF("id", "v").write.mode("overwrite").parquet(v2)
    write(v1, plainPath, 1); write(v2, plainPath, 2)
    write(v1, bktPath, 1, buckets = Some(8))
    def dataFiles(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(bktPath))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified).toMap
    }
    val before = dataFiles()
    write(v2, bktPath, 2, buckets = Some(8))
    val after = dataFiles()
    assert(history(bktPath) == history(plainPath))
    // every untouched bucket's files survive byte-identically (same
    // path, same mtime); exactly one bucket was rewritten
    val survived = before.keySet.intersect(after.keySet)
    assert(survived.forall(k => before(k) == after(k)))
    val touched = (before.keySet -- after.keySet).map(p =>
      p.split("/").find(_.startsWith("__bucket=")).getOrElse(""))
    assert(touched.size == 1, s"expected exactly one rewritten bucket, got $touched")
  }
}
