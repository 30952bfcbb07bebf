package graft

import graft.engine.Engine

/** parquet `mode: "compact"` — small-file maintenance. Locked: every
  * partition directory collapses to the requested file count with rows
  * preserved exactly; the bucketed-upsert layout keeps its sidecar and
  * stays upsertable afterwards; the `.old` crash contract holds; a
  * missing table fails loud. */
class CompactSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("graft-compact").toFile.getPath

  private def parquetFiles(root: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(root)).filter(_.getName.endsWith(".parquet"))
  }

  private def compact(path: String, extra: String = ""): Unit = {
    Engine.runJson(newCtx(), s"""{
      "source": {"file": {"path": "$sfDir/region.parquet"}},
      "extractor": {"parquet": {}},
      "loader": {"parquet": {"path": "$path", "mode": "compact"$extra}} }""")
    ()
  }

  test("compact: partition dirs collapse to one file each; rows survive exactly") {
    val path = s"$tmp/part_tbl"
    val src = s"$tmp/part_src"
    (1L to 300L).map(i => (i, s"v$i", i % 5)).toDF("id", "v", "p")
      .write.mode("overwrite").parquet(src)
    Engine.runJson(newCtx(), s"""{
      "source": {"file": {"path": "$src"}},
      "extractor": {"parquet": {}},
      "transformers": [{"command": {"command":
        "SELECT /*+ REPARTITION(16) */ * FROM input"}}],
      "loader": {"parquet": {"path": "$path", "mode": "overwrite",
                             "partitionBy": ["p"]}} }""")
    val before = spark.read.parquet(path).orderBy("id")
      .collect().map(_.toSeq).toSeq
    assert(parquetFiles(path).size > 5, "fixture must be fragmented")
    compact(path)
    assert(parquetFiles(path).size == 5,
      s"expected one file per partition, got ${parquetFiles(path).size}")
    val after = spark.read.parquet(path).orderBy("id")
      .collect().map(_.toSeq).toSeq
    assert(after == before)
    assert(!new java.io.File(s"$path.staging").exists)
    assert(!new java.io.File(s"$path.old").exists)
    // maxRecordsPerFile re-splits oversized partitions WITHIN the task:
    // 60 rows per partition at a 25-row cap → 3 files per dir
    compact(path, """, "maxRecordsPerFile": 25""")
    assert(parquetFiles(path).size == 15,
      s"expected ceil(60/25)=3 files x 5 dirs, got ${parquetFiles(path).size}")
    assert(spark.read.parquet(path).count() == 300)
  }

  test("compact unpartitioned: targetFileSizeMB sizes N files, no one-task funnel") {
    val path = s"$tmp/size_tbl"
    val src = s"$tmp/size_src"
    // ~incompressible payload so on-disk bytes are a real size signal
    (1L to 20000L).map(i => (i, s"v$i-" + scala.util.Random.nextString(64)))
      .toDF("id", "v").write.mode("overwrite").parquet(src)
    Engine.runJson(newCtx(), s"""{
      "source": {"file": {"path": "$src"}},
      "extractor": {"parquet": {}},
      "transformers": [{"command": {"command":
        "SELECT /*+ REPARTITION(16) */ * FROM input"}}],
      "loader": {"parquet": {"path": "$path", "mode": "overwrite"}} }""")
    val before = spark.read.parquet(path).orderBy("id")
      .collect().map(_.toSeq).toSeq
    assert(parquetFiles(path).size > 4, "fixture must be fragmented")
    val bytes = parquetFiles(path).map(_.length).sum
    // target ≈ a third of the table → expect ceil(bytes/target) files,
    // strictly between 1 (the coalesce funnel) and the 16 we started at
    val mb = math.max(1L, bytes / (3L * 1048576L) + 1)
    compact(path, s""", "targetFileSizeMB": $mb""")
    val n = parquetFiles(path).size
    // the loader's ContentSummary also counts _SUCCESS-style sidecars,
    // so allow one file of slack around the parquet-bytes estimate
    val want = ((bytes + mb * 1048576 - 1) / (mb * 1048576)).toInt
    assert(n == want || n == want + 1,
      s"expected ~$want size-driven files, got $n")
    assert(n > 1 && n < 16, s"got $n files — neither funneled nor fragmented")
    assert(spark.read.parquet(path).orderBy("id")
      .collect().map(_.toSeq).toSeq == before)
    // guards: the option is unpartitioned-only and must be positive
    val part = s"$tmp/size_tbl_part"
    (1L to 100L).map(i => (i, i % 3)).toDF("id", "p")
      .write.mode("overwrite").partitionBy("p").parquet(part)
    val e = intercept[Exception](compact(part, s""", "targetFileSizeMB": 1"""))
    assert(e.getMessage.contains("UNPARTITIONED"), e.getMessage)
    val e2 = intercept[Exception](compact(path, s""", "targetFileSizeMB": 0"""))
    assert(e2.getMessage.contains(">= 1"), e2.getMessage)
  }

  test("compact on a bucketed-upsert table: sidecar survives, later upserts stay pruned") {
    val path = s"$tmp/bkt_tbl"
    def upsert(src: String): Unit = {
      Engine.runJson(newCtx(), s"""{
        "source": {"file": {"path": "$src"}},
        "extractor": {"parquet": {}},
        "loader": {"parquet": {"path": "$path", "mode": "upsert",
                               "key": "id", "buckets": 4}} }""")
      ()
    }
    val base = s"$tmp/bkt_base"
    (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .write.mode("overwrite").parquet(base)
    upsert(base)
    compact(path)
    assert(new java.io.File(s"$path/_graft_buckets.json").exists,
      "bucket sidecar must survive compaction")
    // the layout is still the declared one: a delta upsert must work and
    // only touch its bucket
    val delta = s"$tmp/bkt_delta"
    Seq((7L, "UPDATED")).toDF("id", "v").write.mode("overwrite").parquet(delta)
    upsert(delta)
    val rows = spark.read.parquet(path).where($"id" === 7L)
      .select("v").as[String].collect().toSeq
    assert(rows == Seq("UPDATED"))
    assert(spark.read.parquet(path).count() == 100)
  }

  test("compact crash recovery: stranded .old restores; missing table fails loud") {
    val path = s"$tmp/crash_tbl"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(path)
    // simulate dying between move-aside and swap
    assert(new java.io.File(path).renameTo(new java.io.File(s"$path.old")))
    compact(path)
    assert(spark.read.parquet(path).orderBy("id")
      .select("v").as[String].collect().toSeq == Seq("a", "b"))
    val e = intercept[Exception](compact(s"$tmp/nope_tbl"))
    assert(e.getMessage.contains("no table"))
  }
}
