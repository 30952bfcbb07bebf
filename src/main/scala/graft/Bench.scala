package graft

import org.apache.spark.sql.SparkSession

/** Bench harness: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints ONE JSON line with
  * per-query wall seconds. `count()` forces full execution of each plan.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb JVM/JIT/codegen/session warm-up OUTSIDE the timed loop so
    // per-query numbers measure plan cost, not which query ran first
    locally {
      import org.apache.spark.sql.functions.broadcast
      val w = spark.read.parquet(s"$sfDir/nation.parquet")
      w.join(broadcast(w.limit(5)), Seq("n_nationkey")).count()
      spark.range(1000000).selectExpr("sum(id)").collect()
      // derived text/CSV/JSON fixtures are per-dir one-time setup, not
      // query cost — generate them outside the timed loop
      SparkEntry.warm(spark, sfDir)
    }
    // dev loop: SPARK_GRAFT_ONLY=q1,q2 restricts the run (full suite otherwise)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val selected =
      if (only.isEmpty) SparkEntry.queries else SparkEntry.queries.filter(q => only(q._1))
    // stable ordering so per-query numbers are comparable across rounds
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop any cache a query left behind — cross-query leak pileup
      // shows up as multi-second GC stalls on unrelated later queries
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
