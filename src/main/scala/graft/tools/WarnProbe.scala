package graft.tools

import graft.engine.Engine

/** Dev probe (r15): reproduce-or-clear the round-14 post-ambient bench
  * warnings. Runs the named SparkEntry queries at sf0.1 exactly as Bench
  * does (count + clearCache), one warm-up then N timed reps, printing
  * every rep — an idle-box reproduction decides fix vs evidence-reseed.
  */
object WarnProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(4)
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("command_gremlin_local", "similarity_ivf", "mm_audio",
               "mixture_sample", "field_remove")
    val spark = Engine.session("graft-warn-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    // same canary as Bench: pure compute + one shuffle, anchor 0.216 s —
    // prints the window's cleanliness so a probe run is self-describing
    locally {
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.range(1L << 24).selectExpr("id % 9973 AS k", "id AS v")
          .groupBy("k").sum("v").selectExpr("sum(`sum(v)`)").collect()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val c = Seq(once(), once(), once()).min
      println(f"_canary min=$c%6.2f s (bench anchor 0.216 s => window ratio ${c / 0.216}%.2fx)")
    }
    graft.SparkEntry.warm(spark, dir)
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      once() // warm (codegen/JIT for this query's operators)
      val ts = Seq.fill(reps)(once())
      println(f"$n%-26s min=${ts.min}%6.2f s  reps=${ts.map(t => f"$t%.2f").mkString(", ")}")
    }
    spark.stop()
  }
}
