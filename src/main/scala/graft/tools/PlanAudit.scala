package graft.tools

import graft.engine.Engine

/** Dev probe: `.explain("formatted")` for named SparkEntry queries (all
  * round-7 additions by default) — the per-round plan audit (pushed
  * filters at the scans, equi-joins not cartesians, codegen spans)
  * without executing the full queries. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("mm_video", "graph_triangle", "command_gremlin")
    val spark = Engine.session("graft-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
