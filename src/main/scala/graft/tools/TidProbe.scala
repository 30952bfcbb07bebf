package graft.tools

import graft.engine.Engine

/** Dev-only: adjudicate the keyedByTid pinned-shuffle vs
  * localCheckpoint alternatives (round-12 verdict watch-item) by
  * timing the keyed-frame Gremlin driver queries at a scale dir. */
object TidProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Engine.session("graft-tid-probe")
    spark.sparkContext.setLogLevel("ERROR")
    // warm-up
    spark.range(100000).selectExpr("sum(id)").collect()
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("command_gremlin_coalesce", "command_gremlin_optional",
        "command_gremlin_not", "command_gremlin", "command_gremlin_union",
        "command_gremlin_project")
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val rows = graft.SparkEntry.queries(n)(spark, dir).count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      println(f"$n%-28s min=${times.map(_._1).min}%6.2f s  " +
        f"all=${times.map(t => f"${t._1}%.2f").mkString(",")}  rows=${times.head._2}")
    }
    spark.stop()
  }
}
