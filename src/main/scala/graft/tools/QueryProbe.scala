package graft.tools

import graft.engine.Engine

/** Dev probe: run named SparkEntry queries at a scale dir and print the
  * results — quick iteration on individual driver rows without the full
  * Verify dump. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSeq
    val spark = Engine.session("graft-query-probe")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"=== $n ===")
      graft.SparkEntry.queries(n)(spark, sfDir).show(50, truncate = false)
    }
    spark.stop()
  }
}
