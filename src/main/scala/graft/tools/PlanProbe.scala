package graft.tools

import graft.engine.Engine

/** Dev probe: print the formatted physical plan of named SparkEntry
  * queries at a given sf dir — the .explain audit loop the round notes
  * call for after each operator lands. Not part of the driver contract. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-plan-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1)
    names.foreach { n =>
      println(s"=== $n ===")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
