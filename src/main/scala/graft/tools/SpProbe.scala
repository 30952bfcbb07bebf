package graft.tools

import org.apache.spark.sql.functions._
import graft.engine.Engine

/** Dev-only: diff command_gremlin_simplepath against its oracle shape
  * to locate culled-but-expected paths. */
object SpProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Engine.session("graft-sp-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val got = graft.SparkEntry.queries("command_gremlin_simplepath")(spark, dir)
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val exp = o.as("o1").join(o.as("o2"),
        col("o1.o_custkey") === col("o2.o_custkey"))
      .where(col("o1.o_orderkey") =!= col("o2.o_orderkey"))
      .select(concat_ws("->", col("o1.o_orderkey"), col("o1.o_custkey"),
        col("o2.o_orderkey")).as("path"))
    val missing = exp.except(got)
    println("missing count: " + missing.count())
    missing.show(10, false)
    val extra = got.except(exp)
    println("extra count: " + extra.count())
    extra.show(5, false)
    spark.stop()
  }
}
