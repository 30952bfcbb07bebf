package graft.tools

import graft.engine.Engine

/** Dev-only: locate the wall-clock inside command_gremlin_local
  * (the heaviest suite anchor) — hop joins vs the per-traverser
  * top-n window vs the trailing groupCount. */
object LocalProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("graft-local-probe")
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    spark.range(100000).selectExpr("sum(id)").collect()
    def run(tag: String, cmd: String): Unit = {
      val c = new graft.engine.EtlContext(spark)
      Engine.registerSfTables(c, dir)
      time(tag) {
        Engine.runJson(c, s"""{
          "source": {"file": {"path": "$dir/orders.parquet"}},
          "extractor": {"parquet": {}},
          "transformers": [
            {"vertex": {"class": "order", "idField": "o_orderkey"}},
            {"edge": {"joinFieldName": "o_custkey", "lookup": "customer.c_custkey",
                      "class": "placed", "direction": "out"}},
            {"command": {"command": "$cmd"}}],
          "loader": {"memory": {}} }""").count()
      }
    }
    for (rep <- 1 to 3) {
      println(s"--- rep $rep ---")
      run("hops only", "g.V().hasLabel('order').out('placed').in('placed')")
      run("hops+count", "g.V().hasLabel('order').out('placed').in('placed').count()")
      run("local limit", "g.V().hasLabel('order').local(out('placed').in('placed').limit(2))")
      run("full query", "g.V().hasLabel('order').local(out('placed').in('placed').limit(2)).groupCount()")
    }
    spark.stop()
  }
}
