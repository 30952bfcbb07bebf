package graft.tools

import graft.engine.{Engine, EtlContext}

/** Dev probe (r14): locate where command_gremlin's wall time goes —
  * each leg cuts one stage off the chain. */
object GremTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("graft-grem-time")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm
    def run(tag: String, cmd: String, sel: Boolean): Unit = {
      def once(): Double = {
        val c = new EtlContext(spark)
        Engine.registerSfTables(c, dir)
        val t0 = System.nanoTime()
        val df = Engine.runJson(c, s"""{
          "source": {"file": {"path": "$dir/orders.parquet"}},
          "extractor": {"parquet": {}},
          "transformers": [
            {"vertex": {"class": "order", "idField": "o_orderkey"}},
            {"edge": {"joinFieldName": "o_custkey", "lookup": "customer.c_custkey",
                      "class": "placed", "direction": "out"}},
            {"command": {"command": "$cmd"}}],
          "loader": {"memory": {}} }""")
        val acted = if (sel) df.select("id", "label").orderBy("id") else df
        acted.count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      once()
      println(f"$tag%-28s ${Seq(once(), once()).min}%6.2f s")
    }
    run("full (2 hops + sort)", "g.V().hasLabel('order').out('placed').in('placed')", sel = true)
    run("2 hops, no sort", "g.V().hasLabel('order').out('placed').in('placed')", sel = false)
    run("1 hop out", "g.V().hasLabel('order').out('placed')", sel = false)
    run("0 hops (V + hasLabel)", "g.V().hasLabel('order')", sel = false)
    spark.stop()
  }
}
