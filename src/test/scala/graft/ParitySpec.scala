package graft

import graft.engine.Engine
import org.apache.spark.sql.functions._

/** Reference-surface parity checks: the `orientdb` loader config shape,
  * the stdin source, and the CLI entry with `-NAME=value` vars. */
class ParitySpec extends SparkSpec {

  test("orientdb loader, document mode: plocal dbURL → parquet class dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft_odb").toString
    Engine.runJson(newCtx(), s"""{
      "source": {"file": {"path": "$sfDir/nation.parquet"}},
      "extractor": {"parquet": {}},
      "loader": {"orientdb": {"dbURL": "plocal:$dir", "class": "nations"}} }""")
    assert(spark.read.parquet(s"$dir/nations").count() == 25)
  }

  test("orientdb loader, graph mode: writes vertices/edges pair") {
    val dir = java.nio.file.Files.createTempDirectory("graft_odbg").toString
    Engine.runJson(newCtx(), s"""{
      "source": {"file": {"path": "$sfDir/orders.parquet"}},
      "extractor": {"parquet": {}},
      "transformers": [
        {"vertex": {"class": "order", "idField": "o_orderkey"}},
        {"edge": {"joinFieldName": "o_custkey", "lookup": "customer.c_custkey",
                  "class": "placed"}}],
      "loader": {"orientdb": {"dbURL": "plocal:$dir", "dbType": "graph"}} }""")
    assert(spark.read.parquet(s"$dir/vertices").count() > 0)
    val edges = spark.read.parquet(s"$dir/edges")
    assert(edges.columns.sorted.toSeq == Seq("dst", "label", "src"))
    assert(edges.count() > 0)
  }

  test("orientdb loader: declared columns validate and cast (DDL checks)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ddl").toString
    val err = intercept[IllegalArgumentException] {
      Engine.runJson(newCtx(), s"""{
        "source": {"file": {"path": "$sfDir/nation.parquet"}},
        "extractor": {"parquet": {}},
        "loader": {"parquet": {"path": "$dir/out",
          "columns": ["n_nationkey:integer", "no_such_col:string"]}} }""")
    }
    assert(err.getMessage.contains("no_such_col"))
  }

  test("input source: stdin lines") {
    val oldIn = System.in
    try {
      System.setIn(new java.io.ByteArrayInputStream("l1\nl2\n".getBytes("UTF-8")))
      val out = Engine.runJson(newCtx(), """{
        "source": {"input": {}},
        "extractor": {"row": {}},
        "loader": {"memory": {}} }""")
      assert(out.count() == 2)
    } finally System.setIn(oldIn)
  }

  test("CLI Main: config file + -NAME=value variable interpolation") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cli").toString
    val cfg = s"""{
      "source": {"file": {"path": "$$inDir/nation.parquet"}},
      "extractor": {"parquet": {}},
      "transformers": [{"field": {"fieldName": "tag", "value": "$$tag"}}],
      "loader": {"parquet": {"path": "$dir/out"}} }"""
    val cfgPath = s"$dir/config.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(cfgPath), cfg.getBytes("UTF-8"))
    Main.main(Array(cfgPath, s"-inDir=$sfDir", "-tag=gold"))
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == 25)
    assert(out.select("tag").distinct().head().getString(0) == "gold")
  }
}
