package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.engine.Engine
import org.apache.spark.sql.functions._

/** `http` source against an embedded localhost server — including the
  * round-1 broken pairing with the `json` extractor (Sources routed the
  * URL into spark.read.json, which cannot open http). */
class HttpSourceSpec extends SparkSpec {

  private def withServer(path: String, body: String)(f: Int => Unit): Unit = {
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext(path, (ex: HttpExchange) => {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b); ex.close()
    })
    server.start()
    try f(server.getAddress.getPort) finally server.stop(0)
  }

  test("http + row: lines arrive as a dataset") {
    withServer("/lines", "a\nb\nc") { port =>
      val out = Engine.runJson(newCtx(), s"""{
        "source": {"http": {"url": "http://127.0.0.1:$port/lines"}},
        "extractor": {"row": {}},
        "loader": {"memory": {}} }""")
      assert(out.count() == 3)
    }
  }

  test("http + json extractor: array payload parsed via the fetched body") {
    val payload = """[{"id": 1, "v": "x"}, {"id": 2, "v": "y"}]"""
    withServer("/data.json", payload) { port =>
      val out = Engine.runJson(newCtx(), s"""{
        "source": {"http": {"url": "http://127.0.0.1:$port/data.json"}},
        "extractor": {"json": {}},
        "loader": {"memory": {}} }""")
      assert(out.count() == 2)
      assert(out.orderBy("id").select("v").collect().map(_.getString(0)).toSeq
        == Seq("x", "y"))
    }
  }

  test("http + csv transformer: header learned from fetched first line") {
    withServer("/t.csv", "k,name\n1,aa\n2,bb") { port =>
      val out = Engine.runJson(newCtx(), s"""{
        "source": {"http": {"url": "http://127.0.0.1:$port/t.csv"}},
        "extractor": {"row": {}},
        "transformers": [{"csv": {"columns": ["k:integer", "name:string"]}}],
        "loader": {"memory": {}} }""")
      assert(out.orderBy("k").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
        == Seq((1, "aa"), (2, "bb")))
    }
  }
}
