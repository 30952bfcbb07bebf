package graft

import graft.spec.ComponentSpec
import org.apache.spark.sql.functions._

/** Graph-analytics stages over the vertices/edges contract. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def withEdges() = {
    val ctx = newCtx()
    ctx.addEdges(Seq(("a", "x"), ("b", "x"), ("a", "y"))
      .toDF("src", "dst").withColumn("label", lit("e")))
    ctx
  }

  test("graphdegree: out/in/both over the edges table") {
    val ctx = withEdges()
    def deg(dir: String) =
      graft.graph.GraphStages.graphDegree(
        ComponentSpec("graphdegree", Map("direction" -> dir)), ctx)(
        spark.emptyDataFrame)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(deg("out") == Map("a" -> 2L, "b" -> 1L))
    assert(deg("in") == Map("x" -> 2L, "y" -> 1L))
    assert(deg("both") == Map("a" -> 2L, "b" -> 1L, "x" -> 2L, "y" -> 1L))
  }

  test("pagerank: hand-computed fixpoint on a 2-node chain") {
    val ctx = newCtx()
    ctx.addEdges(Seq(("a", "b")).toDF("src", "dst").withColumn("label", lit("e")))
    val pr = graft.graph.GraphStages.pageRank(
      ComponentSpec("pagerank", Map("iterations" -> 5)), ctx)(spark.emptyDataFrame)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // a has no in-edges: (1-d)/2 = 0.075 from round 1 on;
    // b = 0.075 + 0.85 * 0.075 = 0.13875 once a stabilizes
    assert(math.abs(pr("a") - 0.075) < 1e-12)
    assert(math.abs(pr("b") - 0.13875) < 1e-12)
  }

  private def motifRun(ctx: graft.engine.EtlContext, opts: (String, Any)*) =
    graft.graph.GraphStages.motif(
      ComponentSpec("motif", opts.toMap), ctx)(spark.emptyDataFrame)

  test("motif: chain, V-shape, label filter, edge-name column, where") {
    val ctx = newCtx()
    ctx.addEdges((Seq(("a", "b", "knows"), ("b", "c", "knows"),
      ("a", "c", "likes"), ("d", "c", "knows")))
      .toDF("src", "dst", "label"))
    // two-hop chain
    val chain = motifRun(ctx, "pattern" -> "(x)-[:knows]->(y); (y)-[:knows]->(z)")
    assert(chain.columns.toSeq == Seq("x", "y", "z"))
    assert(chain.as[(String, String, String)].collect().toSet ==
      Set(("a", "b", "c")))
    // V-shape with de-mirroring where; columns in first-appearance
    // order (p, t, q)
    val v = motifRun(ctx, "pattern" -> "(p)-[:knows]->(t); (q)-[:knows]->(t)",
      "where" -> "p < q")
    assert(v.columns.toSeq == Seq("p", "t", "q"))
    assert(v.select("p", "q", "t").as[(String, String, String)]
      .collect().toSet == Set(("b", "d", "c")))
    // named edge emits its label column; no label constraint → all edges
    val named = motifRun(ctx, "pattern" -> "(a)-[e]->(c)")
      .where(col("a") === "a" && col("c") === "c")
    assert(named.columns.toSeq == Seq("a", "c", "e_label"))
    assert(named.select("e_label").as[String].collect().toSeq == Seq("likes"))
    // unparsable term is a typed error
    val err = intercept[RuntimeException](motifRun(ctx, "pattern" -> "a->b"))
    assert(err.getMessage.contains("cannot parse"))
  }

  test("motif: undirected terms and negated terms") {
    val ctx = newCtx()
    ctx.addEdges(Seq(("a", "b", "knows"), ("b", "c", "knows"),
      ("c", "b", "knows"), ("a", "d", "likes"))
      .toDF("src", "dst", "label"))
    // undirected: (x)-[]-(y) matches either orientation
    val und = motifRun(ctx, "pattern" -> "(x)-[:knows]-(y)")
      .as[(String, String)].collect().toSet
    assert(und == Set(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")))
    // a self-loop EDGE appears once in an undirected match, not twice
    val ctx2 = newCtx()
    ctx2.addEdges(Seq(("s", "s", "knows"), ("s", "t", "knows"))
      .toDF("src", "dst", "label"))
    val loops = graft.graph.GraphStages.motif(
      ComponentSpec("motif", Map("pattern" -> "(x)-[:knows]-(y)")),
      ctx2)(spark.emptyDataFrame).collect()
    assert(loops.length == 3) // (s,s) once + (s,t) + (t,s)
    // negation over a chain: keep two-hop paths with no closing edge
    // z→x. All three chains here lack one (c→a, b→b, c→c absent).
    val noTri = motifRun(ctx,
      "pattern" -> "(x)-[:knows]->(y); (y)-[:knows]->(z); !(z)-[]->(x)")
      .select("x", "y", "z").as[(String, String, String)].collect().toSet
    assert(noTri == Set(("a", "b", "c"), ("b", "c", "b"), ("c", "b", "c")))
    // negation that removes: ! (y)->(x) kills mutual pairs
    val oneWay = motifRun(ctx, "pattern" -> "(x)-[:knows]->(y); !(y)-[]->(x)")
      .as[(String, String)].collect().toSet
    assert(oneWay == Set(("a", "b"))) // b↔c are mutual, dropped
    // a negated term must bind to the positive pattern
    val e = intercept[Exception](motifRun(ctx,
      "pattern" -> "(x)-[:knows]->(y); !(q)-[]->(x)"))
    assert(e.getMessage.contains("not bound"))
  }

  test("motif: self-loop term and shared-vertex join across terms") {
    val ctx = newCtx()
    ctx.addEdges(Seq(("s", "s", "self"), ("s", "t", "out"))
      .toDF("src", "dst", "label"))
    val loops = motifRun(ctx, "pattern" -> "(v)-[:self]->(v); (v)-[:out]->(w)")
      .as[(String, String)].collect().toSet
    assert(loops == Set(("s", "t")))
  }

  test("graphneighbors: one-hop expansion, sorted distinct, left join") {
    val ctx = withEdges()
    val in = Seq("a", "b", "z").toDF("id")
    val out = graft.graph.GraphStages.graphNeighbors(
      ComponentSpec("graphneighbors", Map("idField" -> "id")), ctx)(in)
      .orderBy("id")
      .collect().map(r => r.getString(0) -> Option(r.getSeq[String](1)).map(_.toList))
    assert(out.toSeq == Seq(
      "a" -> Some(List("x", "y")),
      "b" -> Some(List("x")),
      "z" -> None)) // no edges → null neighbors, row passes through
  }
}
