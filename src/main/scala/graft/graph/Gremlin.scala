package graft.graph

import graft.engine.EtlContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gremlin-subset translator for the `command` transformer — closes the
  * literal-script gap with the reference's Gremlin commands
  * (OCommandTransformer.java:58-78) for the chains legacy configs
  * actually carry, while keeping execution fully set-oriented: every
  * step compiles to a join/filter over the vertices/edges contract, the
  * same frames the `motif` transformer queries. No per-record traversal.
  *
  * Supported subset (anything richer is a NAMED migration error):
  *  - `g.V()` — the vertex frame;
  *  - `.hasLabel('x')` / `.has('col', value)` — filters over the
  *    current frame's columns (property filters bind to the columns
  *    present at that point in the chain);
  *  - `.out('label'?)` / `.in('label'?)` / `.both('label'?)` — one-hop
  *    traversal along the edges table, optionally label-constrained;
  *    bag semantics like Gremlin (one row per path, duplicates kept);
  *    after a hop the frame is the reached ids re-attached to
  *    `(id, label)` of any registered vertices (left join — ids without
  *    a registered vertex survive with a null label);
  *  - `.dedup()` — distinct over the current frame;
  *  - `.limit(n)` — first n rows (like Gremlin, no defined order —
  *    pair with a downstream sort for determinism);
  *  - `.values('col')` — project one column as `value` (later steps
  *    that need `id` will fail analysis, as in Gremlin's value space);
  *  - `.count()` — terminal 1-row count.
  *
  * Scale shape: a K-hop chain is K shuffle equi-joins on vertex ids —
  * exactly the plan the equivalent motif pattern produces; AQE handles
  * broadcast/skew. Loops (`repeat`), path state, and lambdas are out of
  * scope by design — those migrate to `motif` patterns or the graph
  * stages, which is where the batch engine expresses them well.
  */
object Gremlin {

  /** A literal Gremlin script is recognized by its `g.` head. */
  def applies(script: String): Boolean = script.trim.startsWith("g.")

  private val Step = """\.\s*(\w+)\s*\(([^)]*)\)""".r

  def run(ctx: EtlContext, script: String): DataFrame = {
    val s = script.trim.stripSuffix(";").trim
    val body = s.drop(1) // past 'g'
    val steps = Step.findAllMatchIn(body)
      .map(m => (m.group(1), parseArgs(m.group(2)))).toList
    // the steps must tile the whole script — a lambda, nested call or
    // stray text means we'd silently drop semantics; refuse instead
    val consumed = Step.findAllMatchIn(body).map(_.matched).mkString
    if (!s.startsWith("g") || consumed != body || steps.isEmpty)
      fail(s"cannot parse '$script' as a simple step chain")
    if (steps.head != (("V", Nil)))
      fail(s"traversal must start with g.V() (got g.${steps.head._1}(...))")

    val vertices = ctx.vertices.getOrElse(
      fail("no vertices — apply a `vertex` stage first"))
    // re-attachment key: one row per DISTINCT (id, label). An id
    // registered under two classes denotes two class-vertices in the
    // reference's model (each OrientDB class row is its own vertex), so
    // a hop reaching that id legitimately yields one row per class —
    // and `hasLabel` after a hop must match EITHER class, never
    // silently lose one. Duplicate registrations of the SAME (id,
    // label) do collapse (that's re-registration, not a second vertex).
    val idLabel = vertices.select(col("id"), col("label")).distinct()
    var frame = vertices
    steps.tail.zipWithIndex.foreach { case (step, i) =>
      val terminal = i == steps.tail.length - 1
      step match {
        case ("hasLabel", Seq(l: String)) => frame = frame.where(col("label") === l)
        case ("has", Seq(k: String, v)) => frame = frame.where(col(k) === lit(v))
        case ("out", args) if args.length <= 1 =>
          frame = hop(ctx, frame, idLabel, args.headOption.map(_.toString), "src", "dst")
        case ("in", args) if args.length <= 1 =>
          frame = hop(ctx, frame, idLabel, args.headOption.map(_.toString), "dst", "src")
        case ("both", args) if args.length <= 1 =>
          frame = hop(ctx, frame, idLabel, args.headOption.map(_.toString), "src", "dst")
            .unionByName(hop(ctx, frame, idLabel, args.headOption.map(_.toString), "dst", "src"))
        case ("dedup", Nil) => frame = frame.distinct()
        case ("limit", Seq(n: Long)) =>
          if (n < 0 || n > Int.MaxValue) fail(s"limit($n) out of range")
          frame = frame.limit(n.toInt)
        case ("values", Seq(c: String)) =>
          frame = frame.select(col(c).as("value"))
        case ("count", Nil) =>
          if (!terminal) fail("count() must be the last step")
          frame = frame.agg(count(lit(1)).as("count"))
        case (other, args) =>
          fail(s"unsupported step '$other(${args.mkString(", ")})' — the " +
            "translated subset is V/hasLabel/has/out/in/both/dedup/limit/" +
            "values/count; richer " +
            "traversals migrate to the `motif` transformer (pattern " +
            "\"(a)-[e:label]->(b); …\") or the graph stages " +
            "(graphdegree/graphneighbors/pagerank)")
      }
    }
    frame
  }

  /** One traversal hop: join the current frame's ids against the edges
    * table, land on the far endpoint, re-attach registered vertex
    * labels. Bag semantics (no distinct) — Gremlin's traverser count. */
  private def hop(ctx: EtlContext, frame: DataFrame, idLabel: DataFrame,
                  elabel: Option[String], from: String, to: String): DataFrame = {
    val edges0 = ctx.edges.getOrElse(
      fail("traversal step needs edges — apply an `edge` stage first"))
    val edges = elabel.fold(edges0)(l => edges0.where(col("label") === l))
    frame.select(col("id").as("__from"))
      .join(edges, col("__from") === col(from))
      .select(col(to).as("id"))
      .join(idLabel, Seq("id"), "left")
  }

  private def parseArgs(raw: String): List[Any] =
    raw.split(",").map(_.trim).filter(_.nonEmpty).toList.map { a =>
      if ((a.startsWith("'") && a.endsWith("'") && a.length >= 2) ||
          (a.startsWith("\"") && a.endsWith("\"") && a.length >= 2))
        a.substring(1, a.length - 1)
      else scala.util.Try(a.toLong).getOrElse(
        scala.util.Try(a.toDouble).getOrElse(
          fail(s"cannot parse argument '$a' (quoted string or number)")))
    }

  private def fail(why: String): Nothing = sys.error(s"gremlin: $why")
}
