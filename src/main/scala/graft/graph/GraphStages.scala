package graft.graph

import graft.engine.EtlContext
import graft.spec.ComponentSpec
import graft.stages.Stages
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over the engine's property-graph contract
  * (`ctx.vertices` / `ctx.edges`, built by the `vertex`/`edge`
  * transformers — SURVEY.md §1.1, §2.3). The reference exposes graph
  * traversal via per-record Gremlin commands (OCommandTransformer.java:
  * 58-78, documented out of parity scope §2.7); these stages are the
  * Spark-native batch equivalents: set-oriented joins/aggregations over
  * the edges table, never per-record traversal.
  */
object GraphStages {

  /** `graphdegree`: vertex degrees from the accumulated edges table.
    * Options: `direction` ∈ out|in|both (default out), `label`
    * (optional edge-label filter). Output: (id, degree) — a query
    * stage (replaces the stream, like `command`). One hash aggregation;
    * map-side combine makes it shuffle one row per (partition, vertex). */
  def graphDegree(spec: ComponentSpec, ctx: EtlContext): DataFrame => DataFrame =
    Stages.common(spec, ctx) { _ =>
      val edges0 = ctx.edges.getOrElse(
        sys.error("graphdegree: no edges — apply an `edge` stage first"))
      val edges = spec.str("label").fold(edges0)(l => edges0.where(col("label") === l))
      val keyed = spec.strOr("direction", "out") match {
        case "out" => edges.select(col("src").as("id"))
        case "in" => edges.select(col("dst").as("id"))
        case "both" => edges.select(col("src").as("id"))
          .union(edges.select(col("dst").as("id")))
        case other => sys.error(s"graphdegree: unknown direction $other")
      }
      keyed.groupBy("id").agg(count(lit(1)).as("degree"))
    }

  /** `graphneighbors`: one-hop neighbor expansion — for each vertex id
    * in the input stream (column `idField`), the sorted distinct
    * neighbor ids along `direction`. The batch form of a Gremlin
    * `g.v(x).out()` step: ONE join against the edges table instead of
    * per-record traversal. Output: input columns + `neighbors`
    * (array<string>). */
  def graphNeighbors(spec: ComponentSpec, ctx: EtlContext): DataFrame => DataFrame =
    Stages.common(spec, ctx) { df =>
      val edges0 = ctx.edges.getOrElse(
        sys.error("graphneighbors: no edges — apply an `edge` stage first"))
      val edges = spec.str("label").fold(edges0)(l => edges0.where(col("label") === l))
      val idField = spec.strOr("idField", "id")
      val (from, to) = spec.strOr("direction", "out") match {
        case "out" => ("src", "dst")
        case "in" => ("dst", "src")
        case other => sys.error(s"graphneighbors: unknown direction $other")
      }
      val nbrs = edges.select(col(from).as("__gk"), col(to).as("__gn"))
        .groupBy("__gk")
        .agg(array_distinct(sort_array(collect_list(col("__gn")))).as("neighbors"))
      df.join(nbrs, col(idField).cast("string") === col("__gk"), "left")
        .drop("__gk")
    }
}
