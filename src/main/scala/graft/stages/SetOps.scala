package graft.stages

import graft.engine.EtlContext
import graft.spec.ComponentSpec
import org.apache.spark.sql.DataFrame

/** Relational set-combination transformers — `union` / `except` /
  * `intersect` against a named table or inline SELECT. The reference
  * pipeline model is strictly linear (one extractor feeding a
  * transformer chain, OETLProcessor.java); combining two flows there
  * means two ETL runs into one target. These stages make combination a
  * plan step instead, so Catalyst sees ONE tree and can push filters
  * into both branches and pick distributed set-op plans (hash
  * aggregate for DISTINCT variants, no driver materialization).
  *
  * Shared options: `right` (required — table name or SELECT).
  *  - `union`: `byName` (default true — match columns by NAME,
  *    positional when false), `allowMissingColumns` (default false,
  *    byName only — absent columns null-fill), `distinct` (default
  *    false = UNION ALL).
  *  - `except` / `intersect`: `all` (default false = SQL's DISTINCT
  *    semantics; true keeps multiplicity — EXCEPT ALL / INTERSECT
  *    ALL). Both require identical schemas (Spark enforces, the
  *    error names the sides).
  *
  * Scale: UNION ALL is a zero-shuffle plan concatenation; DISTINCT
  * variants and except/intersect hash-partition on the full row —
  * the same exchange a GROUP BY over the output would need, nothing
  * extra. */
object SetOps {

  private def rightOf(spec: ComponentSpec, ctx: EtlContext): DataFrame =
    ctx.tableOrSql(spec.str("right").getOrElse(
      sys.error(s"${spec.name}: `right` (table or SELECT) required")))

  def union(spec: ComponentSpec, ctx: EtlContext): DataFrame => DataFrame =
    Stages.common(spec, ctx) { df =>
      val right = rightOf(spec, ctx)
      val u =
        if (spec.bool("byName", dflt = true))
          df.unionByName(right,
            allowMissingColumns = spec.bool("allowMissingColumns", dflt = false))
        else df.union(right)
      if (spec.bool("distinct", dflt = false)) u.distinct() else u
    }

  def except(spec: ComponentSpec, ctx: EtlContext): DataFrame => DataFrame =
    Stages.common(spec, ctx) { df =>
      val right = rightOf(spec, ctx)
      if (spec.bool("all", dflt = false)) df.exceptAll(right)
      else df.except(right)
    }

  def intersect(spec: ComponentSpec, ctx: EtlContext): DataFrame => DataFrame =
    Stages.common(spec, ctx) { df =>
      val right = rightOf(spec, ctx)
      if (spec.bool("all", dflt = false)) df.intersectAll(right)
      else df.intersect(right)
    }
}
