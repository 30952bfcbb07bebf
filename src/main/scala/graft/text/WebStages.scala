package graft.text

import graft.engine.EtlContext
import graft.spec.ComponentSpec
import graft.stages.Stages
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus curation stages: URL decomposition and per-domain quotas —
  * the CommonCrawl-style pipeline steps between raw fetch and text
  * cleaning. The reference has no analogue (its `field` transformer +
  * OrientDB SQL would do this per record); these are pure-projection /
  * single-shuffle batch operators.
  */
object WebStages {

  // Engine-portable URL parts via anchored regexes (identical semantics
  // when run as regexp_extract in DuckDB with a coalesce('') wrapper —
  // Spark returns '' on no match). Deliberately NOT java.net.URI: a
  // per-row exception-driven parser is slower and rejects the malformed
  // URLs a web corpus is full of; a non-matching row yields ''.
  private val SchemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
  private val HostRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
  private val PathRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)"
  private val QueryRe = "\\?([^#]*)"

  private[graft] def urlPart(url: Column, part: String): Column = part match {
    case "scheme" => regexp_extract(url, SchemeRe, 1)
    case "host" => regexp_extract(url, HostRe, 1)
    // registrable-ish domain: last two dot-labels of the host (good
    // enough for quota grouping without a public-suffix list, which
    // would be a broadcast lookup in a production deployment)
    case "domain" => regexp_extract(urlPart(url, "host"),
      "([^.]+\\.[^.]+)$", 1)
    case "path" => regexp_extract(url, PathRe, 1)
    case "query" => regexp_extract(url, QueryRe, 1)
    case other => sys.error(s"urlparse: unknown part '$other' " +
      "(scheme|host|domain|path|query)")
  }

  /** `urlparse`: decompose a URL column into `<prefix><part>` columns.
    * Options: `field` (default url), `parts` (default [host, domain,
    * path]), `prefix` (default `url_`). Pure per-row regex projection —
    * fuses into the scan, no shuffle, codegen'd. */
  def urlparse(spec: ComponentSpec, ctx: EtlContext): DataFrame => DataFrame =
    Stages.common(spec, ctx) { df =>
      val field = spec.strOr("field", "url")
      val prefix = spec.strOr("prefix", "url_")
      val parts = spec.strList("parts") match {
        case Nil => Seq("host", "domain", "path")
        case ps => ps
      }
      parts.foldLeft(df) { (d, p) =>
        d.withColumn(prefix + p, urlPart(col(field), p))
      }
    }

  /** `groupcap`: cap the number of rows kept per group — the per-domain
    * quota of web curation (a boilerplate-heavy domain must not dominate
    * the corpus). Keeps the FIRST `maxPerGroup` rows per `groupField`
    * in ascending `orderField` order (deterministic; ties impossible
    * when orderField is the document key). Output: surviving input rows
    * unchanged.
    *
    * Scale shape: one shuffle on the group key + an in-partition sort
    * feeding a rank filter — the group-count distribution is exactly
    * what AQE's skew handling splits if a single domain is huge; no
    * global sort, no collect. */
  def groupcap(spec: ComponentSpec, ctx: EtlContext): DataFrame => DataFrame =
    Stages.common(spec, ctx) { df =>
      val group = spec.str("groupField")
        .getOrElse(sys.error("groupcap: groupField required"))
      val order = spec.str("orderField")
        .getOrElse(sys.error("groupcap: orderField required"))
      val cap = spec.int("maxPerGroup", -1)
      require(cap > 0, "groupcap: maxPerGroup required (> 0)")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(group)).orderBy(col(order).asc)
      df.withColumn("__gc_rank", row_number().over(w))
        .where(col("__gc_rank") <= cap)
        .drop("__gc_rank")
    }
}
