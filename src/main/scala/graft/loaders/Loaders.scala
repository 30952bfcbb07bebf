package graft.loaders

import graft.engine.EtlContext
import graft.expr.OrientExpr
import graft.spec.ComponentSpec
import org.apache.spark.sql.DataFrame

/** Loaders (sinks) — SURVEY.md §2.4.
  *
  * The reference's `orientdb` loader (OOrientDBLoader.java:48-597) is a
  * record-at-a-time save with `batchCommit` interval commits; the Spark
  * mapping is a bulk writer: JDBC (the BASELINE-designated writer, with
  * `batchsize` ≈ batchCommit), parquet tables for document mode, and the
  * vertices/edges table pair for graph mode. `tx`/rollback/retry become
  * Spark task retries + idempotent overwrite writes (SURVEY.md §4).
  */
object Loaders {

  def load(ctx: EtlContext, spec: ComponentSpec, df: DataFrame): Unit = {
    val vars = ctx.varMap
    spec.name match {
      // `output` loader (OOutputLoader.java:27-52): console. Bounded —
      // never collect the full dataset to the driver.
      case "output" => df.show(spec.int("limit", 20), truncate = false)

      // `memory` loader (OMemoryLoader.java:14-69, fork addition): hand
      // the result to a parent pipeline. We register the *plan*, not a
      // driver-side collect — the 100 TB-safe equivalent.
      case "memory" =>
        val name = spec.strOr("name", "loaded")
        ctx.registerTable(name, df)
        ctx.captured.put(name, df)

      case "parquet" =>
        val path = OrientExpr.resolveString(
          spec.str("path").getOrElse(sys.error("parquet loader: path required")), vars)
        var w = df.write.mode(spec.strOr("mode", "overwrite"))
        val parts = spec.strList("partitionBy")
        if (parts.nonEmpty) w = w.partitionBy(parts: _*)
        w.parquet(path)

      case "jdbc" =>
        val url = spec.str("url").getOrElse(sys.error("jdbc loader: url required"))
        var w = df.write.format("jdbc")
          .option("url", OrientExpr.resolveString(url, vars))
          .option("dbtable", spec.str("table").getOrElse(sys.error("jdbc loader: table required")))
          // batchCommit parity (OOrientDBLoader.java:181-194)
          .option("batchsize", spec.int("batchCommit", 1000).toString)
          .option("isolationLevel", "NONE") // wal:false analogue for bulk load
        spec.str("driver").foreach(d => w = w.option("driver", d))
        spec.str("userName").foreach(u => w = w.option("user", u))
        spec.str("userPassword").foreach(p => w = w.option("password", p))
        w.mode(spec.strOr("mode", "append")).save()

      // graph mode of the orientdb loader: persist the two-DataFrame
      // property-graph contract
      case "graph" =>
        val dir = OrientExpr.resolveString(
          spec.str("path").getOrElse(sys.error("graph loader: path required")), vars)
        ctx.vertices.foreach(_.write.mode("overwrite").parquet(s"$dir/vertices"))
        ctx.edges.foreach(_.write.mode("overwrite").parquet(s"$dir/edges"))

      case other => sys.error(s"unknown loader $other")
    }
  }
}
