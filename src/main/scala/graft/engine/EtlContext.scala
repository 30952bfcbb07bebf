package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.LongAccumulator
import scala.collection.concurrent.TrieMap

/** Run-scoped context for one pipeline execution.
  *
  * Mirrors the reference's `OBasicCommandContext` threaded through all
  * components (OETLProcessor.java:61, OAbstractETLComponent.java:420-432)
  * — but driver-side and immutable-per-plan: variables that depend on the
  * row compile to Columns; everything else is resolved at plan-build time
  * (SURVEY.md §7.5 "mutable context during the run").
  */
final class EtlContext(val spark: SparkSession) {
  /** Driver-side variables: `let` blocks, CLI `-NAME=value` args
    * (OETLProcessor.java:214-219), `output:` captures. */
  val vars = TrieMap.empty[String, Any]

  /** Named tables visible to `lookup`/`command` SQL — the Spark analogue
    * of the reference's target-database classes. */
  val tables = TrieMap.empty[String, DataFrame]

  /** `output:` captured DataFrames (OAbstractTransformer.java:63-75). */
  val captured = TrieMap.empty[String, DataFrame]

  /** Graph accumulation for vertex/edge transformers: the two-DataFrame
    * property-graph contract (SURVEY.md §1.3). */
  var vertices: Option[DataFrame] = None
  var edges: Option[DataFrame] = None

  /** Stats parity with OETLProcessorStats (OETLProcessor.java:75-89):
    * distributed counters, safe to bump from executors. */
  val warnings: LongAccumulator = spark.sparkContext.longAccumulator("graft.warnings")
  val errors: LongAccumulator = spark.sparkContext.longAccumulator("graft.errors")

  def varMap: Map[String, Any] = vars.toMap

  def registerTable(name: String, df: DataFrame): Unit = {
    tables.put(name, df)
    df.createOrReplaceTempView(name)
  }

  def table(name: String): DataFrame =
    tables.getOrElse(name, spark.table(name))

  def addVertices(df: DataFrame): Unit =
    vertices = Some(vertices.map(v => unionByNameLoose(v, df)).getOrElse(df))
  def addEdges(df: DataFrame): Unit =
    edges = Some(edges.map(e => unionByNameLoose(e, df)).getOrElse(df))

  private def unionByNameLoose(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)
}

/** Pipeline abort requested by `flow: halt` / unresolvedLinkAction HALT —
  * parity with OETLProcessHaltedException (OETLPipeline.java:121-139). */
final class EtlHaltException(msg: String) extends RuntimeException(msg)
