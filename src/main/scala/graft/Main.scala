package graft

import graft.engine.{Engine, EtlContext}

/** CLI entry — parity with the reference's primary path
  * (OETLProcessor.main, OETLProcessor.java:189-254):
  *
  *   graft.Main config.json [-NAME=value ...]
  *
  * `-NAME=value` arguments become context variables (:214-219) visible
  * to `$NAME` interpolation throughout the config. The config is the
  * same 7-section JSON surface (`config/begin/source/extractor/
  * transformers/loader/end`), compiled to one Spark plan.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val (flags, positional) = args.partition(_.startsWith("-"))
    require(positional.length == 1,
      "usage: graft.Main <config.json> [-NAME=value ...]")
    // reuse an already-running session (embedding/test harnesses) and
    // only stop one we created ourselves
    val preExisting = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession).isDefined
    val spark = Engine.session("graft-etl")
    spark.sparkContext.setLogLevel("WARN")
    val ctx = new EtlContext(spark)
    flags.foreach { f =>
      val eq = f.indexOf('=')
      require(eq > 1, s"bad arg $f — expected -NAME=value")
      ctx.vars.put(f.substring(1, eq), f.substring(eq + 1))
    }
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(positional.head)), "UTF-8")
    try Engine.runJson(ctx, json)
    finally if (!preExisting) spark.stop()
  }
}
