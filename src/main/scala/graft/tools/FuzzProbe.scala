package graft.tools

import graft.engine.Engine
import org.apache.spark.sql.functions._

/** Dev probe: where does fuzzy_join wall-clock go — sizes and times of
  * each sub-plan (index grams, freq, prefix, candidates, verified). */
object FuzzProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("graft-fuzz-probe")
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    spark.range(100000).selectExpr("sum(id)").collect() // warm-up
    val ctx = new graft.engine.EtlContext(spark)
    def run(extra: (String, Any)*): Long = {
      val spec = graft.spec.ComponentSpec("fuzzyjoin", Map(
        "field" -> "c_name", "idField" -> "c_custkey",
        "maxDistance" -> 2, "probeIf" -> "c_custkey % 97 = 0") ++ extra.toMap)
      graft.text.FuzzyJoinStage.fuzzyjoin(spec, ctx)(
        spark.read.parquet(s"$dir/customer.parquet")).count()
    }
    time("full best (run 1)") { run() }
    time("full best (run 2)") { run() }
    // --- replicate internals to localize the cost (dev-only dup) ---
    val qn = 2; val d = 2; val k = d * qn + 1
    val df0 = spark.read.parquet(s"$dir/customer.parquet")
    def grams(c: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), length(c) - (qn - 1)),
        i => struct(c.substr(i, lit(qn)).as("g"), i.as("p")))
    val base = df0.select(col("c_custkey").as("__fid"), col("c_name").as("__fval"))
    val indexGrams = base.select(col("__fid"), col("__fval"),
      explode(grams(col("__fval"))).as("__gp"))
      .select(col("__fid"), col("__fval"), col("__gp.g").as("__g"), col("__gp.p").as("__fp"))
    val probes0 = df0.where(expr("c_custkey % 97 = 0"))
      .select(col("c_custkey").as("__pid"), col("c_name").as("__pval"))
    val probeGrams = probes0.select(col("__pid"), col("__pval"),
      explode(grams(col("__pval"))).as("__gp"))
      .select(col("__pid"), col("__pval"), col("__gp.g").as("__g"), col("__gp.p").as("__pp"))
    time("index grams") { indexGrams.count() }
    val freq = indexGrams.join(broadcast(probeGrams.select("__g").distinct()), Seq("__g"))
      .groupBy("__g").agg(count(lit(1)).as("__df"))
    time("freq") { freq.count() }
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__pid")
      .orderBy(col("__df").asc, col("__g").asc, col("__pp").asc)
    val prefix = probeGrams.join(broadcast(freq), Seq("__g"), "left")
      .na.fill(0L, Seq("__df"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k).select("__pid", "__pval", "__g", "__pp")
    time("prefix") { prefix.count() }
    val cand = indexGrams.join(broadcast(prefix), Seq("__g"))
      .where(col("__pid") =!= col("__fid") &&
        abs(col("__pp") - col("__fp")) <= d &&
        abs(length(col("__pval")) - length(col("__fval"))) <= d)
      .select("__pid", "__pval", "__fid", "__fval")
    time("cand pre-distinct") { cand.count() }
    val candD = cand.distinct()
    time("cand distinct") { candD.count() }
    time("verified") { candD
      .withColumn("dist", levenshtein(col("__pval"), col("__fval"), d))
      .where(col("dist") >= 0).count() }
    spark.stop()
  }
}
