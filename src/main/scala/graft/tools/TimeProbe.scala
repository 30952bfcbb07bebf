package graft.tools

import graft.engine.Engine

/** Dev-only: time arbitrary sub-plans of the verdict queries to locate
  * where the wall-clock goes (plan/stage overhead vs compute). */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("graft-time-probe")
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    def ctx() = new graft.engine.EtlContext(spark)
    // warm-up
    spark.range(100000).selectExpr("sum(id)").collect()

    val lshCfg = s"""{
      "source": {"file": {"path": "$dir/embeddings.parquet"}},
      "extractor": {"parquet": {}},
      "transformers": [{"similaritylsh": {"idField": "vec_id",
        "field": "embedding", "k": 5, "nBits": 16, "bands": 4}}],
      "loader": {"memory": {}} }"""
    val exactCfg = s"""{
      "source": {"file": {"path": "$dir/embeddings.parquet"}},
      "extractor": {"parquet": {}},
      "transformers": [{"similarity": {"idField": "vec_id",
        "field": "embedding", "k": 5}}],
      "loader": {"memory": {}} }"""
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    time("plain scan count") { emb.count() }
    time("plain scan count 2") { emb.count() }
    graft.functions.VectorExpressions.ensure(spark)
    time("sig projection") {
      emb.select(graft.functions.VectorExpressions.srpSig(col("embedding"), 16, 64)).count()
    }
    time("topk direct") {
      graft.similarity.SimilarityStages.topk(emb, emb, "vec_id", "embedding", 5).count()
    }
    time("topk direct 2") {
      graft.similarity.SimilarityStages.topk(emb, emb, "vec_id", "embedding", 5).count()
    }
    time("exact alone") { Engine.runJson(ctx(), exactCfg).count() }
    time("exact alone 2") { Engine.runJson(ctx(), exactCfg).count() }
    time("lsh approx alone") { Engine.runJson(ctx(), lshCfg).count() }
    time("lsh approx alone 2") { Engine.runJson(ctx(), lshCfg).count() }
    time("full verdict") {
      graft.SparkEntry.queries("similarity_lsh")(spark, dir).count()
    }
    time("ivf verdict") {
      graft.SparkEntry.queries("similarity_ivf")(spark, dir).count()
    }
    time("cosine_dup verdict") {
      graft.SparkEntry.queries("cosine_dup")(spark, dir).count()
    }
    spark.stop()
  }
}
