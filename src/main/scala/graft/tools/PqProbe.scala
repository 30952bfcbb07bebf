package graft.tools

import graft.engine.{Engine, EtlContext}

/** Dev probe: IVF-PQ recall@5 vs the exact brute-force top-k across
  * (pqM, pqK, refine, nProbe) — picks the `similarity_ivfpq` verdict
  * floor the same way RecallProbe picked the IVF one. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Engine.session("graft-pq-probe")
    spark.sparkContext.setLogLevel("ERROR")
    def ctx() = { val c = new EtlContext(spark); Engine.registerSfTables(c, sfDir); c }
    def run(json: String) = Engine.runJson(ctx(), json)

    val emb = s"""{"source": {"file": {"path": "$sfDir/embeddings.parquet"}},
      "extractor": {"parquet": {}}, "loader": {"memory": {}},"""
    val exact = run(s"""$emb "transformers": [{"similarity":
      {"idField": "vec_id", "field": "embedding", "k": 5}}]}""")
      .select("q_id", "n_id").cache()
    val total = exact.count().toDouble
    for ((m, kc, rf, np) <- Seq((16, 64, 8, 24))) {
      val t0 = System.nanoTime()
      val pq = run(s"""$emb "transformers": [{"similarityivf": {"idField": "vec_id",
        "field": "embedding", "k": 5, "nCells": 32, "nProbe": $np,
        "lloydIters": 5, "trainRows": 2048,
        "pqM": $m, "pqK": $kc, "refine": $rf}}]}""")
        .select("q_id", "n_id")
      val hits = pq.join(exact, Seq("q_id", "n_id"), "left_semi").count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"ivfpq pqM=$m pqK=$kc refine=$rf nProbe=$np " +
        f"recall@5 = ${hits / total}%.4f ($hits/${total.toLong}) wall=$t%.2fs")
    }
    spark.stop()
  }
}
