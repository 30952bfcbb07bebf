package graft.tools

import graft.engine.{Engine, EtlContext}
import org.apache.spark.sql.functions._

/** Dev probe: measures recall of the approximate similarity/dedup paths
  * against their exact counterparts at a given scale dir — used to pick
  * the verdict-query thresholds (driver-checkable recall gates). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Engine.session("graft-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    def ctx() = { val c = new EtlContext(spark); Engine.registerSfTables(c, sfDir); c }
    def run(json: String) = Engine.runJson(ctx(), json)

    val emb = s"""{"source": {"file": {"path": "$sfDir/embeddings.parquet"}},
      "extractor": {"parquet": {}}, "loader": {"memory": {}},"""
    val exact = run(s"""$emb "transformers": [{"similarity":
      {"idField": "vec_id", "field": "embedding", "k": 5}}]}""")
      .select("q_id", "n_id")
    val lsh = run(s"""$emb "transformers": [{"similaritylsh": {"idField": "vec_id",
      "field": "embedding", "k": 5, "nBits": 16, "bands": 4}}]}""")
      .select("q_id", "n_id")
    val total = exact.count().toDouble
    val lshHits = lsh.join(exact, Seq("q_id", "n_id"), "left_semi").count()
    println(f"similarity_lsh recall@5 = ${lshHits / total}%.4f ($lshHits/${total.toLong})")
    // IVF parameter sweep: recall@5 per (nCells, nProbe, lloydIters,
    // trainRows) — used to pick the verdict-floor configuration
    for ((nc, np, li, tr) <- Seq((16, 6, 3, 640), (16, 8, 5, 1280),
      (16, 9, 5, 1280), (16, 10, 5, 1280), (32, 14, 5, 2048),
      (32, 18, 5, 2048), (24, 12, 5, 1536), (12, 7, 5, 1280),
      (8, 5, 5, 1280), (8, 6, 5, 1280))) {
      val t0 = System.nanoTime()
      val ivf = run(s"""$emb "transformers": [{"similarityivf": {"idField": "vec_id",
        "field": "embedding", "k": 5, "nCells": $nc, "nProbe": $np,
        "lloydIters": $li, "trainRows": $tr}}]}""")
        .select("q_id", "n_id")
      val hits = ivf.join(exact, Seq("q_id", "n_id"), "left_semi").count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"similarity_ivf nCells=$nc nProbe=$np lloyd=$li train=$tr " +
        f"recall@5 = ${hits / total}%.4f ($hits/${total.toLong}) wall=$t%.2fs")
    }

    val exactPairs = run(s"""$emb "transformers": [{"cosinedup": {"idField": "vec_id",
      "field": "embedding", "threshold": 0.4, "exact": true}}]}""").select("a", "b")
    val lshPairs = run(s"""$emb "transformers": [{"cosinedup": {"idField": "vec_id",
      "field": "embedding", "threshold": 0.4, "nBits": 16, "bands": 4}}]}""").select("a", "b")
    val pTotal = exactPairs.count().toDouble
    val pHits = lshPairs.join(exactPairs, Seq("a", "b"), "left_semi").count()
    val pPrec = lshPairs.join(exactPairs, Seq("a", "b"), "left_anti").count()
    println(f"cosine_dup recall = ${pHits / pTotal}%.4f ($pHits/${pTotal.toLong}), false-pos = $pPrec")

    // simhash: native vs HOF signature differential over documents
    graft.functions.VectorExpressions.ensure(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val mism = docs.select(
      graft.functions.VectorExpressions.simHash64(col("text")).as("n"),
      graft.dedup.DedupStages.simhash64(col("text")).as("h"))
      .where(col("n") =!= col("h")).count()
    println(s"simhash native-vs-hof mismatches = $mism")
    spark.stop()
  }
}
