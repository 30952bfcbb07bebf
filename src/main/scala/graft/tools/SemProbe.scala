package graft.tools

import graft.engine.{Engine, EtlContext}
import graft.spec.ComponentSpec
import org.apache.spark.sql.functions._

/** Dev probe: semanticdedup recall vs exact pairs + kmeans training gain
  * at a scale dir — used to pick the driver-query verdict floors. */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Engine.session("graft-sem-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val ctx = new EtlContext(spark)
    Engine.registerSfTables(ctx, sfDir)
    val emb = ctx.table("embeddings")
    def stage(name: String, opts: (String, Any)*) =
      Engine.transformers(name)(ComponentSpec(name, opts.toMap), ctx)
    for (k <- Seq(4, 8, 16); thr <- Seq(0.4); np <- Seq(1, 2, 3)) {
      val pairs = stage("semanticdedup", "threshold" -> thr, "k" -> k,
        "emit" -> "pairs", "nProbe" -> np)(emb).select("a", "b")
      val exact = stage("cosinedup", "threshold" -> thr, "exact" -> true)(emb)
        .select("a", "b")
      val nE = exact.count(); val hit = exact.join(pairs, Seq("a", "b"), "left_semi").count()
      println(f"[sem] k=$k np=$np thr=$thr exact=$nE hit=$hit recall=${hit.toDouble / nE}%.3f")
    }
    for (k <- Seq(8)) {
      def meanSim(iters: Int) = stage("kmeans", "k" -> k, "lloydIters" -> iters)(emb)
        .agg(avg("centroid_sim")).head().getDouble(0)
      val i0 = meanSim(0); val i5 = meanSim(5)
      println(f"[km] k=$k meanSim iters0=$i0%.4f iters5=$i5%.4f gain=${i5 - i0}%.4f")
      val sizes = stage("kmeans", "k" -> k)(emb).groupBy("cluster").count()
        .orderBy("cluster").collect().map(r => r.getLong(1)).toSeq
      println(s"[km] k=$k cluster sizes: $sizes")
    }
    spark.stop()
  }
}
