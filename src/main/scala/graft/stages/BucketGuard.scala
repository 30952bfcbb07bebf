package graft.stages

import graft.engine.EtlContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew guard for LSH band-bucket self-joins (minhash / simhash /
  * cosinedup / similaritylsh).
  *
  * A degenerate bucket — boilerplate-heavy corpora produce them — makes
  * the band equi-join go O(bucket²): one hot key lands in one task and
  * the stage never finishes at scale. The guard counts rows per bucket
  * key, DROPS buckets above `maxBucket`, and reports how many buckets
  * were dropped through the engine's observe plumbing (zero extra jobs:
  * the metric rides the pipeline's terminal action, and the hot-bucket
  * set is broadcast — tiny by definition — so the anti-join adds no
  * shuffle of the banded stream beyond the count aggregation, which
  * shuffles on the SAME key the self-join needs anyway).
  *
  * Semantics note (documented trade): dropping a bucket loses candidate
  * pairs from that band only; identical-document clusters share ALL
  * bands, so run exact dedup first (the standard pre-pass) and tune
  * `maxBucket` down for boilerplate-heavy corpora. `maxBucket <= 0`
  * disables the guard.
  *
  * Reference-for-intent: the reference guards its per-record lookup hot
  * path with a bounded cache (OAbstractLookupTransformer.java:70-104);
  * this is the plan-level analogue for the bucketed join.
  */
object BucketGuard {

  val DefaultMaxBucket = 100000

  def capBuckets(banded: DataFrame, keys: Seq[String], maxBucket: Int,
                 ctx: EtlContext, stage: String): DataFrame = {
    if (maxBucket <= 0) banded
    else {
      val keyCols = keys.map(col)
      val obs = ctx.newObservation(s"${stage}_hot_buckets")
      ctx.registerCheck(ctx.PendingCheck(obs, "hot_buckets", "warning",
        s"[graft $stage] band buckets over maxBucket=$maxBucket dropped"))
      val hot = banded.groupBy(keyCols: _*).agg(count(lit(1)).as("__bc"))
        .observe(obs,
          sum(when(col("__bc") > maxBucket, 1L).otherwise(0L)).as("hot_buckets"))
        .where(col("__bc") > maxBucket)
        .select(keyCols: _*)
      banded.join(broadcast(hot), keys, "left_anti")
    }
  }
}
