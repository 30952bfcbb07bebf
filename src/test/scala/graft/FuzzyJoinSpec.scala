package graft

import graft.spec.ComponentSpec
import graft.text.FuzzyJoinStage
import org.apache.spark.sql.functions._

/** fuzzyjoin — edit-distance record linkage via the rare-q-gram prefix
  * filter. The load-bearing property is COMPLETENESS: the candidate
  * filter must never lose a true match (insertions and deletions shift
  * gram positions; short strings fall outside the pigeonhole guarantee
  * entirely) — locked differentially against a brute-force cross join
  * on a corpus built to hit every edit type and the short-string path.
  * The scale property is the absence of any cartesian/nested-loop join
  * in the physical plan. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  // seeds + deterministic mutants: substitution, deletion, insertion,
  // double-edit, and a short-string family (len <= shortMax = 5 at
  // d=2, q=2) that exercises the length-band fallback
  private def corpus: Seq[(Long, String)] = {
    val seeds = (0 until 12).map(i => f"alpha-bravo-$i%03d")
    val mutants = seeds.zipWithIndex.flatMap { case (s, i) =>
      Seq(
        s.updated(3, 'X'),                    // substitution (dist 1)
        s.substring(1),                        // deletion at the front (dist 1)
        s.substring(0, 5) + "Q" + s.substring(5), // insertion (dist 1)
        s.updated(0, 'Z').updated(7, 'Z'))     // two substitutions (dist 2)
        .zipWithIndex.map { case (m, j) => (1000L + i * 10 + j, m) }
    }
    val shorts = Seq((5000L, "ab"), (5001L, "abc"), (5002L, "abcd"),
      (5003L, "abxd"), (5004L, "bc"), (5005L, "abcde"), (5006L, "zbcde"))
    seeds.zipWithIndex.map { case (s, i) => (i.toLong, s) } ++ mutants ++ shorts
  }

  private def run(mode: String, probeIf: Option[String] = None) = {
    val df = corpus.toDF("id", "name")
    val opts = Map[String, Any]("field" -> "name", "idField" -> "id",
      "maxDistance" -> 2, "mode" -> mode) ++
      probeIf.map("probeIf" -> _).toMap
    FuzzyJoinStage.fuzzyjoin(ComponentSpec("fuzzyjoin", opts), newCtx())(df)
  }

  test("pairs mode equals the brute-force cross join exactly (completeness + no false pairs)") {
    val df = corpus.toDF("id", "name")
    val got = run("pairs")
      .select("probe_id", "match_id", "dist")
      .as[(Long, Long, Long)].collect().toSet
    val b = df.select(col("id").as("bid"), col("name").as("bname"))
    val expected = df.crossJoin(b)
      .where(col("id") < col("bid"))
      .select(col("id"), col("bid"),
        levenshtein(col("name"), col("bname")).cast("bigint").as("dist"))
      .where(col("dist") <= 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(expected.nonEmpty, "corpus must actually contain near pairs")
    // every edit family must be represented, or the corpus stopped
    // testing what it claims to
    assert(expected.exists { case (a, bb, dd) => dd == 2 && a < 12 && bb >= 1000 })
    assert(expected.exists { case (a, _, _) => a >= 5000 }, "short family pairs")
    assert(got == expected,
      s"missed=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("best mode: one row per matched probe, minimum distance, deterministic tie-break") {
    val best = run("best", probeIf = Some("id < 12"))
      .select("probe_id", "match_id", "dist")
      .as[(Long, Long, Long)].collect().toSeq
    assert(best.map(_._1).distinct.size == best.size, "one row per probe")
    // every seed has dist-1 mutants; best must be dist 1
    assert(best.nonEmpty && best.forall(_._3 == 1L), s"expected dist-1 bests, got $best")
    // tie-break = (dist, match_val, match_id): recompute for one probe
    val cand = run("pairs", probeIf = Some("id = 0"))
      .select("match_val", "match_id", "dist")
      .as[(String, Long, Long)].collect().toSeq
    val want = cand.sortBy { case (v, i, dd) => (dd, v, i) }.head._2
    assert(best.find(_._1 == 0L).map(_._2).contains(want))
  }

  test("bounded-probe mode equals the shuffle plan's results and broadcasts the panel") {
    // same answers through both plans
    val viaBounded = run("pairs", probeIf = Some("id >= 0"))
      .select("probe_id", "match_id", "dist")
      .as[(Long, Long, Long)].collect().toSet
    val viaShuffle = run("pairs")
      .select("probe_id", "match_id", "dist")
      .as[(Long, Long, Long)].collect().toSet
    // pairs+probeIf keeps both directions; canonicalize for compare
    assert(viaBounded.map { case (a, b, dd) =>
      (math.min(a, b), math.max(a, b), dd) } == viaShuffle)
    val out = run("best", probeIf = Some("id < 12"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bounded probe panel must broadcast, not shuffle the index:\n$plan")
  }

  test("randomized differential: 250 seeded strings over a 3-letter alphabet") {
    // a tiny alphabet makes near-matches DENSE and adversarial for the
    // positional filter (the same gram recurs at many positions, edits
    // shift positions at the band boundary) — any positional-pigeonhole
    // mistake shows up as a missed pair vs brute force
    val rnd = new scala.util.Random(42)
    val strs = (0 until 250).map { i =>
      val len = 2 + rnd.nextInt(10)
      (i.toLong, (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    }
    for (d <- Seq(1, 2); q <- Seq(2, 3)) {
      val df = strs.toDF("id", "name")
      val got = FuzzyJoinStage.fuzzyjoin(ComponentSpec("fuzzyjoin",
          Map("field" -> "name", "idField" -> "id", "maxDistance" -> d,
            "q" -> q, "mode" -> "pairs")), newCtx())(df)
        .select("probe_id", "match_id", "dist")
        .as[(Long, Long, Long)].collect().toSet
      val b = df.select(col("id").as("bid"), col("name").as("bname"))
      val expected = df.crossJoin(b).where(col("id") < col("bid"))
        .select(col("id"), col("bid"),
          levenshtein(col("name"), col("bname")).cast("bigint").as("dist"))
        .where(col("dist") <= d)
        .as[(Long, Long, Long)].collect().toSet
      assert(expected.size > 100, s"d=$d q=$q corpus must be dense")
      assert(got == expected, s"d=$d q=$q missed=${(expected -- got).take(5)} " +
        s"extra=${(got -- expected).take(5)}")
    }
  }

  test("plan contains no cartesian or nested-loop join") {
    val out = run("pairs")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzyjoin must never plan an all-pairs join:\n$plan")
  }

  test("guards: missing field, bad mode, bad maxDistance fail loud") {
    val df = corpus.toDF("id", "name")
    def mk(o: Map[String, Any]) =
      FuzzyJoinStage.fuzzyjoin(ComponentSpec("fuzzyjoin", o), newCtx())(df)
    assert(intercept[Exception](mk(Map("idField" -> "id")))
      .getMessage.contains("field"))
    assert(intercept[Exception](mk(Map("field" -> "name", "idField" -> "id",
      "mode" -> "fastest"))).getMessage.contains("mode"))
    assert(intercept[Exception](mk(Map("field" -> "name", "idField" -> "id",
      "maxDistance" -> 0))).getMessage.contains("maxDistance"))
  }
}
