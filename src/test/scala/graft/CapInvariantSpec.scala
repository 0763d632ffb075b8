package graft

import graft.operators.JoinOps
import org.apache.spark.sql.functions._

/** Adversarial invariants for the capped/threshold scale paths — the
  * contracts the sf1 probes measure, pinned as specs so a regression fails
  * locally instead of waiting for a scale run:
  *
  *  - hot-bucket caps may only LOSE candidates, never invent them
  *    (capped ⊆ uncapped), and can never lose an exact-equal pair
  *    (the dist-0 equi-join rescue is outside the variant path);
  *  - a non-biting cap is a no-op (cap ≥ every bucket ⇒ identical output);
  *  - dsirResample's threshold strategy selects the identical SET as the
  *    TakeOrdered strategy for any k, including k ≥ n.
  */
class CapInvariantSpec extends SparkSpec {
  import spark.implicits._

  // a clique-grown corpus: 24 names over a shared stem differing in two
  // digit positions — every same-f and same-i pair is edit distance 1
  // (families are NOT isolated cliques: "customer#00000"/"customer#00100"
  // also differ in one char), which is the point: the shared stem makes
  // variant buckets hot. Plus an identical-string clique and two
  // singletons.
  private lazy val names = {
    val fams = for {
      f <- 0 until 4
      i <- 0 until 6
    } yield (f * 10 + i).toLong -> s"customer#00${f}0$i"
    val equalClique = Seq(100L -> "dup dup dup", 101L -> "dup dup dup",
      102L -> "dup dup dup")
    val singles = Seq(200L -> "zzz unique one", 201L -> "qqq unique two")
    (fams ++ equalClique ++ singles).toDF("id", "s")
  }

  private def pairs(maxBucket: Int): Set[(Long, Long, Int)] =
    JoinOps.fuzzySelfJoin(names, "id", "s", maxDist = 1, maxBucket = maxBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("fuzzySelfJoin: capped output is a subset of uncapped; equal pairs survive any cap") {
    val uncapped = pairs(maxBucket = 1000000)
    val capped = pairs(maxBucket = 2) // bites: every family bucket holds ~6
    assert(capped.subsetOf(uncapped))
    assert(capped.size < uncapped.size) // the cap actually bit on this data
    // the identical-string clique's 3 pairs are all present under the
    // biting cap (the rescue path), at dist 0
    val cliquePairs = Set((100L, 101L, 0), (100L, 102L, 0), (101L, 102L, 0))
    assert(cliquePairs.subsetOf(capped))
    // a non-biting cap is a no-op
    assert(pairs(maxBucket = 1000) == uncapped)
    // no pair ever exceeds maxDist and ids are strictly ordered
    assert(uncapped.forall { case (a, b, d) => a < b && d <= 1 })
  }

  test("fuzzyJoin (two-sided): capped subset + equal rescue + non-biting no-op") {
    val left = names
    val right = names.select((col("id") + 1000L).as("rid"), col("s").as("rs"))
    def go(cap: Int): Set[(Long, Long, Int)] =
      JoinOps.fuzzyJoin(left, right, "s", "rs", maxDist = 1, maxBucket = cap)
        .select(col("id"), col("rid"), col("dist"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val uncapped = go(1000000)
    val capped = go(2)
    assert(capped.subsetOf(uncapped))
    assert(capped.size < uncapped.size)
    // every row pairs with its own offset twin at dist 0 regardless of cap
    // (equal rescue): 29 names -> 29 self pairs, plus the cross pairs of
    // the identical-string clique
    val selfPairs = names.collect().map(r => (r.getLong(0), r.getLong(0) + 1000L, 0)).toSet
    assert(selfPairs.subsetOf(capped))
    assert(go(1000) == uncapped)
  }

  test("dsirResample: threshold strategy selects the same set as TakeOrdered for any k") {
    val raw = (0 until 400).map(i =>
      (i.toLong, s"tok${i % 37} tok${i % 11} tok${(i * 7) % 23} filler words here"))
      .toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") % 3 === 0).select("text")
    for (k <- Seq(1, 10, 50, 399, 400, 500)) {
      val take = graft.llm.Sampling.dsirResample(raw, target, "doc_id", "text",
          k = k, buckets = 32, thresholdCutoff = Int.MaxValue)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val thr = graft.llm.Sampling.dsirResample(raw, target, "doc_id", "text",
          k = k, buckets = 32, thresholdCutoff = 0)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(take == thr, s"strategies diverged at k=$k")
      assert(take.size == math.min(k, 400))
    }
  }
}
