package graft

import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Pins the r22 prefix-filtered [[Dedup.ngramJaccardPairs]] to the brute
  * all-pairs formulation it replaced: under any fixed total order, two
  * shingle sets with Jaccard ≥ t must share an element inside their
  * |x| − ⌊t·|x|⌋ + 1 prefixes, so the prefix-posting candidates plus exact
  * verification yield the IDENTICAL pair set and identical j doubles. The
  * corpus is constructed to exercise the divergence edges: near-duplicate
  * families straddling the threshold, short docs (< shingleN tokens → empty
  * shingle sets), exact duplicates, heavy shared boilerplate (fat posting
  * lists), a null text, and thresholds where t·|x| lands on/near integers.
  */
class PairsJaccardSpec extends SparkSpec {
  import spark.implicits._

  private def brute(df: org.apache.spark.sql.DataFrame, threshold: Double,
      shingleN: Int = 3): org.apache.spark.sql.DataFrame = {
    // empty shingle sets are excluded from the reference pairing: a pair of
    // empty sets made the OLD all-pairs form 0/0-divide (an ANSI crash on
    // degenerate corpora — the prefix form emits no posting for an empty
    // set, so it cannot pair and cannot divide), and an empty-vs-non-empty
    // pair scores j = 0 < threshold either way. Output-equivalent for any
    // threshold > 0.
    val sh = df.select(col("id"),
      array_sort(Dedup.shingles(col("text"), shingleN)).as("sh"))
      .filter(size(col("sh")) > 0)
    val a = sh.select(col("id").as("id1"), col("sh").as("sh1"))
    val b = sh.select(col("id").as("id2"), col("sh").as("sh2"))
    a.join(b, col("id1") < col("id2"))
      .withColumn("inter",
        graft.functions.vector.sorted_intersect_count(col("sh1"), col("sh2")))
      .withColumn("j", col("inter").cast("double") /
        (size(col("sh1")) + size(col("sh2")) - col("inter")))
      .filter(col("j") >= threshold)
      .select("id1", "id2", "j")
  }

  private def corpus() = {
    val boiler = "this document is provided as is without warranty of any kind"
    val rnd = new scala.util.Random(7)
    def words(n: Int) = Seq.fill(n)(s"w${rnd.nextInt(40)}").mkString(" ")
    val docs = Seq.tabulate(60) { i =>
      val base = words(12 + rnd.nextInt(20))
      i % 6 match {
        case 0 => (i.toLong, s"$boiler $base")            // shared boilerplate
        case 1 => (i.toLong, base)
        case 2 => (i.toLong, s"$base extra")              // near-dup of some base
        case 3 => (i.toLong, words(2))                    // < shingleN tokens
        case 4 => (i.toLong, boiler)                      // exact duplicates
        case _ => (i.toLong, s"$base tail ${words(3)}")
      }
    } :+ (60L, null.asInstanceOf[String]) :+ (61L, "")
    docs.toDF("id", "text")
  }

  test("prefix-filtered ngramJaccardPairs equals brute all-pairs on every threshold edge") {
    val df = corpus()
    for (t <- Seq(0.25, 0.5, 0.75, 0.8, 1.0)) {
      val fast = sorted(Dedup.ngramJaccardPairs(df, "id", "text", t))
      val slow = sorted(brute(df, t))
      assert(fast == slow, s"threshold $t: prefix form diverged from all-pairs")
    }
  }

  test("prefix form loses nothing when prefixes are minimal (t*|x| integral)") {
    // 10-shingle docs at t=0.8: prefix length 10-8+1=3; overlap exactly 8/12
    // (j = 8/12 < 0.8 drops) and 9/11, 10/10 (j ≥ 0.8 keeps) — both sides of
    // the boundary must match the brute form
    val a = (1 to 12).map(i => s"t$i").mkString(" ")       // 10 shingles
    val b = (1 to 11).map(i => s"t$i").mkString(" ") + " x" // shares 9 of its grams? verified vs brute either way
    val c = a
    val d = (5 to 16).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, c), (4L, d)).toDF("id", "text")
    for (t <- Seq(0.6, 0.8, 0.9)) {
      assert(sorted(Dedup.ngramJaccardPairs(df, "id", "text", t)) ==
        sorted(brute(df, t)), s"threshold $t")
    }
  }
}
