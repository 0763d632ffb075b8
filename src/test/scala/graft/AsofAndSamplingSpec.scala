package graft

import graft.syntax._
import graft.llm.TextAnalysis
import org.apache.spark.sql.functions._

class AsofAndSamplingSpec extends SparkSpec {
  import spark.implicits._

  private def trades = Seq(
    ("a", 1L, 10.0), ("a", 5L, 11.0), ("a", 9L, 12.0),
    ("b", 3L, 20.0)).toDF("sym", "t", "px")
  private def quotes = Seq(
    ("a", 0L, 9.5), ("a", 5L, 10.5), ("a", 7L, 10.7),
    ("b", 4L, 19.5), ("c", 1L, 1.0)).toDF("sym", "t", "bid")

  test("asofJoin backward: greatest right t <= left t, inclusive, per key") {
    val out = trades.asofJoin(quotes, on = "t", by = Seq("sym"))
      .orderBy("sym", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("a", 1L, 9.5), ("a", 5L, 10.5), ("a", 9L, 10.7), // t=5 matches inclusively
      ("b", 3L, null))) // no quote at or before t=3 for b
  }

  test("asofJoin forward + tolerance") {
    val out = trades.asofJoin(quotes, on = "t", by = Seq("sym"), direction = "forward")
      .orderBy("sym", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("a", 1L, 10.5), ("a", 5L, 10.5), ("a", 9L, null),
      ("b", 3L, 19.5)))
    val tol = trades.asofJoin(quotes, on = "t", by = Seq("sym"),
      direction = "forward", tolerance = Some(1.0))
      .orderBy("sym", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(3)) null else r.getDouble(3)))
    // a@1 -> nearest forward quote is t=5, 4 units away: nulled by tolerance 1
    assert(tol.toSeq == Seq(
      ("a", 1L, null), ("a", 5L, 10.5), ("a", 9L, null), ("b", 3L, 19.5)))
  }

  test("asofJoin nearest: closer side wins, ties resolve backward") {
    val l = Seq(("a", 4L), ("a", 6L), ("a", 20L)).toDF("sym", "t")
    val r = Seq(("a", 0L, 1.0), ("a", 8L, 2.0)).toDF("sym", "t", "v")
    val out = l.asofJoin(r, on = "t", by = Seq("sym"), direction = "nearest")
      .orderBy("t").collect().map(r => (r.getLong(1), r.getDouble(2)))
    // t=4: dist 4 back vs 4 fwd -> tie -> backward (1.0); t=6: fwd closer;
    // t=20: only backward side remains
    assert(out.toSeq == Seq((4L, 1.0), (6L, 2.0), (20L, 2.0)))
    val tol = l.asofJoin(r, on = "t", by = Seq("sym"),
      direction = "nearest", tolerance = Some(5.0))
      .orderBy("t").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(tol.toSeq == Seq((4L, 1.0), (6L, 2.0), (20L, null)))
  }

  test("asofJoin without by keys routes through the scale-safe global path") {
    val l = Seq((1L, 100), (6L, 200), (11L, 300)).toDF("t", "lv")
    val r = Seq((0L, "x"), (5L, "y"), (10L, "z")).toDF("t", "rv")
    def run() = l.asofJoin(r, on = "t")
      .orderBy("t").collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(run() == Seq((1L, "x"), (6L, "y"), (11L, "z")))
    // force the bucketed runningLast machinery and re-check values
    spark.conf.set("graft.scaleWindows.smallBytes", "1")
    try assert(run() == Seq((1L, "x"), (6L, "y"), (11L, "z")))
    finally spark.conf.unset("graft.scaleWindows.smallBytes")
  }

  test("asofJoin suffixes right columns colliding with left names") {
    val l = Seq((1L, 5.0)).toDF("t", "v")
    val r = Seq((0L, 7.0)).toDF("t", "v")
    val out = l.asofJoin(r, on = "t")
    assert(out.columns.toSeq == Seq("t", "v", "v_right"))
    assert(out.collect()(0).getDouble(2) == 7.0)
  }

  test("hashSample is deterministic and partition-invariant") {
    val d = spark.range(10000).toDF("id")
    val a = d.hashSample("id", 0.3).select("id").as[Long].collect().toSet
    val b = d.repartition(17).hashSample("id", 0.3).select("id").as[Long].collect().toSet
    assert(a == b, "sample must not depend on partitioning")
    assert(math.abs(a.size / 10000.0 - 0.3) < 0.02)
    // monotone in fraction: a smaller sample nests inside a bigger one
    val small = d.hashSample("id", 0.1).select("id").as[Long].collect().toSet
    assert(small.subsetOf(a))
  }

  test("packSequences tiles the token stream exactly: full sequences, no gaps, no overlap") {
    val d = Seq((1L, 700), (2L, 100), (3L, 5), (4L, 0), (5L, 300), (6L, 1000))
      .toDF("id", "n_tokens")
    val out = graft.llm.Sampling.packSequences(d, "id", "n_tokens", seqLen = 256)
      .select("id", "n_tokens", "seq_id", "tok_start", "tok_end", "seq_off")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val total = 700 + 100 + 5 + 300 + 1000 // zero-token row drops out
    // every emitted range is non-empty and inside the doc
    assert(out.forall { case (_, n, _, s, e, _) => s >= 0 && s < e && e <= n })
    // the ranges of each doc tile [0, n_tokens) in seq order
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.head._4 == 0L)
      assert(sorted.last._5 == sorted.head._2.toLong)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 == b._4 && b._3 == a._3 + 1)
        case _ =>
      }
    }
    // every sequence except the last is exactly full, and its pieces are
    // contiguous from offset 0
    val bySeq = out.groupBy(_._3)
    val lastSeq = (total - 1) / 256
    assert(bySeq.keySet == (0L to lastSeq).toSet)
    bySeq.foreach { case (sid, rows) =>
      val sorted = rows.sortBy(_._6)
      assert(sorted.head._6 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._6 == a._6 + (a._5 - a._4))
        case _ =>
      }
      val filled = rows.map(r => r._5 - r._4).sum
      if (sid < lastSeq) assert(filled == 256L)
      else assert(filled == total - 256L * lastSeq)
    }
  }

  test("hashSplit covers every row with stable proportions") {
    val d = spark.range(10000).toDF("id")
    val counts = d.hashSplit("id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 10000L)
    assert(math.abs(counts("train") / 10000.0 - 0.8) < 0.02)
    assert(math.abs(counts("val") / 10000.0 - 0.1) < 0.01)
    assert(math.abs(counts("test") / 10000.0 - 0.1) < 0.01)
    intercept[IllegalArgumentException] {
      d.hashSplit("id", weights = Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("stratifiedHashSample applies per-stratum fractions") {
    val d = spark.range(4000).toDF("id")
      .withColumn("g", when(col("id") % 2 === 0, "a").otherwise("b"))
    val out = d.stratifiedHashSample("id", "g", Map("a" -> 0.5, "b" -> 0.1))
    val byG = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byG("a") / 2000.0 - 0.5) < 0.05)
    assert(math.abs(byG.getOrElse("b", 0L) / 2000.0 - 0.1) < 0.03)
    // default fraction 0 drops unmapped strata
    val dropped = d.stratifiedHashSample("id", "g", Map("a" -> 0.5))
    assert(dropped.filter(col("g") === "b").count() == 0)
  }

  test("scrubPii redacts all kinds; selective kinds leave the rest") {
    val d = Seq("mail a.b+c@x.io, ssn 123-45-6789, call 555-123-4567, ip 10.0.0.1 end")
      .toDF("t")
    val all = d.select(TextAnalysis.scrubPii(col("t"))).collect()(0).getString(0)
    assert(all == "mail [EMAIL], ssn [SSN], call [PHONE], ip [IPV4] end")
    val some = d.scrubPii("t", kinds = Seq("email")).collect()(0).getString(0)
    assert(some.contains("[EMAIL]") && some.contains("123-45-6789"))
    intercept[IllegalArgumentException](d.scrubPii("t", kinds = Seq("nope")))
  }

  test("dupLineStats counts duplicate lines and their character share") {
    val d = Seq("a\nbb\na\n\n  \na\nccc").toDF("t")
    val st = d.select(TextAnalysis.dupLineStats(col("t")).as("s"))
      .select("s.n_lines", "s.n_dup_lines", "s.dup_line_frac", "s.dup_char_frac")
      .collect()(0)
    // non-empty lines: a, bb, a, a, ccc -> 5 lines, 2 duplicate copies of 'a'
    assert(st.getInt(0) == 5 && st.getInt(1) == 2)
    assert(st.getDouble(2) == 0.4)
    assert(st.getDouble(3) == 2.0 / 8.0) // 2 dup chars of 8 total
  }

  test("topNgramCharFrac: most frequent 2-gram's character share") {
    val d = Seq((1L, "x y x y z"), (2L, "a b"), (3L, "one")).toDF("i", "t")
    val out = TextAnalysis.topNgramCharFrac(d, "i", "t", 2)
      .orderBy("id").collect().map(_.getDouble(1)).toSeq
    // "x y x y z": grams (x y)x2, (y x), (y z); best = 2*3 = 6 of 9 chars
    // (rounded to 6 places); "a b": one gram covers everything; "one": 0
    assert(out == Seq(0.666667, 1.0, 0.0))
  }

  test("unigramLogProb: common-token docs outscore rare-token docs") {
    // corpus: 'common' appears 6x, rare tokens once each
    val d = Seq((1L, "common common common"), (2L, "common common common"),
      (3L, "rare1 rare2 rare3")).toDF("i", "t")
    val out = TextAnalysis.unigramLogProb(d, "i", "t")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(out(0)._2 == out(1)._2)
    assert(out(0)._2 > out(2)._2, "common-token doc must outscore rare-token doc")
    // exact value: log10(6/9) for every token of doc 1
    assert(math.abs(out(0)._2 - math.log10(6.0 / 9.0)) < 1e-5)
  }

  test("chunkDocuments: overlapping windows, short tail, stable ids") {
    val d = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")), (2L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(d, "doc_id", "text", chunkTokens = 4, stride = 3)
      .orderBy("id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 0, 4, "w1 w2 w3 w4"),
      (1L, 1, 4, "w4 w5 w6 w7"),
      (1L, 2, 4, "w7 w8 w9 w10"),
      (1L, 3, 1, "w10"),
      (2L, 0, 1, "solo")))
  }
}
