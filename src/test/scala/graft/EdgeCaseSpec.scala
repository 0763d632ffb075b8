package graft

import graft.syntax._
import org.apache.spark.sql.functions._

/** Degenerate-input gauntlet: every verb family over an EMPTY frame and a
  * single-row frame. None of these may throw — at 100 TB a partition (or a
  * whole filtered branch) being empty is the common case, not the corner.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val empty = Seq.empty[(Long, String, Double)].toDF("id", "s", "x")
  private val one = Seq((1L, "a b", 2.5)).toDF("id", "s", "x")

  test("name/select/filter verbs tolerate empty and single-row frames") {
    for (d <- Seq(empty, one)) {
      assert(d.cleanNames().columns.toSeq == Seq("id", "s", "x"))
      assert(d.selectColumns(ColumnSelector.Glob("*")).columns.length == 3)
      assert(d.reorderColumns("x").columns.head == "x")
      d.filterString("s", "a", regex = false).collect()
      d.filterOn("x > 1").collect()
      d.getDupes("id").collect()
      d.updateWhere("x > 1", "flag", 1).collect()
      d.removeEmpty().collect()
    }
    // drop_constant_columns on empty: no distinct values anywhere — keeps schema workable
    assert(empty.dropConstantColumns().collect().isEmpty)
  }

  test("grouped/window verbs tolerate empty and single-row frames") {
    for (d <- Seq(empty, one)) {
      d.groupbyAgg(Seq("s"), "x", "sum", "total").collect()
      d.groupbyTopk(Seq("s"), "x", 2).collect()
      d.takeFirst(Seq("s"), by = "x").collect()
      d.countCumulativeUnique("s", "id", "cum").collect()
      d.toSetOf("s").collect()
    }
  }

  test("reshape verbs tolerate empty and single-row frames") {
    val wideEmpty = Seq.empty[(Long, Double, Double)].toDF("id", "m_a", "m_b")
    val wideOne = Seq((1L, 1.0, 2.0)).toDF("id", "m_a", "m_b")
    for (d <- Seq(wideEmpty, wideOne)) {
      val long = d.pivotLonger(index = Seq("id"), namesTo = Seq("pre", "k"),
        namesSep = Some("_"))
      assert(long.columns.contains("value"))
      long.collect()
    }
    // pivot_wider with an explicit universe keeps a deterministic schema
    // even over zero rows
    val w = Seq.empty[(Long, String, Double)].toDF("id", "k", "v")
      .pivotWider(index = Seq("id"), namesFrom = "k", valuesFrom = "v",
        knownValues = Seq("p", "q"))
    assert(w.columns.toSeq == Seq("id", "p", "q") && w.count() == 0)
  }

  test("fill/type/math verbs tolerate empty and single-row frames") {
    for (d <- Seq(empty, one)) {
      d.fillEmpty(Map("s" -> "?")).collect()
      d.impute("x", statistic = Some("mean")).collect()
      d.coalesceColumns(Seq("s", "s"), targetColumn = Some("c")).collect()
      d.flagNulls("nf", Seq("s", "x")).collect()
      d.changeType("x", "int").collect()
      d.minMaxScale("x").collect()
      d.softmaxOf("x", "sm").collect()
      d.zScoreOf("x", "z").collect()
      d.ecdfOf("x", "e").collect()
    }
  }

  test("join verbs tolerate empty sides") {
    val l = Seq((1L, 5.0)).toDF("lid", "x")
    val r = Seq((2L, 1.0, 9.0)).toDF("rid", "lo", "hi")
    val emptyL = Seq.empty[(Long, Double)].toDF("lid", "x")
    val emptyR = Seq.empty[(Long, Double, Double)].toDF("rid", "lo", "hi")
    import graft.operators.JoinOps
    assert(JoinOps.conditionalJoin(emptyL, r, Seq(("x", "lo", ">="))).count() == 0)
    assert(JoinOps.conditionalJoin(l, emptyR, Seq(("x", "lo", ">=")), how = "left").count() == 1)
    assert(JoinOps.rangeJoin(emptyL, r, "x", "lo", "hi").count() == 0)
    assert(JoinOps.rangeJoin(l, emptyR, "x", "lo", "hi").count() == 0)
  }

  test("asofJoin tolerates empty sides, keyed and global") {
    import graft.operators.JoinOps
    val l = Seq((1, 10L), (2, 20L)).toDF("k", "t")
    val emptyL = Seq.empty[(Int, Long)].toDF("k", "t")
    val emptyR = Seq.empty[(Int, Long, Double)].toDF("k", "t", "v")
    for (by <- Seq(Seq("k"), Nil); dir <- Seq("backward", "forward", "nearest")) {
      // empty right: every left row survives with a null match
      val lr = JoinOps.asofJoin(l, emptyR, on = "t", by = by, direction = dir)
      assert(lr.count() == 2 && lr.filter(col("v").isNull).count() == 2, s"by=$by dir=$dir")
      // empty left: empty output, schema intact (without by keys, right's k
      // is payload and arrives suffixed — the merge_asof contract)
      val expectCols = if (by.isEmpty) Seq("k", "t", "k_right", "v") else Seq("k", "t", "v")
      val el = JoinOps.asofJoin(emptyL, emptyR, on = "t", by = by, direction = dir)
      assert(el.count() == 0 && el.columns.toSeq == expectCols)
    }
  }

  test("sampling/chunking/dedupNear tolerate empty and degenerate inputs") {
    import graft.llm.{Dedup, TextAnalysis}
    val empty = Seq.empty[(Long, String)].toDF("id", "t")
    assert(empty.hashSample("id", 0.5).count() == 0)
    assert(empty.hashSplit("id").count() == 0)
    assert(TextAnalysis.chunkDocuments(empty, "id", "t", 4, 2).count() == 0)
    assert(TextAnalysis.topNgramCharFrac(empty, "id", "t").count() == 0)
    // single-bucket split labels everything
    val one = Seq((1L, "x")).toDF("id", "t")
    assert(one.hashSplit("id", weights = Seq("all" -> 1.0))
      .select("split").collect()(0).getString(0) == "all")
    // a corpus with no near-dup pairs dedups to itself
    val solo = Seq((1L, "completely unique words right here today"),
      (2L, "other text that shares nothing at all now")).toDF("id", "t")
    assert(Dedup.dedupNear(solo, "id", "t", 0.8).count() == 2)
  }

  test("sessionize splits per-key streams on inactivity gaps; stats aggregate sessions") {
    import graft.operators.TimeseriesOps
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, "u1", t("2024-01-01 00:00:00")),
      (2L, "u1", t("2024-01-01 00:10:00")),  // 10 min -> same session
      (3L, "u1", t("2024-01-01 02:00:01")),  // > 1h50m gap -> new session
      (4L, "u2", t("2024-01-01 00:05:00")),  // separate key: own session 0
      (5L, "u1", t("2024-01-01 02:30:00"))   // 30 min -> stays in session 1
    ).toDF("id", "user", "ts")
    val out = TimeseriesOps.sessionize(ev, "user", "ts", gapSeconds = 3600)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L, 5L -> 1L))
    val stats = TimeseriesOps.sessionStats(ev, "user", "ts", gapSeconds = 3600)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(4), r.getDouble(5)))).toMap
    assert(stats(("u1", 0L)) == ((2L, 600.0)))
    assert(stats(("u1", 1L)) == ((2L, 1799.0)))
    assert(stats(("u2", 0L)) == ((1L, 0.0)))
    // a gap of exactly gapSeconds does NOT break (strict >)
    val exact = Seq((1L, "u", t("2024-01-01 00:00:00")),
      (2L, "u", t("2024-01-01 01:00:00"))).toDF("id", "user", "ts")
    assert(TimeseriesOps.sessionize(exact, "user", "ts", 3600)
      .agg(max("session_id")).head.getLong(0) == 0L)
    // empty frame
    assert(TimeseriesOps.sessionize(
      Seq.empty[(Long, String, java.sql.Timestamp)].toDF("id", "user", "ts"),
      "user", "ts", 60).count() == 0)
  }

  test("BottomKByHash aggregate: partition-invariant sample, partial aggregation in plan") {
    import graft.operators.GroupedOps
    val d = spark.range(0, 300).select(
      col("id").cast("string").as("v"), (col("id") % 3).as("g"))
    def run(parts: Int) =
      GroupedOps.groupSample(d.repartition(parts), Seq("g"), "v", 5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val one = run(1)
    assert(one == run(17), "sample must not depend on partitioning")
    // brute expectation: per group, the 5 ids with the smallest md5
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val expected = (0L until 300L).groupBy(_ % 3).toSeq.flatMap { case (g, ids) =>
      ids.map(_.toString).sortBy(md5hex).take(5).zipWithIndex
        .map { case (v, i) => (g, i, v) }
    }.sorted
    assert(one == expected)
    // the custom aggregate must plan with PARTIAL + FINAL stages (map-side
    // combine) — the whole point vs a window row_number
    val plan = GroupedOps.groupSample(d, Seq("g"), "v", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_bottomkbyhash") || plan.contains("partial_BottomKByHash"),
      s"expected partial aggregation stage, got:\n$plan")
    // k larger than the group: everything sampled, no error
    assert(GroupedOps.groupSample(
      Seq(("a", "x"), ("a", "y")).toDF("g", "v"), Seq("g"), "v", 10).count() == 2)
  }

  test("rolling windows: events exactly W apart are OUTSIDE each other's window (both forms)") {
    import graft.operators.TimeseriesOps
    import org.apache.spark.sql.functions._
    // t, t+W, t+2W on one key: the trailing (t−W, t] window is strict at
    // the far boundary, so every event sees only itself — and t+W sits
    // exactly on a band boundary, the banded decomposition's edge case
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val W = 3600L
    val ev = (0 to 2).map(i =>
      (i.toLong, "u", new java.sql.Timestamp(t0.getTime + i * W * 1000L), 1.0))
      .toDF("id", "user", "ts", "v")
    val keyed = TimeseriesOps.rollingAgg(ev, "user", "ts", W,
      Map("rn" -> count(lit(1)))).select("id", "rn").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val banded = TimeseriesOps.rollingAggBanded(ev, "id", "user", "ts", W,
      Map("rn" -> ("v", "count"))).select("id", "rn").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keyed == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
    assert(banded == keyed)
  }

  test("rollingAggBanded: degenerate inputs and contract checks") {
    import graft.operators.TimeseriesOps
    import org.apache.spark.sql.functions._
    val emptyEv = Seq.empty[(Long, String, java.sql.Timestamp, Double)]
      .toDF("id", "user", "ts", "v")
    assert(TimeseriesOps.rollingAggBanded(emptyEv, "id", "user", "ts", 3600L,
      Map("rs" -> ("v", "sum"))).count() == 0)
    val one = Seq((1L, "u", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 2.5))
      .toDF("id", "user", "ts", "v")
    val row = TimeseriesOps.rollingAggBanded(one, "id", "user", "ts", 3600L,
      Map("rs" -> ("v", "sum"), "rn" -> ("v", "count"))).collect()(0)
    assert(row.getLong(2) == 1L && row.getDouble(3) == 2.5) // rn, rs
    intercept[IllegalArgumentException] {
      TimeseriesOps.rollingAggBanded(one, "id", "user", "ts", 3600L,
        Map("bad" -> ("v", "avg")))
    }
    // aggregating a structural column must fail loudly: phantom rows null
    // value columns by name, so count over the key would split a spurious
    // null-keyed row (ADVICE r11)
    for (structural <- Seq("id", "user", "ts")) {
      val ex = intercept[IllegalArgumentException] {
        TimeseriesOps.rollingAggBanded(one, "id", "user", "ts", 3600L,
          Map("n" -> (structural, "count")))
      }
      assert(ex.getMessage.contains("structural column"))
    }
    // the plan must stay a window+aggregate pipeline — no nested-loop join
    // is ever acceptable here (the rejected self-join mitigation was one)
    val plan = TimeseriesOps.rollingAggBanded(one, "id", "user", "ts", 3600L,
      Map("rs" -> ("v", "sum"))).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"))
  }

  test("rollingAgg: trailing range window is exclusive-open at the tail, per key") {
    import graft.operators.TimeseriesOps
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      ("u", t("2024-01-01 00:00:00"), 1.0),
      ("u", t("2024-01-01 00:30:00"), 2.0),
      ("u", t("2024-01-01 01:00:00"), 4.0),  // exactly 1h after first: OUT of 1h window
      ("v", t("2024-01-01 00:45:00"), 8.0)   // other key: independent
    ).toDF("user", "ts", "v")
    val out = TimeseriesOps.rollingAgg(ev, "user", "ts", 3600L,
      Map("roll_sum" -> sum(col("v")), "roll_n" -> count(lit(1))))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString.take(19)) ->
        ((r.getDouble(4), r.getLong(3)))).toMap
    assert(out(("u", "2024-01-01 00:00:00")) == ((1.0, 1L)))
    assert(out(("u", "2024-01-01 00:30:00")) == ((3.0, 2L)))
    // the first event fell out: (00:00, 01:00] keeps only 00:30 and 01:00
    assert(out(("u", "2024-01-01 01:00:00")) == ((6.0, 2L)))
    assert(out(("v", "2024-01-01 00:45:00")) == ((8.0, 1L)))
  }

  test("funnel honors step order; cohortRetention counts distinct actives per offset") {
    import graft.operators.EventOps
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1 completes view -> click -> purchase in order
      ("u1", t("2024-01-01 00:00:00"), "view"),
      ("u1", t("2024-01-01 00:01:00"), "click"),
      ("u1", t("2024-01-01 00:02:00"), "purchase"),
      // u2 clicked BEFORE viewing: click doesn't count, funnel stops at view
      ("u2", t("2024-01-01 00:00:00"), "click"),
      ("u2", t("2024-01-01 00:01:00"), "view"),
      // u3 never viewed
      ("u3", t("2024-01-01 00:00:00"), "purchase")
    ).toDF("user", "ts", "etype")
    val f = EventOps.funnel(ev, "user", "ts", "etype",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(f == Map("u1" -> 3L, "u2" -> 1L, "u3" -> 0L))
    // duplicate step names rejected
    intercept[IllegalArgumentException] {
      EventOps.funnel(ev, "user", "ts", "etype", Seq("view", "view"))
    }
    // cohort: u1/u2 first active week 1, u3 week 2; u2 returns in week 2
    val cev = Seq(
      ("u1", t("2024-01-01 10:00:00")), ("u2", t("2024-01-03 10:00:00")),
      ("u2", t("2024-01-08 10:00:00")), ("u3", t("2024-01-09 10:00:00"))
    ).toDF("user", "ts")
    val r = EventOps.cohortRetention(cev, "user", "ts", "week")
      .collect().map(x => (x.getTimestamp(0).toString.take(10), x.getLong(1)) -> x.getLong(2)).toMap
    assert(r == Map(("2024-01-01", 0L) -> 2L, ("2024-01-01", 1L) -> 1L,
      ("2024-01-08", 0L) -> 1L))
  }

  test("round-10 operators tolerate empty and degenerate inputs") {
    import graft.llm.{Dedup => D, Sampling => S, TextAnalysis => T}
    val emptyDocs = Seq.empty[(Long, String)].toDF("id", "t")
    // empty corpora: no spans, no overlap, empty report group set
    assert(D.dedupSubstrings(emptyDocs, "id", "t", 8).count() == 0)
    val ov = D.corpusOverlap(emptyDocs, emptyDocs, "id", "t").collect().head
    assert(ov.getLong(0) == 0L && ov.getLong(2) == 0L && ov.getDouble(4) == 0.0)
    assert(T.corpusReport(emptyDocs, "t").count() == 0)
    assert(T.collocations(emptyDocs, "t").count() == 0)
    // packing: seqLen 1 puts every token in its own sequence; zero-token
    // corpus packs nothing
    val docs = Seq((1L, 3), (2L, 2)).toDF("id", "n")
    assert(S.packSequences(docs, "id", "n", 1).count() == 5)
    assert(S.packSequences(docs.filter(col("n") < 0), "id", "n", 16).count() == 0)
    intercept[IllegalArgumentException] { S.packSequences(docs, "id", "n", 0) }
    // funnel/cohort on empty events
    import graft.operators.EventOps
    val emptyEv = Seq.empty[(String, java.sql.Timestamp, String)]
      .toDF("u", "ts", "e")
    assert(EventOps.funnel(emptyEv, "u", "ts", "e", Seq("a", "b")).count() == 0)
    assert(EventOps.cohortRetention(emptyEv, "u", "ts").count() == 0)
    intercept[IllegalArgumentException] {
      EventOps.cohortRetention(emptyEv, "u", "ts", "fortnight")
    }
  }

  test("timeseries and text verbs tolerate empty and single-row frames") {
    val ts = Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0))
      .toDF("ts", "v")
    val emptyTs = Seq.empty[(java.sql.Timestamp, Double)].toDF("ts", "v")
    import graft.operators.TimeseriesOps
    // a single tick reindexes to itself; an empty frame has no [min, max]
    // span — both must come back, not throw
    assert(TimeseriesOps.fillMissingTimestamps(ts, "ts", "1 hour").count() == 1)
    assert(TimeseriesOps.fillMissingTimestamps(emptyTs, "ts", "1 hour").count() == 0)
    TimeseriesOps.sortTimestampsMonotonically(emptyTs, "ts").collect()
    for (d <- Seq(empty, one)) {
      d.concatenateColumns(Seq("id", "s"), "cat").collect()
      d.deconcatenateColumn("s", " ", Seq("s1", "s2")).collect()
      d.processText("s", "upper").collect()
      d.findReplace("s", Map("a" -> "b")).collect()
    }
  }

  test("all-null columns pass through fill/type/math verbs") {
    val nulls = Seq((1L, null: String, null: java.lang.Double),
      (2L, null: String, null: java.lang.Double)).toDF("id", "s", "x")
    for (stat <- Seq("mean", "median", "mode", "min", "max", "sum"))
      assert(nulls.impute("x", statistic = Some(stat)).filter(col("x").isNull).count() == 2)
    nulls.fillEmpty(Map("s" -> "?", "x" -> 0.0)).collect()
    // coalesce is typed in Spark: columns + default must share a type
    // (pandas' object dtype has no analog — documented divergence)
    assert(nulls.coalesceColumns(Seq("s", "s"), targetColumn = Some("c"),
      defaultValue = Some("d")).filter(col("c") === "d").count() == 2)
    assert(nulls.flagNulls("nf", Seq("s", "x")).filter(col("nf") === 1).count() == 2)
    nulls.minMaxScale("x").collect()
    nulls.changeType("x", "int").collect()
    nulls.softmaxOf("x", "sm").collect()
    nulls.zScoreOf("x", "z").collect()
    nulls.ecdfOf("x", "e").collect()
    nulls.textAnalysis("s").collect()
  }

  test("llm extension ops tolerate empty and single-row corpora") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("id", "t")
    val oneDoc = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" "))).toDF("id", "t")
    for (d <- Seq(emptyDocs, oneDoc)) {
      d.dedupExact("id", "t").collect()
      d.minhashDupPairs("id", "t", 0.8).collect()
      d.simhashOf("id", "t").collect()
      d.winnowFingerprints("id", "t").collect()
      d.containmentPairs("id", "t", 0.5).collect()
      d.textAnalysis("t").collect()
    }
  }

  test("similarity LSH + unigramLogProb tolerate an empty corpus") {
    import graft.llm.{Similarity, TextAnalysis}
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val dup = Similarity.lshCosineDupPairs(emptyVecs, "vec_id", "embedding", 0.9)
    assert(dup.count() == 0 && dup.columns.toSeq == Seq("id1", "id2", "sim"))
    val topk = Similarity.lshCosineTopK(emptyVecs, emptyVecs, "vec_id", "embedding", k = 3)
    assert(topk.count() == 0 && topk.columns.toSeq == Seq("qid", "nid", "sim"))
    val emptyDocs = Seq.empty[(Long, String)].toDF("id", "t")
    assert(TextAnalysis.unigramLogProb(emptyDocs, "id", "t").count() == 0)
  }

  test("buildVocab / vocabSizeGate tolerate empty and tiny corpora, k > vocab") {
    import graft.llm.TextAnalysis
    val empty = Seq.empty[(Long, String)].toDF("id", "t")
    assert(TextAnalysis.buildVocab(empty, "id", "t", 10).count() == 0)
    val one = Seq((1L, "a b a")).toDF("id", "t")
    val v = TextAnalysis.buildVocab(one, "id", "t", 10)
      .orderBy("rank").collect()
    assert(v.length == 2) // k caps, vocab smaller
    assert(v(0).getString(1) == "a" && v(0).getLong(2) == 2)
    assert(math.abs(v(1).getDouble(4) - 1.0) < 1e-9) // full coverage at tail
    val g = TextAnalysis.vocabSizeGate(one, "t").collect()(0)
    assert(g.getLong(0) == 2 && g.getBoolean(1))
  }

  test("Pca tolerates degenerate inputs: k > dim, constant column") {
    import graft.llm.Pca
    val d = (0 until 20).map(i =>
      (i.toLong, Array(i.toFloat, 1.0f))).toDF("id", "v") // dim-2, col 1 constant
    val m = Pca.fit(d, "v", 5)
    assert(m.k == 2, "k must cap at dim")
    assert(m.eigenvalues(1) < 1e-9, "constant lane has ~zero variance")
    val p = Pca.project(d, "v", m, whiten = false, outCol = "p").collect()
    assert(p.length == 20)
  }

  test("asofJoin: null left `on` keys never match (all directions)") {
    import graft.operators.JoinOps
    val l = Seq((1, Option(10L)), (2, Option.empty[Long]), (3, Option(30L)))
      .toDF("lid", "t")
    val r = Seq((5L, "a"), (25L, "b")).toDF("t", "v")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val out = JoinOps.asofJoin(l, r, on = "t", direction = dir)
      assert(out.filter(col("lid") === 2 && col("v").isNotNull).count() == 0,
        s"dir=$dir: null-on left row must not match")
      assert(out.count() == 3, s"dir=$dir keeps every left row")
    }
  }

  test("changeType keep_values rejects streaming frames") {
    import graft.operators.TypeOps
    val stream = spark.readStream.format("rate").load()
    intercept[IllegalArgumentException] {
      TypeOps.changeType(stream, "value", "int", ignoreException = "keep_values")
    }
  }

  test("round-10 llm verbs on empty/degenerate inputs") {
    import graft.llm.{Bpe, Dedup, Sampling, TextAnalysis}
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "t")
    // corpus-level ops return empty (never throw) on an empty corpus
    assert(Dedup.dedupLines(empty, "id", "t").count() == 0)
    assert(TextAnalysis.bm25TopK(empty, "id", "t", Seq("x")).count() == 0)
    assert(TextAnalysis.bigramLogProb(empty, "id", "t").count() == 0)
    assert(Sampling.weightedHashSample(
      Seq((1L, 2.0)).toDF("id", "w"), "id", "w", k = 10).count() == 1)
    // bm25 with terms absent from the corpus: empty, no divide-by-zero
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("id", "t")
    assert(TextAnalysis.bm25TopK(docs, "id", "t", Seq("zzz")).count() == 0)
    // one-token docs have no bigrams
    assert(TextAnalysis.bigramLogProb(Seq((1L, "solo")).toDF("id", "t"), "id", "t")
      .count() == 0)
    // single doc lands in the head bucket (ecdf = 1)
    val one = TextAnalysis.perplexityBuckets(Seq((1L, "a b c")).toDF("id", "t"), "id", "t")
      .collect()(0)
    assert(one.getInt(3) == 3)
    // empty canary list is a contract violation
    intercept[IllegalArgumentException] {
      TextAnalysis.findCanaries(docs, "id", "t", Seq.empty)
    }
    // cross-corpus dedup with an empty probe side is empty
    assert(Dedup.crossCorpusDupPairs(empty, "id", "t", docs, "id", "t", 0.8).count() == 0)
    // BPE on an empty corpus trains zero merges; encoding still works
    val merges = Bpe.train(empty, "t", numMerges = 5)
    assert(merges.isEmpty)
    val enc = Seq((1L, "ab")).toDF("id", "t")
      .select(Bpe.encode(Dedup.tokens(col("t")), merges).as("b"))
      .collect()(0).getSeq[String](0)
    assert(enc == Seq("a", "b", Bpe.Eow))
  }

  test("transformColumns: the reference suffix/new_column_names contract") {
    // tests/functions/test_transform_columns.py over log10(10)=1, log10(100)=2
    import graft.operators.TransformOps
    val d = Seq((10.0, 100.0)).toDF("another", "column")
    val inPlace = TransformOps.transformColumns(d, Seq("another", "column"), log10)
    assert(inPlace.collect()(0).getDouble(0) == 1.0 &&
      inPlace.collect()(0).getDouble(1) == 2.0)
    val suffixed = TransformOps.transformColumns(d, Seq("another", "column"),
      log10, suffix = Some("_log"))
    assert(suffixed.columns.toSet ==
      Set("another", "column", "another_log", "column_log"))
    val renamed = TransformOps.transformColumns(d, Seq("another", "column"),
      log10, newColumnNames = Map("another" -> "hello", "column" -> "world"))
    assert(renamed.columns.toSet == Set("another", "column", "hello", "world"))
    // keys outside column_names pass through silently (reference bug #1063)
    val partial = TransformOps.transformColumns(d, Seq("another", "column"),
      log10, newColumnNames = Map("another" -> "hello", "fakecol" -> "world"))
    assert(partial.columns.toSet ==
      Set("another", "column", "hello")) // 'column' transformed in place
    // both suffix and new_column_names raises
    intercept[IllegalArgumentException](TransformOps.transformColumns(d,
      Seq("another"), log10, suffix = Some("_log"),
      newColumnNames = Map("another" -> "hello")))
    // a rename target that already exists in the frame raises — the
    // reference's check_column(df, new_col, present=False) fires for every
    // old != new even when the colliding column is itself being renamed
    // away (transform_columns.py:230-232)
    intercept[IllegalArgumentException](TransformOps.transformColumns(d,
      Seq("another", "column"), log10,
      newColumnNames = Map("another" -> "column", "column" -> "c2")))
    // suffix-derived destinations collide too: transform_columns.py builds
    // dest_column_names from the suffix path through the SAME old != new
    // check, so suffix="_log" onto a frame that already has another_log raises
    val withLog = d.withColumn("another_log", lit(0.0))
    intercept[IllegalArgumentException](TransformOps.transformColumns(withLog,
      Seq("another"), log10, suffix = Some("_log")))
    // ...but an UNUSED dict key colliding with an existing column does NOT
    // raise — dest names derive only from column_names (the #1063 passthrough)
    val unusedCollision = TransformOps.transformColumns(d, Seq("another"),
      log10, newColumnNames = Map("another" -> "hello", "fake" -> "column"))
    assert(unusedCollision.columns.toSet == Set("another", "column", "hello"))
  }

  test("round-14 verbs on empty/degenerate inputs") {
    import graft.llm.TextAnalysis
    import graft.streaming.StreamingOps
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    // heavyHitters on an empty corpus: one empty sketch row -> zero output
    assert(TextAnalysis.heavyHitters(empty, "text", 16, 5).count() == 0)
    // null texts contribute no tokens and don't crash the MG update
    val withNulls = Seq((1L, "a a b"), (2L, null)).toDF("doc_id", "text")
    val hh = TextAnalysis.heavyHitters(withNulls, "text", 16, 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh == Map("a" -> 2L, "b" -> 1L))
    // fuzzyMatchFlags with an empty reference: no matches, schema intact
    val q = Seq((1L, "abc")).toDF("id", "s")
    val out = StreamingOps.fuzzyMatchFlags(q, "id", "s",
      empty.select(col("doc_id"), col("text")), "doc_id", "text", maxDist = 1)
    assert(out.columns.toSeq == Seq("id", "ref_id", "dist") && out.count() == 0)
    // nearDupFlags with an empty reference: empty, no crash
    assert(StreamingOps.nearDupFlags(withNulls, "doc_id", "text",
      empty, threshold = 0.8).count() == 0)
  }

  test("round-20 URL verbs on null/degenerate inputs") {
    import graft.llm.TextAnalysis
    // null url -> null canon and null domain (no crash, no empty-string alias)
    val nulls = Seq((1L, null: String), (2L, ""), (3L, "http://ok.com/x"))
      .toDF("id", "url")
    val c = nulls.select(col("id"),
      TextAnalysis.canonicalizeUrl(col("url")).as("canon"),
      TextAnalysis.extractRegisteredDomain(col("url")).as("dom")).collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), Option(r.getString(2)))).toMap
    assert(c(1L) == (None, None))
    assert(c(2L) == (Some(""), Some("")))
    assert(c(3L) == (Some("http://ok.com/x"), Some("ok.com")))
    // blocklist contract for unparseable rows: a null/empty-domain row is
    // NOT blocked (anti-join keeps unmatched keys, and null keys never
    // match) but IS dropped by an allowlist — pinned, not accidental
    val blocked = TextAnalysis.filterDomains(nulls, "url", Seq("ok.com"))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(blocked.sameElements(Array(1L, 2L)))
    val kept = TextAnalysis.filterDomains(nulls, "url", Seq("ok.com"),
      keep = true).select("id").collect().map(_.getLong(0))
    assert(kept.sameElements(Array(3L)))
    // empty-frame blocklist input: empty out, schema intact
    val empty = nulls.filter(lit(false))
    assert(TextAnalysis.filterDomains(empty, "url", Seq("x.com"))
      .columns.toSeq == Seq("id", "url"))
    // c4PageFilter on null text: keep is NULL — `filter($"c4.keep")`
    // drops the row, operationally identical to false, and no crash
    val pg = Seq((1L, null: String)).toDF("id", "t")
      .select(TextAnalysis.c4PageFilter(col("t")).as("c"))
      .select(col("c.keep")).collect()
    assert(pg(0).isNullAt(0))
  }
}
