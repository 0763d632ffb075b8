package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def runToCompletion(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("stateless verbs run unchanged on streaming frames") {
    import graft.syntax._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    in.addData((1L, "A b-C"), (2L, "x"))
    val out = runToCompletion(
      in.toDF().toDF("id", "S Val")
        .cleanNames()
        .updateWhere("id = 2", "flag", 1),
      "stateless_out")
    assert(out.columns.toSeq == Seq("id", "s_val", "flag"))
    assert(out.count() == 2)
    // the r19 codegen kernels are stateless column expressions — they run
    // on a stream with no watermark or state store
    val in2 = MemoryStream[(String, String)]
    in2.addData(("https://a.example.co.uk/x",
      "good long line with plenty of words here.\nshort."))
    val out2 = runToCompletion(
      in2.toDF().toDF("url", "text").select(
        graft.llm.TextAnalysis.extractRegisteredDomain(col("url")).as("dom"),
        graft.llm.TextAnalysis.c4LineFilter(col("text")).as("clean")),
      "stateless_r19_out")
    val r = out2.collect()(0)
    assert(r.getString(0) == "example.co.uk")
    assert(r.getString(1).startsWith("good long") && !r.getString(1).contains("short"))
  }

  test("pca projection is stateless and agrees with batch on a stream") {
    implicit val sq = spark.sqlContext
    import graft.llm.Pca
    val vecs = (0 until 16).map(i =>
      (i.toLong, Array.tabulate(4)(d => (math.sin(i * 0.7 * (d + 1))).toFloat)))
    val batch = vecs.toDF("id", "v")
    val model = Pca.fit(batch, "v", 2)
    val expected = Pca.project(batch, "v", model, whiten = true, outCol = "p")
      .select(col("id"), col("p")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val in = MemoryStream[(Long, Array[Float])]
    in.addData(vecs: _*)
    val out = runToCompletion(
      Pca.project(in.toDF().toDF("id", "v"), "v", model,
        whiten = true, outCol = "p"),
      "pca_stream_out")
    val got = out.select(col("id"), col("p")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, p) =>
      p.zip(expected(id)).foreach { case (a, b) => assert(a == b,
        s"stream/batch projection drift for id=$id") }
    }
  }

  test("sampling, splitting, and chunking run unchanged on streaming frames") {
    // all three are narrow projections/filters — the streaming proof is that
    // the SAME call works on an unbounded frame and agrees with batch
    import graft.syntax._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val rows = (1L to 50L).map(i => (i, s"tok$i tok${i + 1} tok${i + 2}"))
    in.addData(rows: _*)
    val out = runToCompletion(
      in.toDF().toDF("doc_id", "text")
        .hashSplit("doc_id")
        .hashSample("doc_id", 0.6),
      "sampled_out")
    val batch = rows.toDF("doc_id", "text").hashSplit("doc_id").hashSample("doc_id", 0.6)
    assert(out.collect().map(_.toSeq).toSet == batch.collect().map(_.toSeq).toSet)
    val chunks = runToCompletion(
      graft.llm.TextAnalysis.chunkDocuments(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text", 2, 2),
      "chunks_out")
    assert(chunks.count() == 100) // 3 tokens → chunks [0,1] and [2]
  }

  test("asofEnrich (stream-static) agrees with the batch asofJoin") {
    import graft.syntax._
    implicit val sq = spark.sqlContext
    val static = Seq(("a", 0L, 9.5), ("a", 5L, 10.5), ("b", 4L, 19.5))
      .toDF("sym", "t", "bid")
    val events = Seq(("a", 1L), ("a", 5L), ("a", 9L), ("b", 3L), ("c", 2L))
    val in = MemoryStream[(String, Long)]
    in.addData(events: _*)
    val out = runToCompletion(
      StreamingOps.asofEnrich(in.toDF().toDF("sym", "t"), static, on = "t",
        by = Seq("sym")),
      "asof_out")
    val got = out.select("sym", "t", "bid").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    val batch = events.toDF("sym", "t")
      .asofJoin(static, on = "t", by = Seq("sym"))
      .select("sym", "t", "bid").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(got == batch)
    assert(got == Set(("a", 1L, 9.5), ("a", 5L, 10.5), ("a", 9L, 10.5),
      ("b", 3L, null), ("c", 2L, null)))
  }

  test("windowedAgg aggregates by event-time window with watermark") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    in.addData(
      (ts("2024-01-01 00:00:10"), "click", 1.0),
      (ts("2024-01-01 00:00:50"), "click", 2.0),
      (ts("2024-01-01 00:05:10"), "view", 5.0))
    val agg = StreamingOps.windowedAgg(in.toDF().toDF("ts", "etype", "v"),
      "ts", "10 minutes", "5 minutes", Seq("etype"), "v", "sum")
    val out = runToCompletion(agg, "windowed_out", mode = "complete")
    val byType = out.collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(byType == Map("click" -> 3.0, "view" -> 5.0))
  }

  test("corpusReportStream matches the batch report per window (HLL exact at small cardinality)") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val a = "alpha beta gamma"; val b = "delta epsilon"
    in.addData(
      (ts("2024-01-01 00:00:10"), a),
      (ts("2024-01-01 00:00:20"), a),   // dup within window 1
      (ts("2024-01-01 00:00:40"), b),
      (ts("2024-01-01 00:11:00"), b))   // window 2
    val rep = StreamingOps.corpusReportStream(in.toDF().toDF("ts", "text"),
      "ts", "10 minutes", "10 minutes", "text")
    val out = runToCompletion(rep, "report_out", mode = "complete")
      .orderBy("window.start").collect()
    assert(out.length == 2)
    val w1 = out(0)
    assert(w1.getAs[Long]("n_docs") == 3L)
    assert(w1.getAs[Long]("n_tokens") == 8L)      // 3 + 3 + 2
    assert(w1.getAs[Long]("n_distinct_texts") == 2L)
    assert(math.abs(w1.getAs[Double]("dup_text_frac") - 1.0 / 3) < 1e-6)
    // the batch report over window-1's rows agrees on every column
    val batch = graft.llm.TextAnalysis.corpusReport(
      Seq(a, a, b).toDF("text"), "text").collect().head
    assert(batch.getAs[Long]("n_tokens") == w1.getAs[Long]("n_tokens"))
    assert(batch.getAs[Double]("mean_quality") == w1.getAs[Double]("mean_quality"))
    assert(batch.getAs[Double]("dup_text_frac") == w1.getAs[Double]("dup_text_frac"))
    val w2 = out(1)
    assert(w2.getAs[Long]("n_docs") == 1L && w2.getAs[Double]("dup_text_frac") == 0.0)
  }

  test("countCumulativeUnique tracks running distinct per key") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, String)]
    in.addData(("u1", "a"), ("u1", "b"), ("u1", "a"), ("u2", "z"))
    val out = runToCompletion(
      StreamingOps.countCumulativeUnique(in.toDF().toDF("k", "v"), "k", "v"),
      "ccu_out")
    val u1 = out.filter(col("k") === "u1").collect().map(_.getLong(2)).sorted.toSeq
    assert(u1 == Seq(1L, 2L, 2L))
    assert(out.filter(col("k") === "u2").collect().map(_.getLong(2)).toSeq == Seq(1L))
  }

  test("BottomKByHash aggregates on streams (custom TypedImperativeAggregate in streaming state)") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, String)]
    in.addData(("g1", "a"), ("g1", "b"), ("g1", "c"), ("g2", "z"))
    val agg = in.toDF().toDF("g", "v")
      .groupBy("g")
      .agg(graft.functions.aggregates.bottom_k_by_hash(col("v"), 2).as("s"))
    val out = runToCompletion(agg, "bkh_out", mode = "complete")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    assert(out("g1") == List("a", "b", "c").sortBy(md5hex).take(2))
    assert(out("g2") == List("z"))
  }

  test("slidingWindowAgg lands each event in every covering window") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Double)]
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    in.addData((ts("2024-01-01 00:07:00"), 3.0), (ts("2024-01-01 00:12:00"), 5.0))
    val agg = StreamingOps.slidingWindowAgg(in.toDF().toDF("ts", "v"),
      "ts", "10 minutes", "10 minutes", "5 minutes", Nil, "v", "sum")
    val out = runToCompletion(agg, "sliding_out", mode = "complete")
      .selectExpr("window.start AS s", "sum_v").collect()
      .map(r => r.getTimestamp(0).toString.take(16) -> r.getDouble(1)).toMap
    // event at :07 covers windows starting :00 and :05; :12 covers :05 and :10
    assert(out == Map("2024-01-01 00:00" -> 3.0, "2024-01-01 00:05" -> 8.0,
      "2024-01-01 00:10" -> 5.0))
  }

  test("sessionWindowStats merges events into gap-bounded sessions (batch parity)") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    in.addData(
      (ts("2024-01-01 00:00:00"), "u1"),
      (ts("2024-01-01 00:10:00"), "u1"),   // same session (gap 10m < 1h)
      (ts("2024-01-01 02:00:01"), "u1"),   // new session
      (ts("2024-01-01 00:05:00"), "u2"))
    val out = runToCompletion(
      StreamingOps.sessionWindowStats(in.toDF().toDF("ts", "user"),
        "ts", "10 minutes", "1 hour", Seq("user")),
      "session_out", mode = "complete")
      .collect().map(r => (r.getString(0), r.getLong(3))).sorted.toSeq
    // u1: sessions of 2 and 1 events; u2: one single-event session — the
    // same grouping the batch sessionize spec pins at gap 3600
    assert(out == Seq(("u1", 1L), ("u1", 2L), ("u2", 1L)))
  }

  test("flagJumps flags per-key deltas beyond threshold") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, Double)]
    in.addData(("k", 1.0), ("k", 2.0), ("k", 50.0), ("j", 100.0))
    val out = runToCompletion(
      StreamingOps.flagJumps(in.toDF().toDF("k", "v"), "k", "v", threshold = 10.0),
      "jumps_out")
    val flags = out.filter(col("k") === "k").orderBy("v").collect().map(_.getInt(2)).toSeq
    assert(flags == Seq(0, 0, 1))
    assert(out.filter(col("k") === "j").collect().map(_.getInt(2)).toSeq == Seq(0))
  }

  test("flagJumps with orderCol follows event order, not arrival order") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, Long, Double)]
    // arrival order scrambled: event order by seq is 1.0 -> 2.0 -> 50.0,
    // so exactly one jump (2.0 -> 50.0); arrival order 50.0 -> 1.0 -> 2.0
    // would flag 50.0 -> 1.0 instead
    in.addData(("k", 3L, 50.0), ("k", 1L, 1.0), ("k", 2L, 2.0))
    val out = runToCompletion(
      StreamingOps.flagJumps(in.toDF().toDF("k", "seq", "v"), "k", "v",
        threshold = 10.0, orderCol = Some("seq")),
      "jumps_ord_out")
    val byV = out.collect().map(r => r.getDouble(1) -> r.getInt(2)).toMap
    assert(byV == Map(1.0 -> 0, 2.0 -> 0, 50.0 -> 1))
  }

  test("dedupStream drops duplicate keys within the watermark") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    in.addData((t, 1L), (t, 1L), (t, 2L))
    val out = runToCompletion(
      StreamingOps.dedupStream(in.toDF().toDF("ts", "id"), "ts", "1 minute", Seq("id")),
      "dedup_out")
    assert(out.count() == 2)
  }

  test("ivfTopKStream matches the batch IVF ranking for the same centroids") {
    implicit val sq = spark.sqlContext
    val rng = new scala.util.Random(11)
    val centers = Array.fill(4, 8)(rng.nextGaussian().toFloat * 5f)
    val corpus = (0 until 120).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + rng.nextGaussian().toFloat * 0.3f))
    }.toDF("vec_id", "embedding")
    val centroids = graft.llm.Similarity.trainCentroids(
      corpus, "vec_id", "embedding", nCells = 8, kmeansIters = 3)
    val queryRows = (0 until 3).map(i => (1000L + i, centers(i).map(_ + 0.1f)))
    val in = MemoryStream[(Long, Array[Float])]
    in.addData(queryRows: _*)
    val streamed = runToCompletion(
      StreamingOps.ivfTopKStream(in.toDF().toDF("vec_id", "embedding"),
        corpus, "vec_id", "embedding", k = 5, centroids, nProbe = 2),
      "ivf_stream_out", mode = "update")
    val batch = graft.llm.Similarity.ivfCosineTopK(
      queryRows.toDF("vec_id", "embedding"), corpus.unionAll(queryRows.toDF("vec_id", "embedding")),
      "vec_id", "embedding", k = 5, nCells = 8, nProbe = 2, kmeansIters = 3)
    // the streamed query vectors are not part of the static corpus, so
    // compare against the batch ranking restricted to corpus neighbors
    val got = streamed.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty && got.map(_._1) == queryRows.map(_._1).toSet)
    // every streamed neighbor must carry the exact batch-formula similarity
    val brute = graft.llm.Similarity.cosineTopK(
      queryRows.toDF("vec_id", "embedding"),
      corpus.unionAll(queryRows.toDF("vec_id", "embedding")),
      "vec_id", "embedding", k = 120)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    got.foreach { case (q, n, s) => assert(brute((q, n)) == s, s"sim mismatch for ($q,$n)") }
    assert(batch.count() > 0)
  }

  test("dedupLinesStream drops repeated long lines across micro-batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamingOps.dedupLinesStream(in.toDF().toDF("doc_id", "text"),
      "doc_id", "text")
      .writeStream.format("memory").queryName("lines_out").outputMode("append").start()
    in.addData((1L, "shared boilerplate line\nunique first"), (2L, "shared boilerplate line\nok"))
    q.processAllAvailable()
    // second batch repeats the boilerplate -> still deduped (cross-batch state)
    in.addData((3L, "shared boilerplate line\nanother unique line"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("lines_out").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    assert(rows.contains((1L, "shared boilerplate line")) ||
      rows.contains((2L, "shared boilerplate line")),
      "exactly one batch-1 doc carries the boilerplate's first occurrence")
    assert(rows.count(_._2 == "shared boilerplate line") == 1)
    assert(!rows.exists { case (id, l) => id == 3L && l == "shared boilerplate line" })
    assert(rows.contains((3L, "another unique line")))
    // short lines always pass
    assert(rows.contains((2L, "ok")))
  }

  test("ivfPqTopKStream ranks by ADC over the pre-encoded static corpus") {
    implicit val sq = spark.sqlContext
    // corpus vectors sit exactly on codebook centroids -> ADC = exact dot,
    // so the streamed ranking must equal the batch dotTopK ranking
    val cb: Array[Array[Array[Double]]] = Array(
      Array(Array(1.0, 0, 0, 0), Array(0, 1.0, 0, 0)),
      Array(Array(0, 0, 2.0, 0), Array(0, 0, 0, 2.0)))
    def v(a: Int, b: Int): Array[Float] =
      (cb(0)(a) ++ cb(1)(b)).map(_.toFloat)
    val corpus = Seq((1L, v(0, 0)), (2L, v(0, 1)), (3L, v(1, 0)), (4L, v(1, 1)))
      .toDF("vec_id", "embedding")
    val cents = Array(Array(0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5))
    val in = MemoryStream[(Long, Array[Float])]
    in.addData((100L, v(0, 0)), (101L, v(1, 1)))
    val streamed = runToCompletion(
      StreamingOps.ivfPqTopKStream(in.toDF().toDF("vec_id", "embedding"),
        corpus, "vec_id", "embedding", k = 2, cents, cb, nProbe = 1),
      "ivfpq_stream_out", mode = "update")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.llm.Similarity.dotTopK(
      Seq((100L, v(0, 0)), (101L, v(1, 1))).toDF("vec_id", "embedding"),
      corpus, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch)
  }

  test("fuzzyMatchFlags resolves streamed strings against a static reference") {
    implicit val sq = spark.sqlContext
    val ref = Seq((10L, "alpha"), (11L, "beta"), (12L, "gamma")).toDF("rid", "name")
    val in = MemoryStream[(Long, String)]
    in.addData((1L, "alpah"), (2L, "betas"), (3L, "alpha"), (4L, "nomatch"))
    val out = runToCompletion(
      graft.streaming.StreamingOps.fuzzyMatchFlags(
        in.toDF().toDF("id", "s"), "id", "s", ref, "rid", "name", maxDist = 2),
      "fuzzy_flags_out", mode = "complete")
    val m = out.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(m(1L) == ((10L, 2)))  // transposition = 2 edits
    assert(m(2L) == ((11L, 1)))
    assert(m(3L) == ((10L, 0)))  // exact match, distance 0
    assert(!m.contains(4L))
  }

  test("fuzzyMatchFlags pinned index equals unpinned across micro-batches") {
    implicit val sq = spark.sqlContext
    val ref = Seq((10L, "alpha"), (11L, "beta"), (12L, "gamma")).toDF("rid", "name")
    def runPin(pin: Boolean): Map[Long, (Long, Int)] = {
      val in = MemoryStream[(Long, String)]
      // two explicit batches: the pinned variant must serve batch 2 from
      // the cached index with the same results as a fresh derivation
      in.addData((1L, "alpah"), (2L, "betas"))
      in.addData((3L, "gamm"), (4L, "nomatch"))
      runToCompletion(
        graft.streaming.StreamingOps.fuzzyMatchFlags(
          in.toDF().toDF("id", "s"), "id", "s", ref, "rid", "name",
          maxDist = 2, pin = pin),
        s"fuzzy_pin_${pin}_out", mode = "complete")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    }
    graft.streaming.StreamingOps.unpinFuzzyIndexes() // isolate from other specs
    val pinned = runPin(true)
    // memoization: same reference + columns + maxDist = ONE pinned entry,
    // even across two query constructions
    assert(graft.streaming.StreamingOps.pinnedFuzzyIndexCount == 1)
    val pinnedAgain = runPin(true)
    assert(graft.streaming.StreamingOps.pinnedFuzzyIndexCount == 1)
    assert(pinnedAgain == pinned)
    val unpinned = runPin(false)
    assert(graft.streaming.StreamingOps.pinnedFuzzyIndexCount == 1) // pin=false adds none
    assert(pinned == unpinned)
    assert(pinned(3L) == ((12L, 1)))
    assert(!pinned.contains(4L))
    // release contract: unpin reports the count and empties the memo
    assert(graft.streaming.StreamingOps.unpinFuzzyIndexes() == 1)
    assert(graft.streaming.StreamingOps.pinnedFuzzyIndexCount == 0)
  }

  test("nearDupFlags verifies streamed docs against a static corpus by exact Jaccard") {
    implicit val sq = spark.sqlContext
    val base = (1 to 60).map(i => s"corp$i").mkString(" ")
    val ref = Seq((100L, base), (101L, (1 to 60).map(i => s"ref$i").mkString(" ")))
      .toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)]
    in.addData(
      (1L, base + " tailword"),                           // near-dup of 100
      (2L, (1 to 60).map(i => s"fresh$i").mkString(" "))) // unrelated
    val out = runToCompletion(
      StreamingOps.nearDupFlags(in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", ref, threshold = 0.8),
      "neardup_out", mode = "update")
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(t => (t._1, t._2)).toSeq == Seq((1L, 100L)))
    assert(rows.head._3 >= 0.8)
  }

  test("embeddingNearDupFlags flags streamed vectors near a static reference") {
    implicit val sq = spark.sqlContext
    val mk = (seed: Int) => Array.tabulate(8)(d => math.sin(seed * 0.7 * (d + 1)).toFloat)
    val ref = Seq((100L, mk(3)), (101L, mk(17))).toDF("vid", "v")
    val in = MemoryStream[(Long, Array[Float])]
    in.addData((1L, mk(3)), (2L, mk(999))) // copy of ref 100; unrelated
    val out = runToCompletion(
      StreamingOps.embeddingNearDupFlags(in.toDF().toDF("vid", "v"),
        "vid", "v", ref, threshold = 0.99),
      "embflags_out", mode = "update")
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(t => (t._1, t._2)).toSeq == Seq((1L, 100L)))
    assert(rows.head._3 >= 0.999999)
    intercept[IllegalArgumentException] {
      StreamingOps.embeddingNearDupFlags(in.toDF().toDF("vid", "v"),
        "vid", "v", ref.limit(0), threshold = 0.99)
    }
  }

  test("contaminationFlags joins streamed fingerprints against a static benchmark index") {
    implicit val sq = spark.sqlContext
    val bench = (1 to 30).map(i => s"secret$i").mkString(" ")
    val refIndex = graft.llm.Dedup.winnowFingerprints(
      Seq((0L, bench)).toDF("id", "t"), "id", "t")
    val in = MemoryStream[(Long, String)]
    in.addData(
      (1L, "totally unrelated words that never overlap anything here at all"),
      (2L, "preamble text then " + bench + " then a closing remark"))
    val out = runToCompletion(
      StreamingOps.contaminationFlags(in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", refIndex, minShared = 3),
      "contam_out", mode = "update")
    val flagged = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.keySet == Set(2L))
    assert(flagged(2L) >= 3L)
  }

  test("contaminationFlagsBloom flags identically through the Bloom prefilter") {
    implicit val sq = spark.sqlContext
    val bench = (1 to 30).map(i => s"secret$i").mkString(" ")
    val refIndex = graft.llm.Dedup.winnowFingerprints(
      Seq((0L, bench)).toDF("id", "t"), "id", "t")
    val in = MemoryStream[(Long, String)]
    in.addData(
      (1L, "totally unrelated words that never overlap anything here at all"),
      (2L, "preamble text then " + bench + " then a closing remark"))
    // fpp=0.5 stresses the filter: false positives must die in the exact join
    val out = runToCompletion(
      StreamingOps.contaminationFlagsBloom(in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", refIndex, minShared = 3, fpp = 0.5),
      "contam_bloom_out", mode = "update")
    val flagged = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.keySet == Set(2L))
    assert(flagged(2L) >= 3L)
  }

  test("prepareCorpusStream: gopher keep + decontaminate + split, zero state, batch parity") {
    implicit val sq = spark.sqlContext
    // a "good" doc: >=50 alpha tokens, >=2 distinct stopwords, mean token
    // length inside the Gopher band
    val good = (1 to 60).map(i => s"the quick word$i and").mkString(" ")
    // varied shingles so the benchmark yields many distinct fingerprints
    val bench = (1 to 40).map(i => s"benchmark of passage unit$i the").mkString(" ")
    val in = MemoryStream[(Long, String)]
    in.addData(
      (1L, good),                       // survives
      (2L, "short junk"),               // gopher-dropped (< 50 tokens)
      (3L, bench + " " + good))         // contaminated (shares bench fps)
    val benchmark = Seq((100L, bench)).toDF("doc_id", "text")
    val outDf = StreamingOps.prepareCorpusStream(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", benchmark)
    val out = runToCompletion(outDf, "prep_corpus_out")
    val byId = out.collect().map(r => r.getLong(0) ->
      (r.getLong(2), r.getString(3))).toMap
    assert(byId.keySet == Set(1L))
    assert(byId(1L)._1 == 240L) // 60 units x 4 tokens
    assert(Set("train", "val", "test").contains(byId(1L)._2))
    // zero streaming state: the executed plan must carry no stateful op
    val q = outDf.writeStream.format("memory").queryName("prep_corpus_plan")
      .outputMode("append").start()
    q.processAllAvailable()
    val lastProg = q.lastProgress
    q.stop()
    assert(lastProg.stateOperators.isEmpty,
      s"expected stateless plan, got ${lastProg.stateOperators.length} state ops")
    // batch parity on the same rows
    val batch = Seq((1L, good), (2L, "short junk"), (3L, bench + good))
      .toDF("doc_id", "text")
    val batchOut = StreamingOps.prepareCorpusStream(batch, "doc_id", "text",
      benchmark).collect().map(r => r.getLong(0)).toSet
    assert(batchOut == Set(1L))
  }

  test("streamDirFor: sanitized-path collisions get distinct dirs; stale links repoint") {
    import java.nio.file.{Files, Paths}
    // two distinct source paths whose SANITIZED forms collide ("/" and "_"
    // both map to "_") must not share a symlink directory
    val root = Files.createTempDirectory("graft-sdf").toString
    val a = Files.createDirectories(Paths.get(root, "data", "a"))
    val b = Files.createDirectories(Paths.get(root, "data_a"))
    Files.write(a.resolve("events.parquet"), Array[Byte](1))
    Files.write(b.resolve("events.parquet"), Array[Byte](2))
    val dirA = QueriesStreaming.streamDirFor(a.toString, "events")
    val dirB = QueriesStreaming.streamDirFor(b.toString, "events")
    assert(dirA != dirB, s"collision: $dirA")
    assert(Files.readAllBytes(Paths.get(dirA, "events.parquet")).head == 1)
    assert(Files.readAllBytes(Paths.get(dirB, "events.parquet")).head == 2)
    // a pre-existing link pointing at a DIFFERENT target is repointed, not
    // silently reused
    val link = Paths.get(dirA, "events.parquet")
    Files.delete(link)
    Files.createSymbolicLink(link, b.resolve("events.parquet"))
    val dirA2 = QueriesStreaming.streamDirFor(a.toString, "events")
    assert(dirA2 == dirA)
    assert(Files.readAllBytes(Paths.get(dirA2, "events.parquet")).head == 1)
  }

  test("heavyHittersStream accumulates MG state across micro-batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[String]
    val q = graft.streaming.StreamingOps
      .heavyHittersStream(in.toDF().toDF("text"), "text", capacity = 64)
      .writeStream.format("memory").queryName("hh_stream").outputMode("complete")
      .start()
    in.addData("a a a b", "b c")
    q.processAllAvailable()
    in.addData("a c c d") // second batch must ADD to the first's counts
    q.processAllAvailable()
    q.stop()
    val sk = spark.table("hh_stream").select(explode(col("sketch")).as("hh"))
      .select("hh.token", "hh.est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sk == Map("a" -> 4L, "b" -> 2L, "c" -> 3L, "d" -> 1L))
  }
}
