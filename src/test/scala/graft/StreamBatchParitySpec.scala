package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream/batch parity: for verbs with exact batch twins, the streaming
  * form must produce the same answer as the engine's own batch operator on
  * the same data — pinning the stream/batch contract independently of the
  * DuckDB oracle SQL (VERDICT r18 #7). Arrival order is made deterministic
  * where the contract depends on it (one addData batch per doc/row).
  */
class StreamBatchParitySpec extends SparkSpec {
  import spark.implicits._

  test("count_cumulative_unique: stream per-key state equals batch running count") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val q = StreamingOps.countCumulativeUnique(in.toDF().toDF("k", "v"), "k", "v")
      .writeStream.format("memory").queryName("ccu_parity").outputMode("append").start()
    val arrivals = Seq("a", "b", "a", "c", "b", "d")
    // one batch per row: arrival order == batch orderCol order by contract
    arrivals.foreach { v => in.addData(("g", v)); q.processAllAvailable() }
    q.stop()
    val stream = spark.table("ccu_parity")
      .select("v", "cum_unique").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val batch = arrivals.zipWithIndex.map { case (v, i) => (v, i.toLong) }
      .toDF("v", "ord")
      .transform(d => operators.GroupedOps.countCumulativeUnique(
        d, "v", "ord", "cum"))
      .select("v", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(stream == batch)
    assert(stream.map(_._2).max == 4L)
  }

  test("flag_jumps: stream abs-threshold flags equal the batch operator's") {
    implicit val sq = spark.sqlContext
    val rows = Seq((1L, 1.0), (2L, 1.5), (3L, 5.0), (4L, 5.2), (5L, 0.0), (6L, 0.1))
    val in = MemoryStream[(String, Long, Double)]
    val q = StreamingOps.flagJumps(in.toDF().toDF("k", "seq", "v"), "k", "v",
        threshold = 2.0, orderCol = Some("seq"))
      .writeStream.format("memory").queryName("fj_parity").outputMode("append").start()
    in.addData(rows.map { case (s, v) => ("k", s, v) }: _*)
    q.processAllAvailable(); q.stop()
    val stream = spark.table("fj_parity").select("v", "jump").collect()
      .map(r => (r.getDouble(0), r.getInt(1))).sorted.toSeq
    val batch = rows.toDF("seq", "v")
      .transform(d => operators.TimeseriesOps.flagJumps(d, "seq",
        operators.TimeseriesOps.JumpCriteria("absolute", "any", 2.0)))
      .select("v", "v_jump_flag").collect()
      .map(r => (r.getDouble(0), r.getInt(1))).sorted.toSeq
    assert(stream == batch)
    assert(stream.count(_._2 == 1) == 2) // 1.5->5.0 and 5.2->0.0
  }

  test("corpus_report: one-window stream report equals the batch report") {
    implicit val sq = spark.sqlContext
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "the quick brown fox jumps over the lazy dog",
      "sphinx of black quartz judge my vow",
      "how vexingly quick daft zebras jump",
      "short one")
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:30")
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val q = StreamingOps.corpusReportStream(in.toDF().toDF("ts", "text"),
        "ts", "10 seconds", "1 hour", "text")
      .writeStream.format("memory").queryName("cr_parity").outputMode("complete").start()
    in.addData(texts.map(t => (ts, t)): _*)
    q.processAllAvailable(); q.stop()
    val stream = spark.table("cr_parity")
    assert(stream.count() == 1)
    val s = stream.select("n_docs", "n_tokens", "n_chars", "avg_tokens",
      "n_distinct_texts", "dup_text_frac", "mean_quality").collect()(0)
    val b = graft.llm.TextAnalysis.corpusReport(texts.toDF("text"), "text")
      .select("n_docs", "n_tokens", "n_chars", "avg_tokens",
        "n_distinct_texts", "dup_text_frac", "mean_quality").collect()(0)
    // every exact-sum column agrees bit-for-bit; the distinct count rides
    // HLL in the stream (the constant-state 100 TB answer) — exact at this
    // cardinality, and the derived dup fraction with it
    assert(s == b)
  }

  test("dedup_lines: stream first-arrival keep reassembles to the batch text") {
    implicit val sq = spark.sqlContext
    val L1 = "this is a sufficiently long duplicated line"
    val L2 = "another long line that appears in two documents"
    val L3 = "a unique long line that only document three has"
    val docs = Seq(
      (1L, s"$L1\nhi\n$L2"),
      (2L, s"$L2\n$L1\nok"),
      (3L, s"$L3\nhi\n$L1"))
    val in = MemoryStream[(Long, String)]
    val q = StreamingOps.dedupLinesStream(in.toDF().toDF("doc_id", "text"),
        "doc_id", "text")
      .writeStream.format("memory").queryName("dl_parity").outputMode("append").start()
    // one batch per doc, ascending id: first arrival == batch's min(id, idx)
    docs.foreach { d => in.addData(d); q.processAllAvailable() }
    q.stop()
    val reassembled = spark.table("dl_parity")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_lines_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("idx"), col("line")))),
          x => x.getField("line")), "\n").as("text"))
      .select(col("id").as("doc_id"), col("text"), col("n_lines_kept"))
    val batch = graft.llm.Dedup.dedupLines(docs.toDF("doc_id", "text"),
      "doc_id", "text")
    val sNorm = reassembled.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(1 + 1)))
    val bNorm = batch.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(sNorm.toSeq == bNorm.toSeq)
    // duplicates really were dropped: L1 survives only in doc 1
    assert(sNorm.count(_._2.contains(L1)) == 1)
  }

  test("filter_domains: stream left-outer+isNull equals the batch anti-join") {
    implicit val sq = spark.sqlContext
    val rows = Seq(
      (1L, "https://spam.example.com/x"),
      (2L, "http://a.good.org/y"),
      (3L, "https://alice.github.io/z"),
      (4L, "bob.github.io/w"),
      (5L, "http://10.0.4.25/x"))
    val list = Seq("example.com", "alice.github.io", "10.0.4.25").toDF("domain")
    val psl = Seq("github.io")
    def run(keep: Boolean): Seq[Long] = {
      val in = MemoryStream[(Long, String)]
      val q = StreamingOps.filterDomainsStream(in.toDF().toDF("id", "url"),
          "url", list, keep = keep, suffixes = psl)
        .writeStream.format("memory").queryName(s"fd_parity_$keep")
        .outputMode("append").start()
      in.addData(rows: _*); q.processAllAvailable(); q.stop()
      spark.table(s"fd_parity_$keep").select("id").collect()
        .map(_.getLong(0)).sorted.toSeq
    }
    def batch(keep: Boolean): Seq[Long] =
      graft.llm.TextAnalysis.filterDomainsBy(rows.toDF("id", "url"), "url",
          list, keep = keep, suffixes = psl)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(run(keep = false) == batch(keep = false))
    assert(run(keep = true) == batch(keep = true))
    // and the blocklist really bit: bob.github.io survives, alice doesn't
    assert(run(keep = false) == Seq(2L, 4L))
  }
}
