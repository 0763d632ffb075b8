package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** Streaming oracle lane (VERDICT r10 #5): the stateful streaming verbs run
  * as REAL bounded streaming queries inside the correctness gate — file
  * source over the same testdata parquet, Structured Streaming execution,
  * memory sink — and the finished result is handed to the driver's DuckDB
  * compare like any batch gate. Complete output mode + processAllAvailable
  * flushes every window without watermark sentinels; state is bounded by
  * the gate input (sf0.01), while the operators themselves carry watermarks
  * for the unbounded case.
  *
  * All gated outputs follow the integer-projection policy (COVERAGE.md
  * "Driver-hash float policy"): cents sums, counts, and timestamp strings —
  * no computed doubles in any hashed column.
  */
object QueriesStreaming {
  private type Q = (SparkSession, String) => DataFrame

  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  private val TsFmtSql = "%Y-%m-%d %H:%M:%S.%f"

  /** The file stream source requires a DIRECTORY; the testdata tables are
    * single parquet files. Expose each as a one-file directory of symlinks
    * (no data copy) under the JVM temp dir — created once per (dir, table).
    */
  private def streamDirFor(dir: String, table: String): String = {
    import java.nio.file.{Files, Paths}
    val src = Paths.get(dir, s"$table.parquet")
    val d = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft-stream-${Integer.toHexString(dir.hashCode)}-$table")
    if (!Files.isDirectory(d)) Files.createDirectories(d)
    val link = d.resolve(s"$table.parquet")
    if (!Files.exists(link)) Files.createSymbolicLink(link, src)
    d.toString
  }

  /** Events as a file-source stream (the production ingest shape): the
    * batch-inferred schema + the same ts normalization [[Tables.events]]
    * applies (NANOS-as-long vs MICROS dispatch).
    */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    val st = s.readStream.schema(raw.schema)
      .parquet(streamDirFor(dir, "events"))
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        st.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => st.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  private def documentsStream(s: SparkSession, dir: String): DataFrame = {
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    s.readStream.schema(schema).parquet(streamDirFor(dir, "documents"))
  }

  /** Drive a bounded streaming query to completion into a memory sink and
    * return the sink table as a batch frame.
    */
  private def runToCompletion(df: DataFrame, name: String,
      mode: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    df.sparkSession.table(name)
  }

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  val entries: Map[String, Q] = Map(
    // native session_window, gap 6h per user — the streaming twin of the
    // batch session_stats gate (same user/gap), end = last event + gap
    "session_window_stream" -> ((s, d) =>
      runToCompletion(
        StreamingOps.sessionWindowStats(
          eventsStream(s, d).select("user_id", "ts"),
          "ts", "1 hour", "6 hours", Seq("user_id")),
        "gr_session_window_stream", "complete")
        .select(col("user_id"),
          date_format(col("session_start"), TsFmt).as("session_start"),
          date_format(col("session_end"), TsFmt).as("session_end"),
          col("n_events"))),
    // overlapping 6h windows sliding 2h, per user, exact cents sum — the
    // streaming rolling_agg
    "sliding_window_stream" -> ((s, d) =>
      runToCompletion(
        StreamingOps.slidingWindowAgg(
          eventsStream(s, d).select(col("user_id"), col("ts"),
            cents(col("value")).as("cents")),
          "ts", "1 hour", "6 hours", "2 hours", Seq("user_id"),
          "cents", "sum"),
        "gr_sliding_window_stream", "complete")
        .select(col("user_id"),
          date_format(col("window.start"), TsFmt).as("window_start"),
          date_format(col("window.end"), TsFmt).as("window_end"),
          col("sum_cents"))),
    // tumbling 1h event-time windows by event type
    "windowed_agg_stream" -> ((s, d) =>
      runToCompletion(
        StreamingOps.windowedAgg(
          eventsStream(s, d).select(col("event_type"), col("ts"),
            cents(col("value")).as("cents")),
          "ts", "1 hour", "1 hour", Seq("event_type"), "cents", "sum"),
        "gr_windowed_agg_stream", "complete")
        .select(col("event_type"),
          date_format(col("window.start"), TsFmt).as("window_start"),
          col("sum_cents"))),
    // cross-batch C4 line dedup: which duplicate survives dropDuplicates is
    // batch-order-dependent, but the SET of normalized kept long lines (and
    // the short-line pass-through count) is deterministic — gate those
    "dedup_lines_stream" -> ((s, d) => {
      val kept = runToCompletion(
        StreamingOps.dedupLinesStream(documentsStream(s, d)
            .select("doc_id", "text"),
          "doc_id", "text", minLineChars = 10, sep = " a "),
        "gr_dedup_lines_stream", "append")
      val long = kept.filter(length(trim(col("line"))) >= 10)
        .select(lower(trim(col("line"))).as("norm_line"))
        .distinct()
        .agg(count(lit(1)).as("n"),
          md5(concat_ws("", sort_array(collect_list("norm_line")))
            .cast("binary")).as("set_md5"))
      val short = kept.filter(length(trim(col("line"))) < 10)
        .agg(count(lit(1)).as("n_short"))
      long.crossJoin(short)
    })
  )

  val oracles: Map[String, String] = Map(
    // session_window semantics: windows [ts, ts+gap) merge on overlap, so a
    // gap of EXACTLY 6h starts a new session (>=); end = last event + gap.
    // Microsecond-precision event times make exact ties measure-zero anyway.
    "session_window_stream" ->
      s"""WITH e AS (SELECT user_id, ts, epoch_us(ts) AS tu FROM events),
         |x AS (SELECT user_id, ts, tu,
         |    CASE WHEN lag(tu) OVER w IS NULL
         |           OR tu - lag(tu) OVER w >= 21600000000 THEN 1 ELSE 0 END AS brk
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu)),
         |g AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id
         |    ORDER BY tu ROWS UNBOUNDED PRECEDING) AS sid FROM x)
         |SELECT user_id,
         |  strftime(min(ts), '$TsFmtSql') AS session_start,
         |  strftime(max(ts) + INTERVAL 6 HOUR, '$TsFmtSql') AS session_end,
         |  count(*) AS n_events
         |FROM g GROUP BY user_id, sid""".stripMargin,
    // Spark's window(ts, 6h, 2h) is epoch-aligned: an event lands in the
    // three windows starting at floor(tu/2h)*2h - j*2h, j = 0..2
    "sliding_window_stream" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS tu,
         |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
         |w AS (SELECT user_id, cents,
         |    ((tu // 7200000000) - j.j) * 7200000000 AS ws
         |  FROM e, (SELECT unnest([0, 1, 2]) AS j) j)
         |SELECT user_id,
         |  strftime(make_timestamp(ws), '$TsFmtSql') AS window_start,
         |  strftime(make_timestamp(ws + 21600000000), '$TsFmtSql') AS window_end,
         |  sum(cents) AS sum_cents
         |FROM w GROUP BY user_id, ws""".stripMargin,
    "windowed_agg_stream" ->
      s"""SELECT event_type,
         |  strftime(make_timestamp((epoch_us(ts) // 3600000000) * 3600000000),
         |    '$TsFmtSql') AS window_start,
         |  sum(CAST(round(value * 100) AS BIGINT)) AS sum_cents
         |FROM events GROUP BY 1, 2""".stripMargin,
    "dedup_lines_stream" ->
      """WITH l AS (SELECT unnest(string_split(text, ' a ')) AS line FROM documents),
        |k AS (SELECT DISTINCT lower(trim(line)) AS norm_line FROM l
        |      WHERE length(trim(line)) >= 10),
        |agg AS (SELECT count(*) AS n,
        |    md5(string_agg(norm_line, chr(1) ORDER BY norm_line)) AS set_md5
        |  FROM k),
        |s AS (SELECT count(*) AS n_short FROM l WHERE length(trim(line)) < 10)
        |SELECT n, set_md5, n_short FROM agg, s""".stripMargin
  )
}
