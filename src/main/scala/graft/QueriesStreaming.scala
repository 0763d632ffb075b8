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

  /** The file stream source requires a DIRECTORY. Multi-file tables
    * (ScaleGen's sf1 lane) already are one — stream them directly; the
    * driver testdata tables are single parquet FILES, so expose those as a
    * one-file directory of symlinks (no data copy) under the JVM temp dir.
    * Keyed by the full sanitized source path (no hashCode collisions);
    * creation races and dangling links from a removed target are absorbed
    * (NOFOLLOW existence check + catch on the create).
    */
  private[graft] def streamDirFor(dir: String, table: String): String = {
    import java.nio.file.{Files, LinkOption, Paths}
    val src = Paths.get(dir, s"$table.parquet").toAbsolutePath.normalize()
    if (Files.isDirectory(src)) return src.toString
    // sanitizing alone can collide (/data/a/x vs /data_a/x) — suffix with a
    // hash of the RAW path so distinct sources never share a directory
    val key = src.toString.replaceAll("[^A-Za-z0-9._-]", "_") +
      "-" + java.lang.Integer.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(src.toString))
    val d = Paths.get(System.getProperty("java.io.tmpdir"), s"graft-stream-$key")
    Files.createDirectories(d)
    val link = d.resolve(s"$table.parquet")
    if (Files.exists(link, LinkOption.NOFOLLOW_LINKS) &&
        (!Files.exists(link) ||
          (Files.isSymbolicLink(link) && Files.readSymbolicLink(link) != src)))
      Files.delete(link) // dangling, or pointing at a different source
    if (!Files.exists(link, LinkOption.NOFOLLOW_LINKS))
      try Files.createSymbolicLink(link, src)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    d.toString
  }

  /** Events as a file-source stream (the production ingest shape): the
    * batch-inferred schema + the same ts normalization [[Tables.events]]
    * applies (NANOS-as-long vs MICROS dispatch).
    */
  /** StreamInvariance seam (VERDICT r19 #6): when set to Some(n), every
    * stream source reads an n-file re-chunked copy of its table one file
    * per micro-batch instead of the driver's single-file/one-batch layout —
    * same rows, different arrival chunking — and the already-split sources
    * add n extra files. The invariance main flips this between its two
    * passes; the driver's gates always run with None.
    */
  @volatile private[graft] var invarianceSplit: Option[Int] = None

  private def plainSource(s: SparkSession, dir: String, table: String,
      schema: org.apache.spark.sql.types.StructType,
      rangeCol: Option[String] = None): DataFrame =
    invarianceSplit match {
      case Some(n) if n > 1 =>
        s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(streamSplitDirFor(s, dir, table, n, rangeCol))
      case _ => s.readStream.schema(schema).parquet(streamDirFor(dir, table))
    }

  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    // events chunk by time range: the arrival contract of an event stream
    // (bounded disorder per the watermark); the keyless tables chunk
    // randomly — their operators must not care about arrival order at all
    val st = plainSource(s, dir, "events", raw.schema, rangeCol = Some("ts"))
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        st.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => st.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  private def documentsStream(s: SparkSession, dir: String): DataFrame =
    plainSource(s, dir, "documents",
      s.read.parquet(s"$dir/documents.parquet").schema)

  private def embeddingsStream(s: SparkSession, dir: String): DataFrame =
    plainSource(s, dir, "embeddings",
      s.read.parquet(s"$dir/embeddings.parquet").schema)

  private def customerStream(s: SparkSession, dir: String): DataFrame =
    plainSource(s, dir, "customer",
      s.read.parquet(s"$dir/customer.parquet").schema)

  /** An N-file copy of one table so maxFilesPerTrigger=1 delivers N real
    * micro-batches INSIDE a driver gate (the plain symlinked source is one
    * file = one batch, which leaves cross-batch state invisible to the
    * oracle — VERDICT r15 #6). Written once per (source, n); the key
    * embeds the resolved source path AND n, so a different scale or split
    * can never silently reuse a stale copy.
    */
  private def streamSplitDirFor(s: SparkSession, dir: String, table: String,
      nFiles: Int, rangeCol: Option[String] = None): String = {
    import java.nio.file.{Files, Paths}
    val src = Paths.get(dir, s"$table.parquet").toRealPath()
    // the key folds in the source's content fingerprint (total size + max
    // mtime over the file-or-directory tree), not just its path: a source
    // regenerated in place gets a fresh split instead of a stale one the
    // DuckDB oracle no longer sees (ADVICE r16)
    val fp = {
      var size = 0L; var mtime = 0L
      val it = Files.walk(src).iterator()
      while (it.hasNext) {
        val f = it.next()
        if (Files.isRegularFile(f)) {
          size += Files.size(f)
          mtime = math.max(mtime, Files.getLastModifiedTime(f).toMillis)
        }
      }
      java.lang.Long.toHexString(size) + "-" + java.lang.Long.toHexString(mtime)
    }
    val key = src.toString.replaceAll("[^A-Za-z0-9._-]", "_") +
      "-" + java.lang.Integer.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(src.toString + "#" + fp)) +
      s"-split$nFiles" + rangeCol.map(c => s"-range_$c").getOrElse("")
    val d = Paths.get(System.getProperty("java.io.tmpdir"), s"graft-stream-$key")
    // cache sentinel is OUR OWN marker written AFTER the mtime stamping,
    // not Spark's _SUCCESS (which commits before the stamping — a run
    // killed in between would otherwise cache a dir whose arrival order is
    // task-completion order, silently violating the range contract)
    if (!Files.exists(d.resolve("_GRAFT_READY"))) {
      val raw = s.read.parquet(src.toString)
      // rangeCol: chunk in EVENT-TIME ranges (file k = k-th time slice, the
      // shape a real time-ordered ingest delivers and the only one the
      // watermark contract admits — random chunking would make almost every
      // later batch "late" and watermark-dropped, which tests the source's
      // contract violation, not the operator); file order follows partition
      // order because part-0000k names sort with the range index
      rangeCol.fold(raw.repartition(nFiles))(c =>
          raw.repartitionByRange(nFiles, col(s"`$c`")))
        .write.mode("overwrite").parquet(d.toString)
      // FileStreamSource drains new files in MODIFICATION-TIME order, and a
      // parallel write finishes its tasks in arbitrary order — stamp
      // strictly increasing mtimes in part-file (= range-partition) order
      // so the delivered micro-batch order IS the range order
      import scala.jdk.CollectionConverters._
      val parts = Files.list(d).iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-")).toSeq
        .sortBy(_.getFileName.toString)
      val base = System.currentTimeMillis() - parts.size * 1000L
      parts.zipWithIndex.foreach { case (p, i) =>
        Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(base + i * 1000L))
      }
      Files.createFile(d.resolve("_GRAFT_READY"))
    }
    d.toString
  }

  /** Multi-micro-batch customer stream: `nFiles` batches of one file each.
    * Gate projections must be batch-split-invariant (complete-mode aggs /
    * final-state reads) — that invariance is exactly what running them
    * under the same DuckDB oracle as the single-batch shape proves.
    */
  private def customerStreamSplit(s: SparkSession, dir: String,
      nFiles: Int): DataFrame = {
    val schema = s.read.parquet(s"$dir/customer.parquet").schema
    s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(streamSplitDirFor(s, dir, "customer",
        nFiles + invarianceSplit.getOrElse(0)))
  }

  private def eventsStreamSplit(s: SparkSession, dir: String,
      nFiles: Int): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    val st = s.readStream.schema(raw.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamSplitDirFor(s, dir, "events",
        nFiles + invarianceSplit.getOrElse(0)))
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        st.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => st.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  private val runSeq = new java.util.concurrent.atomic.AtomicInteger(0)
  // previous sink table per gate, dropped on the next run of the same gate
  // so repeated runs in one JVM (bench + verify) don't pin every result set
  // in driver memory forever
  private val lastSink =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Drive a bounded streaming query to completion into a memory sink and
    * return the sink table as a batch frame. Sink names get a per-process
    * sequence suffix so the same gate can run more than once in one
    * session; the wait is BOUNDED (SPARK_GRAFT_STREAM_TIMEOUT seconds,
    * default 300) because Bench's per-query job-group watchdog cannot reach
    * micro-batch jobs — they run under MicroBatchExecution's own group — so
    * an unbounded processAllAvailable would hang the whole lane.
    */
  private def runToCompletion(df: DataFrame, name: String,
      mode: String): DataFrame = {
    val spark = df.sparkSession
    Option(lastSink.get(name)).foreach(spark.catalog.dropTempView(_))
    val qn = s"${name}_${runSeq.incrementAndGet()}"
    lastSink.put(name, qn)
    // Streaming state-store instances (and micro-batch task waves) scale
    // with shuffle partitions; at gate data volumes 32 of them are pure
    // fixed cost — 8 cuts ~40% off every stateful gate (measured 2.0→1.2 s
    // windowed, 2.8→1.4 s count_unique at sf0.1) without touching results
    // (every gate projection is partition-order-invariant by design).
    // Production sizes this to the cluster; the setting is scoped to the
    // gate query and restored after start (the conf is captured at query
    // start, so the restore cannot race the running stream).
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    // Gate checkpoints are EPHEMERAL by construction (memory sink, bounded
    // input, unique per-run name, deleted below) — but Spark's default temp
    // checkpoint lands in java.io.tmpdir, where the HDFSBackedStateStore's
    // per-batch delta files + offset/commit logs are each fsync'd; on a
    // disk-backed /tmp those fsyncs dominate every stateful gate (measured
    // at sf0.1: windowed_agg_stream 5.07 -> 1.72 s, sliding_window_stream
    // 5.04 -> 2.49 s with a RAM-backed scratch). Production streams need
    // DURABLE checkpoints and configure them on their own writeStream —
    // the operators in StreamingOps never choose a location; only this
    // verification harness does. SPARK_GRAFT_STREAM_CKPT overrides; when a
    // RAM-backed /dev/shm is absent the behavior is Spark's default.
    // the path must be unique ACROSS JVMs, not just within one (qn's runSeq
    // restarts per JVM): a run killed hard (SIGKILL/timeout) leaves its
    // checkpoint behind, and a later JVM reusing the same path would try to
    // RECOVER from it — memory-sink queries refuse ("does not support
    // recovering from checkpoint location") and the gate fails on a
    // leftover, not on its own output. The UUID makes leftovers inert.
    // the system property exists for in-JVM tests (StreamCkptFallbackSpec
    // forces the disk-backed fallback without re-execing sbt); the env var
    // is the operator-facing override
    val ckptDir = sys.props.get("spark.graft.streamCkpt")
      .orElse(sys.env.get("SPARK_GRAFT_STREAM_CKPT")).orElse {
      val shm = java.nio.file.Paths.get("/dev/shm")
      if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm))
        Some("/dev/shm/graft-stream-ckpt") else None
    }.map(base => s"$base/$qn-${java.util.UUID.randomUUID().toString.take(8)}")
    val q = try {
      val w = df.writeStream.format("memory").queryName(qn).outputMode(mode)
      ckptDir.fold(w)(d => w.option("checkpointLocation", d)).start()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try {
      val timeoutMs =
        sys.env.getOrElse("SPARK_GRAFT_STREAM_TIMEOUT", "300").toLong * 1000L
      val waiter = new Thread(() => try q.processAllAvailable()
        catch { case _: Throwable => () })
      waiter.setDaemon(true)
      waiter.start()
      waiter.join(timeoutMs)
      val timedOut = waiter.isAlive
      if (timedOut)
        System.err.println(s"[stream-gate] TIMEOUT ${timeoutMs / 1000}s — stopping $qn")
      q.stop()
      waiter.join(10000L)
      // a stream that died must surface as a query failure, not as an
      // empty-table hash mismatch downstream
      q.exception.foreach(e => throw e)
      // a stream that HUNG (no exception) must surface too: the memory sink
      // holds a partial table at this point, and returning it would fail the
      // gate later as an opaque hash/row mismatch instead of a clear timeout
      if (timedOut) throw new java.util.concurrent.TimeoutException(
        s"streaming gate $name did not complete within ${timeoutMs / 1000}s")
    } finally {
      // drop the ephemeral checkpoint on success AND failure: /dev/shm is
      // RAM, so keeping failed-run state (Spark's temp-checkpoint contract
      // for /tmp) would leak memory instead of disk; the memory-sink table
      // itself remains available for diagnosis. Hard JVM death still leaks
      // until reboot — bounded by gate state size, and the UUID path means
      // a leftover can never poison a later run.
      if (!q.isActive) ckptDir.foreach { d =>
        try {
          import scala.jdk.CollectionConverters._
          val p = java.nio.file.Paths.get(d)
          if (java.nio.file.Files.exists(p))
            java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
              .foreach(f => try java.nio.file.Files.delete(f) catch { case _: Throwable => () })
        } catch { case _: Throwable => () }
      }
    }
    spark.table(qn)
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
    // stream-static as-of enrichment: view events arrive as a stream, the
    // click table is static (compiled once to validity intervals); the
    // stateless left join is held to the same ASOF semantics as the batch
    // asof_join gate. Integer-cents + ts-string projection per the policy.
    "asof_enrich_stream" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val static = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max(col("value")).as("click_value"))
      val stream = eventsStream(s, d)
        .filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts")
      runToCompletion(
        StreamingOps.asofEnrich(stream, static, on = "ts", by = Seq("user_id")),
        "gr_asof_enrich_stream", "append")
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), TsFmt).as("ts_str"),
          round(col("click_value") * 100).cast("long").as("click_cents"))
    }),
    // per-window crawl-ingest health report: documents get a synthetic
    // event time (one per hour from a fixed epoch — replicated in SQL) and
    // a 1-day tumbling window; the HLL-backed dup-rate columns are the one
    // documented batch/stream difference, so the gate pins every EXACT
    // column and leaves the sketch columns to the batch corpus_report gate
    "corpus_report_stream" -> ((s, d) => {
      val docs = documentsStream(s, d).withColumn("ts",
        timestamp_micros(lit(1700000000000000L) + col("doc_id") * 3600000000L))
      runToCompletion(
        StreamingOps.corpusReportStream(docs, "ts", "1 day", "1 day", "text"),
        "gr_corpus_report_stream", "complete")
        .select(date_format(col("window.start"), TsFmt).as("window_start"),
          col("n_docs"), col("n_tokens"), col("n_chars"),
          round(col("avg_tokens") * 1e6).cast("long").as("avg_tokens"),
          round(col("mean_quality") * 1e6).cast("long").as("mean_quality"))
    }),
    // stream-vs-benchmark contamination flags: the winnow fingerprint index
    // of doc_id < 20 is built once (static), every arriving document's
    // fingerprints probe it; docs sharing >= 3 fingerprints are flagged
    // DSIR scoring as a stream: model trained batch-side on the static
    // snapshot (raw = all docs, target = the en slice), arriving docs
    // scored by a stream-static broadcast join — same oracle as the
    // batch dsir_weights gate
    "dsir_score_stream" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val model = graft.llm.Sampling.dsirModel(
        docs.select("text"),
        docs.filter(col("lang") === "en").select("text"),
        "text", buckets = 64)
      runToCompletion(
        StreamingOps.dsirScoreStream(
          documentsStream(s, d).select("doc_id", "text"),
          "doc_id", "text", model, 64),
        "gr_dsir_score_stream", "complete")
        .select(col("doc_id"), col("n_features"),
          round(col("log_weight") * 1e6).cast("long").as("log_weight"))
    }),
    // ingest-time domain blocklist: same blocklist + synth URLs as the
    // batch filter_domains gate, run as a stateless stream-static
    // left-outer + isNull (Structured Streaming has no stream-static
    // left_anti); same oracle anti-join SQL
    "url_filter_stream" -> ((s, d) => {
      val blocklist = {
        import s.implicits._
        Seq("example1.co.uk", "site3.com", "10.0.4.25").toDF("domain")
      }
      runToCompletion(
        StreamingOps.filterDomainsStream(
          documentsStream(s, d).select(col("doc_id"))
            .withColumn("url", QueriesLlm.synthUrl(col("doc_id"))),
          "url", blocklist),
        "gr_url_filter_stream", "append")
        .select("doc_id")
    }),
    "contamination_flags_stream" -> ((s, d) => {
      val ref = graft.llm.Dedup.winnowFingerprints(
        Tables.documents(s, d).filter(col("doc_id") < 20), "doc_id", "text")
      runToCompletion(
        StreamingOps.contaminationFlags(
          documentsStream(s, d).select("doc_id", "text"),
          "doc_id", "text", ref, minShared = 3),
        "gr_contamination_flags_stream", "complete")
    }),
    // streaming embedding near-dup flags vs a static reference: at 0.99 the
    // LSH miss probability is vanishing, so the gate holds the bucketed
    // stream path to the exhaustive best-match oracle
    "embedding_flags_stream" -> ((s, d) => {
      val ref = Tables.embeddings(s, d)
        .filter(col("vec_id") < 8).select("vec_id", "embedding")
      runToCompletion(
        StreamingOps.embeddingNearDupFlags(
          embeddingsStream(s, d).select("vec_id", "embedding"),
          "vec_id", "embedding", ref, threshold = 0.99),
        "gr_embedding_flags_stream", "complete")
        .select(col("vec_id"), col("ref_id"),
          round(col("sim") * 1e6).cast("long").as("sim"))
    }),
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
          md5(concat_ws("\u0001", sort_array(collect_list("norm_line")))
            .cast("binary")).as("set_md5"))
      val short = kept.filter(length(trim(col("line"))) < 10)
        .agg(count(lit(1)).as("n_short"))
      long.crossJoin(short)
    }),
    // streaming count_cumulative_unique (flatMapGroupsWithState, one
    // Set per key): per-row cum_unique is processing-order-dependent, but
    // the FINAL state per key (max = distinct count), the row count, and
    // the first increment (min = 1) are order-invariant — gate those
    "count_unique_stream" -> ((s, d) =>
      // 4 micro-batches: the per-key Set state carries across batches; the
      // gated projections (row count, final = distinct count, first = 1)
      // are processing-order-invariant, so the oracle hash is unchanged
      runToCompletion(
        StreamingOps.countCumulativeUnique(
          eventsStreamSplit(s, d, nFiles = 4).select("user_id", "event_type"),
          "user_id", "event_type"),
        "gr_count_unique_stream", "append")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_rows"),
          max(col("cum_unique")).as("final_unique"),
          min(col("cum_unique")).as("first_unique"))),
    // streaming flag_jumps (per-key previous-value state): ordered by
    // event_id, which the generator assigns in strict ts order and which is
    // UNIQUE — a total order at any timestamp resolution (ordering by ts
    // itself would tie on the nanos-as-long variant after the micros
    // normalization and fall back to shuffle-arrival order). The oracle
    // orders by the same column. Integer-cents projection per the
    // driver-hash policy.
    "flag_jumps_stream" -> ((s, d) =>
      runToCompletion(
        StreamingOps.flagJumps(
          eventsStream(s, d).select(col("user_id"), col("value"), col("event_id")),
          "user_id", "value", threshold = 10.0, orderCol = Some("event_id")),
        "gr_flag_jumps_stream", "append")
        .select(col("user_id"),
          round(col("value") * 100).cast("long").as("cents"),
          col("jump"))),
    // the ingest form of the training pipeline: Gopher keep → benchmark
    // decontamination (the benchmark's fingerprint set collected once at
    // plan-build time into a literal; per-row ≥minShared intersect — same
    // rule as batch decontaminate) → hash split, as ONE append-mode
    // zero-state streaming plan. Benchmark = doc_id < 20, like the batch
    // training_pipeline gate.
    "training_pipeline_stream" -> ((s, d) =>
      runToCompletion(
        StreamingOps.prepareCorpusStream(
          documentsStream(s, d).select("doc_id", "text"),
          "doc_id", "text",
          benchmark = Tables.documents(s, d).filter(col("doc_id") < 20)
            .select("doc_id", "text"),
          minShared = 3),
        "gr_training_pipeline_stream", "append")
        .select(col("doc_id"), col("n_tokens"), col("split"))),
    // [[contamination_flags_stream]]'s Bloom-prefiltered twin: the exact
    // verify behind the probe keeps flags bit-identical (operator contract),
    // so both gates share one oracle — a divergence between the two rows
    // localizes a fault to the Bloom path itself
    "contamination_flags_bloom_stream" -> ((s, d) => {
      val ref = graft.llm.Dedup.winnowFingerprints(
        Tables.documents(s, d).filter(col("doc_id") < 20), "doc_id", "text")
      runToCompletion(
        StreamingOps.contaminationFlagsBloom(
          documentsStream(s, d).select("doc_id", "text"),
          "doc_id", "text", ref, minShared = 3),
        "gr_contamination_flags_bloom_stream", "complete")
    }),
    // streaming text near-dup flags vs a static reference (doc_id < 20,
    // which includes each reference doc's own stream arrival — the
    // self-match at j=1.0 is part of the contract, not excluded). At
    // threshold 0.8 with 32×4 banding, P(candidate miss | j >= 0.8) ≈ 5e-8
    // — same exhaustive-oracle footing as the batch dedup_minhash gates;
    // exact-Jaccard verify makes everything downstream of candidates exact
    "near_dup_flags_stream" -> ((s, d) => {
      val ref = Tables.documents(s, d).filter(col("doc_id") < 20)
        .select("doc_id", "text")
      runToCompletion(
        StreamingOps.nearDupFlags(
          documentsStream(s, d).select("doc_id", "text"),
          "doc_id", "text", ref, threshold = 0.8),
        "gr_near_dup_flags_stream", "complete")
        .select(col("id"), col("ref_id"),
          round(col("jaccard") * 1e6).cast("long").as("jaccard"))
    }),
    // stream-static fuzzy matching: every 100th customer name arrives as a
    // stream and resolves against the disjoint static rest at edit
    // distance <= 1. FastSS deletion neighborhoods are exhaustive for
    // dist <= maxDist, so the oracle is the exact levenshtein cross join
    "fuzzy_match_flags_stream" -> ((s, d) => {
      val ref = Tables.customer(s, d).filter(col("c_custkey") % 100 =!= 0)
        .select("c_custkey", "c_name")
      // 4 micro-batches (split file source): the pinned FastSS index serves
      // batches 2-4 from cache and the complete-mode min-best accumulates
      // across batches — cross-batch state under the SAME exact oracle as
      // the single-batch shape (hash unchanged)
      runToCompletion(
        StreamingOps.fuzzyMatchFlags(
          customerStreamSplit(s, d, nFiles = 4)
            .filter(col("c_custkey") % 100 === 0)
            .select("c_custkey", "c_name"),
          "c_custkey", "c_name", ref, "c_custkey", "c_name", maxDist = 1),
        "gr_fuzzy_match_flags_stream", "complete")
        .select(col("id"), col("ref_id"), col("dist").cast("long").as("dist"))
    }),
    // streaming IVF ANN at the complete-candidate setting (nProbe = nCells
    // — every cell probed), so the stream-static machinery (probe-cell
    // explode, cell equi-join, collect_list top-k in complete mode) is held
    // to the exhaustive cosine oracle; the approximate nProbe=8 quality is
    // pinned batch-side by similarity_ivf_recall (identical kernels)
    "ivf_topk_stream" -> ((s, d) => {
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val cents = graft.llm.Similarity.trainCentroids(
        emb, "vec_id", "embedding", nCells = 16, kmeansIters = 3)
      runToCompletion(
        StreamingOps.ivfTopKStream(
          embeddingsStream(s, d).filter(col("vec_id") < 10)
            .select("vec_id", "embedding"),
          emb, "vec_id", "embedding", k = 5, cents, nProbe = 16),
        "gr_ivf_topk_stream", "complete")
        .select(col("qid"), col("nid"),
          round(col("sim") * 1e6).cast("long").as("sim"))
    }),
    // streaming heavy hitters at no-eviction capacity (vocab 31 << 4096):
    // the MG state equals the exact frequency table, so the running top-20
    // is hash-exact under the batch oracle
    "heavy_hitters_stream" -> ((s, d) =>
      runToCompletion(
        StreamingOps.heavyHittersStream(
          documentsStream(s, d).select("text"), "text", capacity = 4096),
        "gr_heavy_hitters_stream", "complete")
        .select(posexplode(col("sketch")).as(Seq("__pos", "__hh")))
        .filter(col("__pos") < 20)
        .select(col("__hh.token").as("token"), col("__hh.est").as("est"))),
    // streaming IVF-PQ with the PINNED codebooks of the batch pq gates
    // (subspace slices of vec_id < 8 — DuckDB-replicable) and the complete
    // probe, so the ADC ranking in the compressed domain is itself
    // hash-exact; the trained-codebook quality path keeps pq_recall
    "ivf_pq_topk_stream" -> ((s, d) => {
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val cbs = QueriesLlm.pinnedCodebooks(emb, m = 4, dsub = 16)
      val cents = graft.llm.Similarity.trainCentroids(
        emb, "vec_id", "embedding", nCells = 16, kmeansIters = 3)
      runToCompletion(
        StreamingOps.ivfPqTopKStream(
          embeddingsStream(s, d).filter(col("vec_id") < 10)
            .select("vec_id", "embedding"),
          emb, "vec_id", "embedding", k = 10, cents, cbs, nProbe = 16),
        "gr_ivf_pq_topk_stream", "complete")
        .select(col("qid"), col("nid"),
          round(col("score") * 1e6).cast("long").as("score"))
    })
  )

  /** >= 3 shared winnow fingerprints with the doc_id < 20 reference —
    * shared by the plain and Bloom-prefiltered contamination gates.
    */
  private lazy val contaminationFlagsSql: String = QueriesLlm.winnowSql +
    """, ref AS (SELECT DISTINCT unnest(fps) AS fp FROM wins WHERE doc_id < 20),
      |f AS (SELECT doc_id, unnest(fps) AS fp FROM wins)
      |SELECT f.doc_id, count(*) AS n_shared FROM f JOIN ref USING (fp)
      |GROUP BY f.doc_id HAVING count(*) >= 3""".stripMargin

  val oracles: Map[String, String] = Map(
    // the batch filter_domains anti-join, verbatim — the stream must emit
    // exactly the rows the batch blocklist keeps
    "url_filter_stream" ->
      raw"""WITH u AS (SELECT doc_id,
        |${QueriesLlm.SynthUrlSql} AS url
        |  FROM documents),
        |${QueriesLlm.DomainFromUrlSql}
        |SELECT doc_id FROM dom
        |WHERE domain NOT IN ('example1.co.uk', 'site3.com', '10.0.4.25')""".stripMargin,
    "asof_enrich_stream" ->
      s"""WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
         |r AS (SELECT user_id, ts, max(value) AS click_value FROM events
         |      WHERE event_type = 'click' GROUP BY user_id, ts)
         |SELECT l.event_id, l.user_id, strftime(l.ts, '$TsFmtSql') AS ts_str,
         |  CAST(round(r.click_value * 100) AS BIGINT) AS click_cents
         |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,
    "corpus_report_stream" ->
      s"""WITH d AS (SELECT doc_id, text,
         |    (epoch_us(make_timestamp(1700000000000000 + doc_id * 3600000000))
         |      // 86400000000) * 86400000000 AS ws FROM documents),
         |q AS (SELECT ws,
         |  len(string_split_regex(text, '\\s+')) AS nt, length(text) AS nc,
         |  CAST(round(round(
         |    least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4 +
         |    (CASE WHEN CAST(length(text) AS DOUBLE) / greatest(CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE), 1.0) >= 3
         |          AND CAST(length(text) AS DOUBLE) / greatest(CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE), 1.0) <= 10
         |     THEN 1.0 ELSE 0.5 END) * 0.3 +
         |    (1.0 - least(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) / greatest(CAST(length(text) AS DOUBLE), 1.0) * 5, 1.0)) * 0.2 +
         |    (1.0 - least(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / greatest(CAST(length(text) AS DOUBLE), 1.0) * 5, 1.0)) * 0.1,
         |    6) * 1e6) AS BIGINT) AS q6
         |  FROM d)
         |SELECT strftime(make_timestamp(ws), '$TsFmtSql') AS window_start,
         |  count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
         |  CAST(sum(nc) AS BIGINT) AS n_chars,
         |  CAST(round(round(CAST(sum(nt) AS DOUBLE) / count(*), 6) * 1e6) AS BIGINT) AS avg_tokens,
         |  CAST(round(round(CAST(sum(q6) AS DOUBLE) / count(*) / 1e6, 6) * 1e6) AS BIGINT) AS mean_quality
         |FROM q GROUP BY ws""".stripMargin,
    // best match per flagged id = argmax (raw sim, then ref_id) — the same
    // struct-max comparator the update aggregation applies
    "embedding_flags_stream" ->
      """WITH b AS (SELECT vec_id AS ref_id, embedding AS bv FROM embeddings
        |  WHERE vec_id < 8),
        |s AS (
        |  SELECT a.vec_id, b.ref_id,
        |    list_sum(list_transform(generate_series(1, len(a.embedding)),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.bv[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(b.bv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
        |  FROM embeddings a CROSS JOIN b)
        |SELECT vec_id, ref_id, CAST(round(round(sim, 6) * 1e6) AS BIGINT) AS sim
        |FROM (SELECT vec_id, ref_id, sim,
        |        row_number() OVER (PARTITION BY vec_id
        |          ORDER BY sim DESC, ref_id DESC) AS rn
        |      FROM s WHERE sim >= 0.99)
        |WHERE rn = 1""".stripMargin,
    // the stream covers the whole table, so the batch DSIR oracle holds
    "dsir_score_stream" -> QueriesLlm.oracles("dsir_weights"),
    "contamination_flags_stream" -> contaminationFlagsSql,
    // bit-identical to the non-Bloom path by operator contract (exact
    // verify behind the probe) — one oracle for both rows
    "contamination_flags_bloom_stream" -> contaminationFlagsSql,
    // best static match per stream doc: raw-jaccard argmax, ties to the
    // HIGHEST ref_id (the operator's max(struct(j, ref_id))); round after
    // the argmax, exactly as the operator rounds the winner
    "near_dup_flags_stream" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
        |  FROM documents),
        |sh AS (SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh FROM w),
        |p AS (SELECT a.doc_id AS id, b.doc_id AS ref_id,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS j
        |  FROM sh a JOIN sh b ON b.doc_id < 20
        |  WHERE len(a.sh) > 0 AND len(b.sh) > 0)
        |SELECT id, ref_id, CAST(round(round(j, 6) * 1e6) AS BIGINT) AS jaccard
        |FROM (SELECT id, ref_id, j,
        |        row_number() OVER (PARTITION BY id ORDER BY j DESC, ref_id DESC) AS rn
        |      FROM p WHERE j >= 0.8)
        |WHERE rn = 1""".stripMargin,
    // best match per stream row: min distance, ties to the LOWEST ref id
    // (the operator's min(struct(d, ref_id)))
    "fuzzy_match_flags_stream" ->
      """WITH q AS (SELECT c_custkey AS id, c_name AS qn FROM customer
        |  WHERE c_custkey % 100 = 0),
        |r AS (SELECT c_custkey AS ref_id, c_name AS rn FROM customer
        |  WHERE c_custkey % 100 <> 0),
        |p AS (SELECT id, ref_id, levenshtein(qn, rn) AS dist
        |  FROM q CROSS JOIN r)
        |SELECT id, ref_id, CAST(dist AS BIGINT) AS dist
        |FROM (SELECT id, ref_id, dist,
        |        row_number() OVER (PARTITION BY id ORDER BY dist ASC, ref_id ASC) AS n
        |      FROM p WHERE dist <= 1)
        |WHERE n = 1""".stripMargin,
    // complete-candidate probe == exhaustive ranking (same oracle as the
    // batch brute/IVF/LSH top-k gates)
    "ivf_topk_stream" -> QueriesLlm.exactCosineTopk5Sql,
    // no-eviction capacity: the running sketch is the exact count table
    "heavy_hitters_stream" -> QueriesLlm.heavyHittersTop20Sql,
    // pinned-codebook ADC ranking over ALL cells: codes/tables from the
    // shared pqCodesSql prefix; rank by the ROUNDED adc (the operator
    // rounds before its collect_list sort), ties to the lowest nid
    "ivf_pq_topk_stream" -> (QueriesLlm.pqCodesSql +
      """, cl AS (SELECT vec_id, list(code ORDER BY s) AS code FROM codes GROUP BY vec_id),
        |q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
        |tb AS (SELECT q.qid, b.s, b.j,
        |    (list_sum(list_transform(generate_series(1, 16),
        |       i -> CAST(q.qe[b.s*16 + i] AS DOUBLE) * CAST(b.cvec[i] AS DOUBLE))) / b.cn) * b.cn AS t
        |  FROM q CROSS JOIN cbn b),
        |qt AS (SELECT qid, list(t ORDER BY s, j) AS tt FROM tb GROUP BY qid),
        |pairs AS (SELECT qt.qid, c.vec_id AS nid,
        |    round(list_sum(list_transform(generate_series(1, 4),
        |      s -> tt[(s-1)*8 + code[s]])), 6) AS adc
        |  FROM qt CROSS JOIN cl c WHERE c.vec_id <> qt.qid)
        |SELECT qid, nid, CAST(round(adc * 1e6) AS BIGINT) AS score FROM (
        |  SELECT qid, nid, adc,
        |    row_number() OVER (PARTITION BY qid ORDER BY adc DESC, nid ASC) AS rn
        |  FROM pairs) WHERE rn <= 10""".stripMargin),
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
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM w GROUP BY user_id, ws""".stripMargin,
    "windowed_agg_stream" ->
      s"""SELECT event_type,
         |  strftime(make_timestamp((epoch_us(ts) // 3600000000) * 3600000000),
         |    '$TsFmtSql') AS window_start,
         |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         |FROM events GROUP BY 1, 2""".stripMargin,
    "dedup_lines_stream" ->
      """WITH l AS (SELECT unnest(string_split(text, ' a ')) AS line FROM documents),
        |k AS (SELECT DISTINCT lower(trim(line)) AS norm_line FROM l
        |      WHERE length(trim(line)) >= 10),
        |agg AS (SELECT count(*) AS n,
        |    md5(string_agg(norm_line, chr(1) ORDER BY norm_line)) AS set_md5
        |  FROM k),
        |s AS (SELECT count(*) AS n_short FROM l WHERE length(trim(line)) < 10)
        |SELECT n, set_md5, n_short FROM agg, s""".stripMargin,
    "count_unique_stream" ->
      """SELECT CAST(user_id AS VARCHAR) AS user_id,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT event_type) AS BIGINT) AS final_unique,
        |  CAST(1 AS BIGINT) AS first_unique
        |FROM events GROUP BY user_id""".stripMargin,
    "flag_jumps_stream" ->
      """SELECT CAST(user_id AS VARCHAR) AS user_id,
        |  CAST(round(value * 100) AS BIGINT) AS cents,
        |  CASE WHEN abs(value - lag(value) OVER (PARTITION BY user_id ORDER BY event_id)) > 10
        |    THEN 1 ELSE 0 END AS jump
        |FROM events""".stripMargin,
    // Gopher keep + >=3-shared-winnow-fingerprint decontamination (benchmark
    // = doc_id < 20) + md5-uniform 0.9/0.05/0.05 split — the same fragments
    // as the batch training_pipeline oracle, minus its corpus-global
    // dedup/chunk/shard stages (batch passes by nature)
    "training_pipeline_stream" -> (QueriesLlm.winnowSql +
      """, f AS (SELECT doc_id, unnest(fps) AS fp FROM wins),
        |bfp AS (SELECT DISTINCT fp FROM f WHERE doc_id < 20),
        |contaminated AS (SELECT f.doc_id FROM f JOIN bfp USING (fp)
        |  GROUP BY f.doc_id HAVING count(*) >= 3),
        |gm AS (SELECT doc_id, text, string_split_regex(lower(text), '\s+') AS gw FROM documents),
        |gq AS (SELECT doc_id, ntok FROM (
        |  SELECT doc_id, len(gw) AS ntok,
        |    CASE WHEN len(gw) > 0 THEN CAST(coalesce(list_sum(list_transform(gw, x -> length(x))), 0) AS DOUBLE) / len(gw) ELSE 0.0 END AS meanlen,
        |    len(string_split(text, '#')) - 1 + len(string_split(text, '...')) - 1 AS symbols,
        |    len(list_filter(gw, x -> regexp_matches(x, '[a-z]'))) AS alpha,
        |    len(list_intersect(list_distinct(gw),
        |      ['the','a','and','of','to','in','is','it','that','for'])) AS stops
        |  FROM gm)
        |  WHERE ntok >= 50 AND ntok <= 100000 AND meanlen >= 3.0 AND meanlen <= 10.0
        |    AND CAST(symbols AS DOUBLE) / ntok <= 0.1
        |    AND CAST(alpha AS DOUBLE) / ntok >= 0.8 AND stops >= 2)
        |SELECT doc_id, CAST(ntok AS BIGINT) AS n_tokens,
        |  CASE WHEN u < 0.9 THEN 'train'
        |       WHEN u < 0.9 + 0.05 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id, ntok,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#42'), 1, 8)) AS BIGINT)
        |  / 4294967296.0 AS u FROM gq
        |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated))""".stripMargin)
  )
}
