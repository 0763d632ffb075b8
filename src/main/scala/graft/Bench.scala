package graft
import org.apache.spark.sql.SparkSession

object Bench {
  /** Queries whose per-query seconds go on the one-line stdout record. The
    * driver captures only a ~2KB tail of the run, so the full 120+-query map
    * does not fit (every BENCH_rN.json through round 6 has `parsed: null`);
    * the headline subset keeps the line parseable while `bench_out.json`
    * carries the complete record.
    */
  private val headline = Seq(
    "dedup_clusters", "dedup_minhash", "dedup_simhash", "dedup_ngram_jaccard",
    "dedup_exact", "contamination_pairs", "winnow_fingerprints",
    "similarity_topk", "similarity_lsh_topk", "similarity_ivf_topk",
    "range_join", "conditional_join", "conditional_join_keep_first",
    "groupby_agg", "groupby_topk", "pivot_longer", "pivot_wider", "complete",
    "count_cumulative_unique", "math_ecdf", "fill_direction", "clean_names",
    "filter_on", "xlsx_table", "row_to_names", "min_max_scale_jointly",
    "asof_join", "hash_split", "chunk_documents",
    "dedup_near", "semdedup", "pca_project", "build_vocab", "fuzzy_self_join",
    "dedup_lines", "dedup_cross_corpus", "decontaminate_bloom", "pq_adc_topk",
    "pq_recall", "bm25_topk", "perplexity_buckets", "bigram_logprob", "bpe_gate",
    "dedup_substrings", "pack_sequences")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Force every column through the executors: a noop-sink write serializes
    // each output row in full, so Catalyst cannot prune the projections the
    // query exists to compute (a bare .count() measured little more than the
    // scan for narrow transforms).
    def exhaust(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    // warm up the session (codegen, parquet footer reads, JIT) so the first
    // timed query doesn't absorb ~5s of one-time cost
    try {
      exhaust(spark.read.parquet(s"$sfDir/lineitem.parquet")
        .selectExpr("count(distinct l_returnflag)", "sum(l_quantity)"))
    } catch { case _: Throwable => () }
    // …and the custom-kernel/HOF paths: whichever dedup/similarity query
    // runs first otherwise absorbs ~3s of their one-time codegen+JIT (the
    // round-10 dedup_clusters measurements were dominated by it). 64 rows
    // through the kernels is enough to compile and JIT every hot class.
    try {
      import org.apache.spark.sql.functions._
      import graft.functions.vector
      val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
        .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      exhaust(docs.select(
        vector.minhash_sig(col("toks"), 128, 3).as("m"),
        vector.simhash_sig(col("toks"), 48).as("s"),
        vector.window_min(vector.gram_hash48(col("toks"), 3), 4).as("w"),
        size(filter(zip_with(col("toks"), col("toks"), (a, b) => a === b),
          b => b)).as("z")))
    } catch { case _: Throwable => () }
    // 1-minute loadavg — every number this main emits carries its machine-
    // load context, so a hot driver lane (r9: 468 s vs 111-156 s idle on the
    // same commit) is diagnosable from the record instead of burning a
    // round on a phantom regression (VERDICT r10 #8)
    def load1(): Double =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val loadStart = load1()
    // SPARK_GRAFT_QUERIES=a,b,c restricts the run (targeted perf iteration)
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // SPARK_GRAFT_REPEAT=n (opt-in, default 1 — the driver never sets it, so
    // the official methodology is unchanged): time each selected query n
    // times in one JVM and record the MINIMUM. The first run of any query in
    // a fresh JVM absorbs seconds of one-time codegen/JIT (measured: the
    // first 2-3 queries of a restricted run read 3-8 s high), so min-of-n is
    // the only stable way to A/B a single operator change on a shared box.
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "1").toInt.max(1)
    val selected = only match {
      case Some(s) => SparkEntry.queries.filter { case (n, _) => s(n) }
      case None    => SparkEntry.queries
    }
    // watchdog: the round-6 official bench degraded to 600+ s singles under
    // machine contention. A healthy query tops out under ~10 s at sf0.1, so
    // cancel any job group that exceeds the budget and move on — a bounded
    // partial record beats one query eating the round's wall-clock.
    val queryTimeoutSec =
      sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "150").toInt
    val watchdog = new java.util.Timer("bench-watchdog", true)
    var i = 0
    val loads = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      spark.sparkContext.setJobGroup(s"bench-$name", name, interruptOnCancel = true)
      val cancel = new java.util.TimerTask {
        def run(): Unit = {
          System.err.println(s"[bench] TIMEOUT ${queryTimeoutSec}s — cancelling $name")
          spark.sparkContext.cancelJobGroup(s"bench-$name")
        }
      }
      watchdog.schedule(cancel, queryTimeoutSec * 1000L)
      try { exhaust(fn(spark, sfDir)) } catch { case _: Throwable => () }
      cancel.cancel()
      spark.sparkContext.clearJobGroup()
      var dt = (System.nanoTime() - t0) / 1e9
      var rep = 1
      while (rep < repeat) { // opt-in min-of-n (see SPARK_GRAFT_REPEAT above)
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        spark.sharedState.cacheManager.clearCache()
        graft.streaming.StreamingOps.unpinFuzzyIndexes()
        val r0 = System.nanoTime()
        try { exhaust(fn(spark, sfDir)) } catch { case _: Throwable => () }
        val rdt = (System.nanoTime() - r0) / 1e9
        System.err.println(f"[bench]   repeat ${rep + 1} $name%-32s $rdt%8.2f s")
        dt = math.min(dt, rdt)
        rep += 1
      }
      loads(name) = load1()
      // per-query progress on stderr: if a run ever degrades (round 6's
      // official bench took 25x the in-round time on the same commit), the
      // log shows where the time went instead of one opaque total
      System.err.println(f"[bench] ${java.time.Instant.now()} $name%-32s $dt%8.2f s")
      // iterative operators localCheckpoint intermediates (dedup_clusters,
      // conditional_join); blocks pin executor memory until the RDD is GC'd.
      // Drop them between queries so 120+ runs in one JVM can't accumulate
      // into GC pressure.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
      // clearCache() drops the cache registration but not the fuzzy-pin
      // memo; release both together or a later query silently reuses a
      // memoized-but-no-longer-cached index plan
      graft.streaming.StreamingOps.unpinFuzzyIndexes()
      i += 1
      if (i % 25 == 0) System.gc() // let ContextCleaner drop dead broadcasts
      name -> dt
    }
    // JSON numbers must be locale-independent: the f-interpolator uses the
    // JVM default locale, which renders 0.42 as "0,42" under e.g. de_DE
    def num(v: Double, digits: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(v))
    def fmt(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + num(v, 3) }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // full-precision complete record (the committed regression reference)
    val full = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // SPARK_GRAFT_BENCH_OUT redirects the full record (the sf1 smoke lane
    // must not clobber the committed sf0.1 regression reference). Restricted
    // runs (SPARK_GRAFT_QUERIES set) and non-default sf dirs divert to a
    // scratch path for the same reason — only a full default-sf run may
    // overwrite the committed reference implicitly.
    val isReferenceRun = only.isEmpty && sfDir == "/root/testdata/sf0.1"
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (isReferenceRun) "/root/repo/bench_out.json"
      else "/root/repo/target/bench_scratch.json")
    val loadEnd = load1()
    val loadJson = loads.map { case (k, v) => "\"" + k + "\":" + num(v, 2) }
      .mkString("{", ",", "}")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath),
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$full,""" +
        s""""load_start":$loadStart,"load_end":$loadEnd,"load":$loadJson,""" +
        s""""sf":"$sfDir"}\n""")
    catch { case _: Throwable => () }
    // compact stdout line (headline queries only) that survives tail capture
    val head = headline.flatMap(q => results.get(q).map(q -> _))
    val line = s"""{"metric":"total","value":${num(total, 2)},"unit":"sec","n":${results.size},""" +
      s""""load_start":$loadStart,"load_end":$loadEnd,""" +
      s""""queries":${fmt(head)},"full":"$outPath","sf":"$sfDir"}"""
    println(line)
    spark.stop()
  }
}
