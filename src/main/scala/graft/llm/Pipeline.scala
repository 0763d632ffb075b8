package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference end-to-end pretraining data-prep pipeline — a one-call
  * composition of stages that are each individually DuckDB-oracle-gated:
  *
  *   clean (strip HTML → normalize URLs → scrub PII)
  *   → optional corpus-wide line dedup (C4 recipe, boilerplate removal)
  *   → optional ExactSubstr substring dedup (≥L-token verbatim repeats)
  *   → quality filter (Gopher flags keep)
  *   → near-dedup (MinHash-LSH pairs → components → canonical row)
  *   → optional benchmark decontamination (winnow-fingerprint overlap;
  *     Bloom-prefiltered form when the benchmark index is huge)
  *   → optional CCNet perplexity bucketing (head/middle/tail LM terciles)
  *   → deterministic train/val/test split (content-hash)
  *
  * Every stage is a narrow map, a blocked shuffle keyed on a hash, or a
  * broadcast anti join — the composition inherits each stage's 100 TB
  * design. Returns the surviving rows with the cleaned text in place,
  * `cluster_size` from dedup, a `split` column, and (when bucketing is on)
  * the `bucket` tercile.
  */
object Pipeline {

  def prepareCorpus(df: DataFrame, idCol: String, textCol: String,
      benchmark: Option[DataFrame] = None,
      dedupThreshold: Double = 0.8,
      splitWeights: Seq[(String, Double)] =
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      seed: Long = 42L,
      lineDedup: Boolean = false,
      substringDedup: Boolean = false,
      substringMinMatchTokens: Int = 20,
      bloomDecontaminate: Boolean = false,
      perplexityBucketing: Boolean = false): DataFrame = {
    val cleanedText: Column = TextAnalysis.scrubPii(
      TextAnalysis.replaceUrls(TextAnalysis.stripHtml(col(s"`$textCol`"))))
    val cleaned = df.withColumn(textCol, cleanedText)
    val lineDeduped =
      if (lineDedup)
        Dedup.dedupLines(cleaned.select(col(s"`$idCol`"), col(s"`$textCol`")), idCol, textCol)
          .drop("n_lines_kept")
          .join(cleaned.drop(textCol), Seq(idCol))
      else cleaned
    // ExactSubstr pass (after line dedup, before the quality filter — the
    // paper's order: remove verbatim repeats first, then judge what's left)
    val substringDeduped =
      if (substringDedup)
        Dedup.dedupSubstrings(
            lineDeduped.select(col(s"`$idCol`"), col(s"`$textCol`")),
            idCol, textCol, substringMinMatchTokens)
          .drop("n_tokens_kept", "n_tokens_removed")
          .join(lineDeduped.drop(textCol), Seq(idCol))
      else lineDeduped
    val kept = substringDeduped
      .withColumn("__g", TextAnalysis.gopherQualityFlags(col(s"`$textCol`")))
      .filter(col("__g.keep")).drop("__g")
    val deduped = Dedup.dedupNear(kept, idCol, textCol, dedupThreshold)
    val decontaminated = benchmark match {
      case Some(b) if bloomDecontaminate =>
        Dedup.decontaminateBloom(deduped, idCol, textCol, b, idCol, textCol)
      case Some(b) => Dedup.decontaminate(deduped, idCol, textCol, b, idCol, textCol)
      case None => deduped
    }
    val bucketed =
      if (perplexityBucketing)
        decontaminated.join(
          TextAnalysis.perplexityBuckets(
            decontaminated.select(col(s"`$idCol`"), col(s"`$textCol`")),
            idCol, textCol).select(col(s"`$idCol`"), col("bucket")),
          Seq(idCol))
      else decontaminated
    Sampling.hashSplit(bucketed, idCol, splitWeights, "split", seed)
  }

  /** Incremental corpus growth — the continuous-crawl maintenance loop:
    * which rows of a NEW shard may be appended to an existing deduped
    * corpus, and why each rejected row was rejected. Every shard row gets
    * a `status` verdict, first-applicable in pipeline order:
    *
    *   `dup_exact_shard`  — another shard row with a smaller id has
    *                         byte-identical text (within-shard election)
    *   `dup_exact_corpus` — the text already exists in the corpus
    *   `dup_near_shard`   — non-canonical member of a within-shard
    *                         near-dup cluster ([[Dedup.dedupNear]]
    *                         min-reachable-id election, MinHash-LSH)
    *   `dup_near_corpus`  — near-duplicate (Jaccard ≥ `threshold`) of a
    *                         corpus row ([[Dedup.crossCorpusDupPairs]]
    *                         banded probe⋈ref join)
    *   `accepted`         — novel; safe to append
    *
    * The audit column is the point: silent row loss is the classic
    * corpus-maintenance failure, and each stage reuses the corresponding
    * individually-gated operator, so the composition inherits their
    * bucketed 100 TB shapes (hash groupBys, anti-joins, band joins —
    * nothing corpus-quadratic). Emits one row per input shard row:
    * (idCol, status).
    *
    * `pin = false` disables the two lazy localCheckpoint pins — for
    * memory-tight deployments that prefer recomputation over caching the
    * staged shard, and for the A/B probe (CheckpointProbe) that verifies
    * the pins actually suppress stage re-execution.
    */
  def addShard(corpus: DataFrame, shard: DataFrame, idCol: String,
      textCol: String, threshold: Double = 0.8,
      pin: Boolean = true): DataFrame = {
    // null-safe content hash: md5(null) is null and null join keys never
    // match, which would silently DROP null-text shard rows from the audit
    // — the exact row loss this operator exists to prevent. Null text
    // hashes to a sentinel, so null-text rows elect a representative among
    // themselves and match null-text corpus rows.
    def contentHash(c: Column): Column =
      coalesce(md5(c.cast("binary")), lit("__gr_null_text__"))
    // staged/surv12 feed 4 downstream consumers (election, cross pairs,
    // final verdict join) — pin them like the sibling dedup operators do
    val hashed = shard.select(col(s"`$idCol`").as("__id"),
        col(s"`$textCol`").as("__text"))
      .withColumn("__h", contentHash(col("__text")))
    val minIds = hashed.groupBy("__h").agg(min(col("__id")).as("__minid"))
    val corpusH = corpus
      .select(contentHash(col(s"`$textCol`")).as("__h"))
      .distinct().withColumn("__in_corpus", lit(true))
    def pinned(df: DataFrame): DataFrame =
      if (pin) df.localCheckpoint(eager = false) else df
    val staged = pinned(hashed.join(minIds, Seq("__h"))
      .withColumn("__exact_shard", col("__id") =!= col("__minid"))
      .join(corpusH, Seq("__h"), "left"))
    val surv12 = pinned(staged
      .filter(!col("__exact_shard") && col("__in_corpus").isNull)
      .select(col("__id").as(idCol), col("__text").as(textCol)))
    // Overlap the two independent sub-jobs (guide §2.6): the corpus-side
    // signature pass of the stage-4 cross-corpus probe does not depend on
    // the stage-3 within-shard election, but the election blocks the
    // driver on its union-find collect — so without help the corpus scan
    // only starts afterwards. A daemon thread materializes the pinned ref
    // base while the election runs; job descriptions are thread-local, so
    // the UI stays labelled. A warmer failure only loses the overlap (the
    // final query materializes the pin itself); skipped when pin = false
    // (recompute-preferring deployments, and the CheckpointProbe A/B).
    // kill-switch (A/B seam, also for single-threaded-driver deployments):
    // SPARK_GRAFT_ADDSHARD_OVERLAP=off or -Dspark.graft.addShardOverlap=off
    val overlapOff = sys.props.get("spark.graft.addShardOverlap")
      .orElse(sys.env.get("SPARK_GRAFT_ADDSHARD_OVERLAP")).contains("off")
    val refBase = Dedup.crossCorpusPrep(corpus, idCol, textCol)
    if (pin && !overlapOff) {
      val sc = corpus.sparkSession.sparkContext
      val warmer = new Thread(() => {
        try {
          sc.setJobDescription("addShard: corpus signature base (overlapped)")
          refBase.count(): Unit
        } catch { case _: Throwable => () }
        finally sc.setJobDescription(null)
      }, "addshard-ref-warmer")
      warmer.setDaemon(true)
      warmer.start()
    }
    // canonical election within the shard: dedupNear returns the kept rows
    // WITH their text — bind once and reuse for both the flag and the
    // cross-corpus probe instead of re-deriving via an extra join
    val kept3Df = Dedup.dedupNear(surv12, idCol, textCol, threshold)
    val kept3 = kept3Df.select(col(s"`$idCol`").as("__id"))
      .withColumn("__near_keep", lit(true))
    val flagged4 = Dedup.crossCorpusDupPairsPrepped(
        Dedup.crossCorpusPrep(
          kept3Df.select(col(s"`$idCol`"), col(s"`$textCol`")), idCol, textCol),
        refBase, threshold)
      .select(col("id1").as("__id")).distinct()
      .withColumn("__near_corpus", lit(true))
    staged.join(kept3, Seq("__id"), "left")
      .join(flagged4, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        when(col("__exact_shard"), "dup_exact_shard")
          .when(col("__in_corpus"), "dup_exact_corpus")
          .when(col("__near_keep").isNull, "dup_near_shard")
          .when(col("__near_corpus"), "dup_near_corpus")
          .otherwise("accepted").as("status"))
  }
}
