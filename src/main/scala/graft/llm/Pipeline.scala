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
}
