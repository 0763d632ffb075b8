package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference end-to-end pretraining data-prep pipeline — a one-call
  * composition of stages that are each individually DuckDB-oracle-gated:
  *
  *   clean (strip HTML → normalize URLs → scrub PII)
  *   → quality filter (Gopher flags keep)
  *   → near-dedup (MinHash-LSH pairs → components → canonical row)
  *   → optional benchmark decontamination (winnow-fingerprint overlap)
  *   → deterministic train/val/test split (content-hash)
  *
  * Every stage is a narrow map, a blocked shuffle keyed on a hash, or a
  * broadcast anti join — the composition inherits each stage's 100 TB
  * design. Returns the surviving rows with the cleaned text in place,
  * `cluster_size` from dedup, and a `split` column.
  */
object Pipeline {

  def prepareCorpus(df: DataFrame, idCol: String, textCol: String,
      benchmark: Option[DataFrame] = None,
      dedupThreshold: Double = 0.8,
      splitWeights: Seq[(String, Double)] =
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      seed: Long = 42L): DataFrame = {
    val cleanedText: Column = TextAnalysis.scrubPii(
      TextAnalysis.replaceUrls(TextAnalysis.stripHtml(col(s"`$textCol`"))))
    val cleaned = df.withColumn(textCol, cleanedText)
    val kept = cleaned
      .withColumn("__g", TextAnalysis.gopherQualityFlags(col(s"`$textCol`")))
      .filter(col("__g.keep")).drop("__g")
    val deduped = Dedup.dedupNear(kept, idCol, textCol, dedupThreshold)
    val decontaminated = benchmark match {
      case Some(b) => Dedup.decontaminate(deduped, idCol, textCol, b, idCol, textCol)
      case None => deduped
    }
    Sampling.hashSplit(decontaminated, idCol, splitWeights, "split", seed)
  }
}
