package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * codegen'd expressions — narrow transforms that stream and scale.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram/stopword-overlap
    * language heuristic. Deliberately small and fixed so the oracle can
    * replicate scoring exactly.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "es", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "est", "pour"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "eine", "zu", "mit", "von"))

  /** Stopword-overlap language ID: argmax of per-language stopword hits over
    * the distinct token set; ties resolve in [[stopwords]] order; no hits →
    * "und" (undetermined).
    */
  def langId(text: Column): Column = {
    val toks = array_distinct(Dedup.tokens(text))
    val scores = stopwords.map { case (lang, words) =>
      lang -> size(array_intersect(toks, array(words.map(lit): _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, score), acc) =>
      when(score === best && score > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(text, "\\s+"))

  /** BPE-ish token estimate: letter runs, single digits, and single
    * non-alphanumeric marks — the shape of a GPT-style pre-tokenizer.
    */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))

  /** Quality heuristics: length, token stats, punctuation/digit ratios,
    * and a single blended score in [0,1] (rounded so cross-engine float
    * policy holds).
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nTokens = tokenCount(text).cast("double")
    val nPunct = regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double")
    val nDigit = regexp_count(text, lit("[0-9]")).cast("double")
    val meanWordLen = nChars / greatest(nTokens, lit(1.0d))
    val punctRatio = nPunct / greatest(nChars, lit(1.0d))
    val digitRatio = nDigit / greatest(nChars, lit(1.0d))
    val lenScore = least(nChars / lit(500.0d), lit(1.0d))
    val wordScore = when(meanWordLen >= 3 && meanWordLen <= 10, 1.0d).otherwise(0.5d)
    round(lenScore * 0.4d + wordScore * 0.3d +
      (lit(1.0d) - least(punctRatio * 5d, lit(1.0d))) * 0.2d +
      (lit(1.0d) - least(digitRatio * 5d, lit(1.0d))) * 0.1d, 6)
  }

  /** Rolling-hash document fingerprint: md5 of the sorted distinct token
    * set (order-insensitive), plus a 48-bit numeric form for joins.
    */
  def docFingerprint(text: Column): Column = Dedup.fingerprint(text)

  def docFingerprint48(text: Column): Column =
    conv(substring(Dedup.fingerprint(text), 1, 12), 16, 10).cast("long")

  /** Convenience: annotate a documents table with all analysis columns. */
  def analyze(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("lang_pred", langId(col(textCol)))
      .withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("n_bpeish", bpeishTokenCount(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("fp", docFingerprint(col(textCol)))
}
