package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design: everything is per-row expressions + one shuffle on the
  * blocking key (hash / LSH bucket). No driver-side data movement. MinHash
  * signatures are computed WITHOUT exploding shingles (array_min over
  * transform), so signature cost is a narrow map; only candidate generation
  * shuffles, keyed by (band, bandHash) — at 100 TB that shuffle carries
  * (numBands × numDocs) small rows, not the text.
  */
object Dedup {

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Distinct word n-gram shingles of a text column. */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = tokens(text)
    array_distinct(
      transform(sequence(lit(0), greatest(size(w) - n, lit(0))),
        i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*)))
  }

  /** Exact dedup: keep the lowest-id row per identical text (hash groupBy —
    * one shuffle on the 128-bit text hash, not the text itself).
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Canonical token-set fingerprint (md5 of sorted distinct tokens) —
    * catches reorder/duplicate-word near-dups exactly.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))).cast("binary"))

  /** MinHash signature: numHashes values, each the min over shingles of a
    * seeded xxhash64. Pure narrow projection (no explode).
    */
  def minhashSignature(text: Column, numHashes: Int, shingleN: Int = 3): Column = {
    val sh = shingles(text, shingleN)
    array((0 until numHashes).map(i =>
      array_min(transform(sh, s => xxhash64(s, lit(i))))): _*)
  }

  /** MinHash-LSH near-duplicate pairs, verified with exact shingle Jaccard.
    *
    * Pipeline (all distributed): signature (narrow) → explode bands →
    * shuffle on (band, bandHash) → self-join per bucket → distinct candidate
    * pairs → exact-Jaccard verify on the pair's shingle sets → threshold.
    * With numBands×rowsPerBand hashes, P(miss | j≥τ) = (1-τ^r)^b — for
    * r=4, b=32, τ=0.8 that is ~5e-8, so the verified output is exactly the
    * τ-threshold pair set (what the DuckDB oracle computes exhaustively).
    */
  def minhashDupPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, numBands: Int = 32, rowsPerBand: Int = 4,
      shingleN: Int = 3): DataFrame = {
    val numHashes = numBands * rowsPerBand
    val withSig = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sig", minhashSignature(col("text"), numHashes, shingleN))
      .withColumn("sh", shingles(col("text"), shingleN))
    val banded = withSig.select(col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(numBands - 1)),
        b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))
          .cast("string"), b))).as(Seq("band", "bandhash")))
    val a = banded.select(col("band"), col("bandhash"),
      col("id").as("id1"), col("sh").as("sh1"))
    val b = banded.select(col("band"), col("bandhash"),
      col("id").as("id2"), col("sh").as("sh2"))
    val cands = a.join(b, Seq("band", "bandhash"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2", "sh1", "sh2")
      .dropDuplicates("id1", "id2")
    cands
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("j", col("inter").cast("double") /
        (size(col("sh1")) + size(col("sh2")) - col("inter")))
      .filter(col("j") >= threshold)
      .select("id1", "id2", "j")
  }

  /** Exact all-pairs n-gram Jaccard above a threshold — the quadratic
    * baseline the LSH path approximates; use only at small scale or within
    * blocks.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("sh"))
    val a = sh.select(col("id").as("id1"), col("sh").as("sh1"))
    val b = sh.select(col("id").as("id2"), col("sh").as("sh2"))
    a.join(b, col("id1") < col("id2"))
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("j", col("inter").cast("double") /
        (size(col("sh1")) + size(col("sh2")) - col("inter")))
      .filter(col("j") >= threshold)
      .select("id1", "id2", "j")
  }

  /** 48-bit SimHash over distinct tokens, with md5-derived token hashes
    * (md5 so the oracle can reproduce it; 48 bits keeps the value in a
    * signed BIGINT). One explode + one map-side-combinable aggregation.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int = 48): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(array_distinct(tokens(col(textCol)))).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok").cast("binary")), 1, bits / 4), 16, 10).cast("long"))
    val bitSums = (0 until bits).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j"))
    val agg = tok.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until bits).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)): Column).reduce(_ + _)
    agg.select(col("id"), sig.as("simhash"))
  }
}
