package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata
  * structs, with the decode step STUBBED (no image/audio libs in this
  * container — see builder brief). The Spark-side mechanics are real:
  * schema, partition-sized batch processing, deterministic feature output.
  */
object Multimodal {

  /** Wrap a source column as a multimodal asset: binary payload + metadata
    * struct (mime, byte length, checksum). With real assets the payload
    * column comes from `spark.read.format("binaryFile")` — same schema.
    */
  def asAsset(df: DataFrame, srcCol: String, mime: String): DataFrame =
    df.withColumn("payload", col(srcCol).cast("binary"))
      .withColumn("meta", struct(
        lit(mime).as("mime"),
        octet_length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("checksum")))

  /** STUB decode: a real pipeline would decode image/audio bytes here
    * (Pandas UDF / mapInPandas in PySpark, or a JNI codec in Scala) and
    * emit fixed-size feature vectors. The container has no codec libs, so
    * this emits a deterministic fake feature vector derived from the bytes
    * — the schema, batching, and partitioning are the real contract.
    * Derived from md5 (not xxhash64) so an external oracle can reproduce
    * the exact values.
    */
  def decodeStub(payload: Column, dims: Int = 4): Column =
    array((0 until dims).map(i => stubFeature(payload, i)): _*)

  /** One deterministic pseudo-feature in [0, 1): lane `i` salts the payload,
    * md5, take 6 hex digits, scale. Pure codegen'd expressions.
    */
  def stubFeature(payload: Column, i: Int): Column =
    (conv(substring(md5(concat(payload, lit(i.toString).cast("binary"))), 1, 6), 16, 10)
      .cast("long") % 1000L).cast("double") / 1000.0d

  /** Frame-sample stub: pick every `stride`-th byte as a "frame" marker —
    * stands in for video frame sampling; shows the explode-based fan-out a
    * real sampler uses.
    */
  def frameSample(payload: Column, stride: Int): Column =
    transform(
      sequence(lit(1), greatest(octet_length(payload), lit(1)), lit(stride)),
      i => payload.substr(i, lit(8)))

  /** Resize stub: deterministic byte-stride downsample of the payload to
    * ≈ `targetBytes` (stride = ceil(n / target); every stride-th byte kept).
    * A real pipeline decodes, rescales, and re-encodes here — the Spark
    * contract this stands in for is binary → smaller binary as a narrow
    * projection, metadata recomputed downstream. The strided fold is
    * interpreted (aggregate over a sequence): payloads are stub-sized; a
    * production resize is a codec call per row, not byte surgery.
    */
  def resizeStub(payload: Column, targetBytes: Int): Column = {
    val n = octet_length(payload)
    val stride = greatest(ceil(n.cast("double") / targetBytes).cast("int"), lit(1))
    aggregate(
      sequence(lit(1), greatest(n, lit(1)), stride),
      lit(Array.empty[Byte]),
      (acc, i) => concat(acc, payload.substr(i, lit(1))))
  }

  /** Featurize assets: metadata + stub features. Runs as a narrow projection
    * over whatever partitioning the payloads arrived with; repartition by
    * size upstream when payload skew matters.
    */
  def featurize(df: DataFrame, dims: Int = 4): DataFrame =
    df.withColumn("features", decodeStub(col("payload"), dims))
}
