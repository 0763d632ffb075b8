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
    */
  def decodeStub(payload: Column, dims: Int = 4): Column =
    array((0 until dims).map(i =>
      (pmod(xxhash64(payload, lit(i)), lit(1000)).cast("double") / 1000.0d)): _*)

  /** Frame-sample stub: pick every `stride`-th byte as a "frame" marker —
    * stands in for video frame sampling; shows the explode-based fan-out a
    * real sampler uses.
    */
  def frameSample(payload: Column, stride: Int): Column =
    transform(
      sequence(lit(1), greatest(octet_length(payload), lit(1)), lit(stride)),
      i => substring(payload, 1, 8))

  /** Featurize assets: metadata + stub features. Runs as a narrow projection
    * over whatever partitioning the payloads arrived with; repartition by
    * size upstream when payload skew matters.
    */
  def featurize(df: DataFrame, dims: Int = 4): DataFrame =
    df.withColumn("features", decodeStub(col("payload"), dims))
}
