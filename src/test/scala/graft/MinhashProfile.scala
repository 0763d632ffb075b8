package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Ad-hoc stage attribution for the minhash pipeline at a given SF dir —
  * not a test; run with `Test/runMain graft.MinhashProfile` when a bench
  * number needs explaining. Times cumulative prefixes of the pipeline, so
  * stage cost = delta between consecutive lines.
  */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[T](label: String)(f: => T): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    def docs = Tables.documents(spark, d)
    val numBands = 32; val rowsPerBand = 4
    val par = spark.sparkContext.defaultParallelism

    // warm the JVM/codegen once with the full pipeline
    time("warmup full pipeline") {
      Dedup.minhashDupPairs(docs, "doc_id", "text", 0.8).count()
    }
    time("sig compute (no checkpoint)") {
      docs.repartition(par).select(col("doc_id").as("id"), col("text"))
        .withColumn("sig", graft.functions.vector.minhash_sig(
          Dedup.tokens(col("text")), numBands * rowsPerBand, 3))
        .filter(col("sig").isNotNull).count()
    }
    time("+ band explode + count agg") {
      val base = docs.repartition(par).select(col("doc_id").as("id"), col("text"))
        .withColumn("sig", graft.functions.vector.minhash_sig(
          Dedup.tokens(col("text")), numBands * rowsPerBand, 3))
        .filter(col("sig").isNotNull)
      base.select(col("id"), posexplode(Dedup.bandHashes(col("sig"), numBands, rowsPerBand))
        .as(Seq("band", "bandhash")))
        .groupBy("band", "bandhash").count().filter(col("count") > 1).count()
    }
    time("full pipeline (2nd run)") {
      Dedup.minhashDupPairs(docs, "doc_id", "text", 0.8).count()
    }
    time("full pipeline (3rd run)") {
      Dedup.minhashDupPairs(docs, "doc_id", "text", 0.8).count()
    }
    spark.stop()
  }
}
