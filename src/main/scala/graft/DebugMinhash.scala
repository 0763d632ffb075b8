package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** One-off instrumentation for the MinHash-LSH pipeline stages. */
object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val corpus = docs.unionAll(docs.filter(col("doc_id") < 20)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" extraword")).as("text")))

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    val par = spark.sparkContext.defaultParallelism
    val base = corpus.repartition(par)
      .withColumn("sig", Dedup.minhashSignature(col("text"), 128))
      .localCheckpoint(eager = false)
    time("signatures")(base.count())
    val banded = base.select(col("doc_id").as("id"),
      posexplode(transform(sequence(lit(0), lit(31)),
        b => xxhash64(slice(col("sig"), b * 4 + 1, lit(4)).cast("string"), b)))
        .as(Seq("band", "bandhash")))
    val cands = banded.as("a").join(banded.as("b"), Seq("band", "bandhash"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
    println(s"[debug] raw candidate rows: ${time("rawcands")(cands.count())}")
    println(s"[debug] distinct candidate pairs: ${time("distinct")(cands.dropDuplicates("id1", "id2").count())}")
    println(s"[debug] bucket size p99: " + banded.groupBy("band", "bandhash").count()
      .agg(expr("percentile(count, 0.99)"), max("count")).collect()(0))
    spark.stop()
  }
}
