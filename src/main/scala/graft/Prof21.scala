package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-21 step-timing probe (measurement tool, not a gate): times the
  * internal stages of the MinHash pair pipeline the way the optimization
  * work measured them — base signature materialization, candidate
  * generation, verify — so a future round can re-localize where a dedup
  * gate's seconds go without re-deriving the harness. Warmup matches
  * Bench.scala (one-time codegen/JIT otherwise lands on the first stage).
  *
  *   sbt "runMain graft.Prof21 /root/testdata/sf0.1"
  */
object Prof21 {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    noop(spark.read.parquet(s"$d/lineitem.parquet")
      .selectExpr("count(distinct l_returnflag)", "sum(l_quantity)"))
    locally {
      import graft.functions.vector
      val docs0 = spark.read.parquet(s"$d/documents.parquet").limit(64)
        .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      noop(docs0.select(vector.minhash_sig(col("toks"), 128, 3).as("m"),
        vector.window_min(vector.gram_hash48(col("toks"), 3), 4).as("w")))
    }
    import graft.llm.Dedup
    val docs1 = graft.Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val corpus = docs1.unionAll(docs1.filter(col("doc_id") < 20)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" extraword")).as("text")))
    // round 1 absorbs residual JIT; read round 2 as the warm numbers
    for (round <- 1 to 2) {
      val base = corpus.repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id").as("id"), col("text"))
        .withColumn("sig",
          graft.functions.vector.minhash_sig(Dedup.tokens(col("text")), 128, 3))
        .filter(col("sig").isNotNull).localCheckpoint(eager = false)
      time(s"r$round base materialize (sig)")(noop(base))
      val banded = base.select(col("id"),
        posexplode(Dedup.bandHashes(col("sig"), 32, 4)).as(Seq("band", "bandhash")))
      val coldCands = banded.groupBy("band", "bandhash")
        .agg(collect_list(col("id")).as("__ids"))
        .filter(size(col("__ids")).between(2, 100000))
        .select(col("__ids"), posexplode(col("__ids")).as(Seq("__i", "__x")))
        .select(col("__x").as("__a"),
          explode(slice(col("__ids"), col("__i") + lit(2),
            size(col("__ids")) - col("__i") - lit(1))).as("__b"))
        .select(least(col("__a"), col("__b")).as("id1"),
          greatest(col("__a"), col("__b")).as("id2"))
      time(s"r$round coldCands (one-agg form)")(noop(coldCands))
      time(s"r$round minhashDupPairs full")(noop(
        Dedup.minhashDupPairs(corpus, "doc_id", "text", 0.8)))
      time(s"r$round dupClusters full")(noop(Dedup.dupClusters(
        corpus.select(col("doc_id").as("id")), "id",
        Dedup.minhashDupPairs(corpus, "doc_id", "text", 0.8))))
      time(s"r$round dupClusters FORCED-DISTRIBUTED")(noop(Dedup.dupClusters(
        corpus.select(col("doc_id").as("id")), "id",
        Dedup.minhashDupPairs(corpus, "doc_id", "text", 0.8),
        smallEdgeThreshold = 0L)))
      // corpus >> members isolation: 600k ids, ~60 chained pairs — the
      // distributed-loop shape whose per-iteration cost the member
      // restriction targets (the sf0.1 documents corpus is too small to
      // separate |corpus| from |members|)
      val bigIds = spark.read.parquet(s"$d/lineitem.parquet")
        .select((col("l_orderkey") * 10 + col("l_linenumber")).as("id")).distinct()
      val chainPairs = spark.range(0, 60).toDF("i")
        .select((col("i") * 2).as("id1"), (col("i") * 2 + 2).as("id2"))
      time(s"r$round dupClusters 600k-ids FORCED-DIST")(noop(Dedup.dupClusters(
        bigIds, "id", chainPairs, smallEdgeThreshold = 0L)))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
