package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Is `heavyHittersStream`'s state really O(capacity) when eviction is
  * ACTIVE (capacity << vocab), not just at the gate's no-eviction setting
  * (VERDICT r14 #5)? The gate runs capacity 4096 over a ~31-token vocab,
  * so the Misra-Gries buffer never evicts and the state bound is untested
  * by measurement.
  *
  * The probe streams the documents table in 8 real micro-batches (the
  * single parquet file is re-split into 8 files once, maxFilesPerTrigger=1)
  * and reads the streaming aggregation's state from each
  * StreamingQueryProgress: state rows, state bytes, processed rows/s. If
  * the MG buffer honors its bound, state bytes are flat across batches and
  * scale with capacity, NOT with the running token count or vocab — the
  * eviction run (capacity 64) must hold state strictly below the
  * no-eviction run (capacity 4096) on the same data. One JSON line per
  * (capacity) run; `vocab` is the batch-side distinct token count for the
  * capacity<<vocab precondition.
  */
object HeavyHittersStateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // documents alone cannot exercise eviction — ScaleGen keeps the token
    // vocabulary tiny (41 at target/sf1), so ANY capacity >= 41 never
    // evicts. The eviction stress unions the near-unique customer names in
    // (~1 distinct token per customer → vocab ≈ #customers): the document
    // tokens are the true heavy hitters, the name tail churns the buffer.
    val docs = Tables.documents(spark, sfDir).select("text")
      .unionByName(Tables.customer(spark, sfDir).select(col("c_name").as("text")))
    val nDocs = docs.count()
    val vocab = docs.select(explode(graft.llm.Dedup.tokens(col("text"))).as("t"))
      .agg(countDistinct(col("t"))).head.getLong(0)

    // one-time 8-file split so maxFilesPerTrigger=1 yields 8 micro-batches.
    // The split path embeds the source sfDir: a _SUCCESS-only gate silently
    // reused the PREVIOUS scale's split when the probe was re-run with a
    // different sfDir (sf0.1 vs sf1) and reported wrong measurements.
    // ...and embeds the source content fingerprint (row count here — cheap,
    // already computed) so a source regenerated in place invalidates the
    // split instead of silently measuring stale data (ADVICE r16).
    val splitDir = "target/probe_docs_split_" +
      sfDir.replaceAll("[^A-Za-z0-9._-]", "_") + s"_n$nDocs"
    if (!new java.io.File(s"$splitDir/_SUCCESS").exists())
      docs.repartition(8).write.mode("overwrite").parquet(splitDir)

    def run(capacity: Int): Unit = {
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(splitDir)
      val t0 = System.nanoTime()
      val qn = s"hh_state_probe_${capacity}_${System.nanoTime()}"
      val q = graft.streaming.StreamingOps
        .heavyHittersStream(stream, "text", capacity)
        .writeStream.format("memory").queryName(qn)
        .outputMode("complete").start()
      q.processAllAvailable()
      // per-batch state trajectory: flat rows + bounded bytes = O(capacity)
      val prog = q.recentProgress.filter(_.stateOperators.nonEmpty)
      val trail = prog.map { p =>
        val s = p.stateOperators.head
        (s.numRowsTotal, s.memoryUsedBytes, p.processedRowsPerSecond)
      }
      q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      val (rows, bytes, _) = trail.last
      val peakBytes = trail.map(_._2).max
      val rps = trail.map(_._3).filterNot(_.isNaN)
      val rpsAvg = if (rps.isEmpty) 0.0 else rps.sum / rps.length
      println(f"""{"probe":"hh_state","capacity":$capacity,"docs":$nDocs,""" +
        f""""vocab":$vocab,"batches":${trail.length},"state_rows":$rows,""" +
        f""""state_bytes_last":$bytes,"state_bytes_peak":$peakBytes,""" +
        f""""state_bytes_per_batch":"${trail.map(_._2).mkString(",")}",""" +
        f""""rows_per_s":$rpsAvg%.0f,"wall_s":$wall%.2f}""")
      spark.catalog.dropTempView(qn)
    }

    // no-eviction reference first, then the eviction config; each twice —
    // warm pass is the record
    Seq(4096, 4096, 64, 64).foreach(run)
    spark.stop()
  }
}
