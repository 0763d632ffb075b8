package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Do the lazy `localCheckpoint(eager = false)` pins in
  * [[graft.llm.Pipeline.addShard]] actually suppress stage re-execution
  * (VERDICT r13 #3)? Lazy local checkpoints only pin after their first
  * materialization, so the claim needs job-level evidence, not a comment.
  *
  * The probe runs the add_shard gate shape (same planted shard) twice per
  * variant — pins on vs pins off — with a listener summing jobs, stages,
  * and FILE-SOURCE input rows/bytes per action (cache hits do not count as
  * input, so re-reads of the parquet scans are exactly what the input
  * metrics isolate). If pinning works, the pinned variant reads the shard's
  * parquet lineage a constant number of times while the unpinned one
  * re-scans it once per downstream consumer. One JSON line per run.
  */
object CheckpointProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val inputRecords = new AtomicLong(0L)
    val inputBytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobEnd(j: SparkListenerJobEnd): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          inputRecords.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
          inputBytes.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
        }
    })

    // the listener bus is ASYNC: trailing events from one action can land
    // after the next variant resets the counters. Quiesce = wait until all
    // three counters are stable for `stableMs` before reading or resetting.
    def quiesce(stableMs: Long = 500L): Unit = {
      var last = (-1L, -1L, -1L)
      var stableSince = System.nanoTime()
      while ((System.nanoTime() - stableSince) / 1e6 < stableMs) {
        val cur = (jobs.get.toLong, stages.get.toLong, inputRecords.get)
        if (cur != last) { last = cur; stableSince = System.nanoTime() }
        Thread.sleep(50L)
      }
    }

    def run(pin: Boolean): Unit = {
      val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      // window opens BEFORE the plan is built: under AQE, localCheckpoint's
      // .rdd materializes the checkpointed subtree's shuffle stages at
      // plan-build time, so counters reset after addShard() would miss the
      // pinned variant's heavy jobs entirely (first probe draft did)
      quiesce()
      jobs.set(0); stages.set(0); inputRecords.set(0L); inputBytes.set(0L)
      val t0 = System.nanoTime()
      // the gate's planted shard, by construction (shared builder)
      val out = graft.llm.Pipeline.addShard(docs,
        QueriesLlm.addShardGateShard(docs),
        "doc_id", "text", threshold = 0.8, pin = pin)
      val n = out.count()
      val wall = (System.nanoTime() - t0) / 1e9
      quiesce()
      println(f"""{"probe":"add_shard_pin","pin":$pin,"rows":$n,""" +
        f""""wall_s":$wall%.2f,"jobs":${jobs.get},"stages":${stages.get},""" +
        f""""input_records":${inputRecords.get},"input_mb":${inputBytes.get / 1e6}%.1f}""")
    }

    // unpinned first, then pinned; two passes each so the second pass of
    // each variant is JIT/page-cache warm — compare the warm passes
    Seq(false, false, true, true).foreach(run)
    spark.stop()
  }
}
