package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Does pinning the static FastSS variant index in
  * [[graft.streaming.StreamingOps.fuzzyMatchFlags]] actually stop the
  * per-micro-batch re-scan + re-hash of the reference (VERDICT r14 #4)?
  *
  * The driver gate cannot show this: its file source delivers the whole
  * stream in ONE micro-batch, where pin=true pays its materialization and
  * reuses nothing. The production shape is a long-running stream — many
  * batches against one static reference — so the probe drives K
  * micro-batches explicitly through a MemoryStream (one addData +
  * processAllAvailable per batch) and A/Bs `pin` with the
  * [[CheckpointProbe]] listener protocol: jobs, stages, and FILE-source
  * input rows per variant (cache hits don't count as input, so parquet
  * re-reads of the static side are exactly what the input metric
  * isolates). If the pin works, pin=true reads the customer parquet a
  * constant number of times while pin=false re-scans it once per batch.
  * One JSON line per run; two passes per variant, compare the warm ones.
  */
object FuzzyIndexProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_PROBE_BATCHES", "8").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

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
    def quiesce(stableMs: Long = 500L): Unit = {
      var last = (-1L, -1L, -1L)
      var stableSince = System.nanoTime()
      while ((System.nanoTime() - stableSince) / 1e6 < stableMs) {
        val cur = (jobs.get.toLong, stages.get.toLong, inputRecords.get)
        if (cur != last) { last = cur; stableSince = System.nanoTime() }
        Thread.sleep(50L)
      }
    }

    // the gate's split: every 100th customer arrives as the stream, the
    // disjoint rest is the static reference. The stream rows are collected
    // once (probe-only, gate-sized — 1% of customers) and fed back in K
    // explicit micro-batches.
    val streamRows = Tables.customer(spark, sfDir)
      .filter(col("c_custkey") % 100 === 0)
      .select(col("c_custkey").cast("long"), col("c_name"))
      .as[(Long, String)].collect()
    val batchSlices = streamRows.grouped(
      math.max(1, (streamRows.length + nBatches - 1) / nBatches)).toSeq

    def run(pin: Boolean): Unit = {
      val ref = Tables.customer(spark, sfDir)
        .filter(col("c_custkey") % 100 =!= 0)
        .select("c_custkey", "c_name")
      quiesce()
      jobs.set(0); stages.set(0); inputRecords.set(0L); inputBytes.set(0L)
      val t0 = System.nanoTime()
      val ms = MemoryStream[(Long, String)](spark)
      val out = graft.streaming.StreamingOps.fuzzyMatchFlags(
        ms.toDF.toDF("c_custkey", "c_name"), "c_custkey", "c_name",
        ref, "c_custkey", "c_name", maxDist = 1, pin = pin)
      val qn = s"fuzzy_probe_${pin}_${System.nanoTime()}"
      val q = out.writeStream.format("memory").queryName(qn)
        .outputMode("update").start()
      batchSlices.foreach { slice =>
        ms.addData(slice.toIndexedSeq)
        q.processAllAvailable() // one explicit micro-batch per slice
      }
      // pinned-index footprint while the stream is still live (the pin's
      // steady-state cost): memory+disk bytes across all persisted blocks
      val storage = spark.sparkContext.getRDDStorageInfo
      val cachedMem = storage.map(_.memSize).sum
      val cachedDisk = storage.map(_.diskSize).sum
      q.stop()
      val n = spark.table(qn).count()
      val wall = (System.nanoTime() - t0) / 1e9
      quiesce()
      println(f"""{"probe":"fuzzy_index_pin","pin":$pin,"batches":${batchSlices.length},""" +
        f""""matched":$n,"wall_s":$wall%.2f,"jobs":${jobs.get},"stages":${stages.get},""" +
        f""""input_records":${inputRecords.get},"input_mb":${inputBytes.get / 1e6}%.1f,""" +
        f""""cached_mem_mb":${cachedMem / 1e6}%.1f,"cached_disk_mb":${cachedDisk / 1e6}%.1f}""")
      spark.catalog.dropTempView(qn)
      // variants must not share cache: release the pinned index (memo +
      // cache registration) before the next run so each pass re-materializes
      graft.streaming.StreamingOps.unpinFuzzyIndexes()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    Seq(false, false, true, true).foreach(run)
    spark.stop()
  }
}
