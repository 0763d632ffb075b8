package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Forced hot-bucket probe (VERDICT r21 #1): demonstrates that the r22
  * bounded-state candidate generators keep per-group aggregation state
  * bounded where the r21 collect-then-cap shape ballooned.
  *
  * Builds a degenerate inverted index — ONE boilerplate bucket with `n`
  * members (the licence-header / templated-page case the caps exist to
  * kill) plus 10k small cold buckets — and runs both candidate-generation
  * shapes over it with a cap of 100:
  *
  *   old: groupBy(key).agg(collect_list(id)).filter(size BETWEEN 2 AND cap)
  *        — the hot bucket's FULL membership is materialized inside one
  *        aggregation buffer before the cap can drop it; a single group's
  *        list cannot spill partially (guide §5), so peak memory grows
  *        linearly with the hot bucket and OOMs at corpus scale.
  *   new: repartition(key) → constant-state count agg → anti-join the
  *        over-cap keys → collect_list on survivors only — the largest
  *        buffer is `cap` ids by construction.
  *
  * Both shapes produce the identical pair set (the cap decision is the
  * same); the probe asserts that and reports wall time, max task
  * peakExecutionMemory, and peak JVM heap per shape. Run with a modest
  * heap (e.g. -Xmx2g) and n=20000000 to see the old shape fall over while
  * the new one stays flat.
  *
  * Usage: runMain graft.HotBucketProbe [nHotMembers]
  */
object HotBucketProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val cap = 100
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one boilerplate bucket (key 0) with n members + 10k cold buckets of 3;
    // member payload is a ~40-char string, like the key strings the fuzzy
    // generators collect (longs understate the buffer cost)
    def payload(c: org.apache.spark.sql.Column) =
      concat(lpad(c.cast("string"), 20, "0"), lit("-"),
        lpad(c.cast("string"), 19, "x"))
    val rows = spark.range(n).select(lit(0L).as("key"), payload(col("id")).as("id"))
      .unionAll(spark.range(30000)
        .select((floor(col("id") / 3) + 1).cast("long").as("key"),
          payload(col("id") + n).as("id")))
      .localCheckpoint(eager = true) // pin the input so both shapes read identical data

    val peakExec = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          peakExec.getAndUpdate(m => math.max(m, e.taskMetrics.peakExecutionMemory))
    })
    // retained-memory signal: usage AFTER the most recent GC, summed over
    // heap pools (collectionUsage) — allocation churn is excluded, a live
    // aggregation buffer is not. The plain heapUsed peak is churn-dominated
    // by the shuffle and says nothing about buffer growth.
    import scala.jdk.CollectionConverters._
    val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
    def retained(): Long = pools.flatMap(p => Option(p.getCollectionUsage)).map(_.getUsed).sum
    @volatile var peakRetained = 0L
    @volatile var stopPoll = false
    val poller = new Thread(() => while (!stopPoll) {
      peakRetained = math.max(peakRetained, retained())
      Thread.sleep(10)
    })
    poller.setDaemon(true); poller.start()

    def unnest(collected: DataFrame): DataFrame = collected
      .select(col("__ids"), posexplode(col("__ids")).as(Seq("__i", "__x")))
      .select(col("__x").as("a"),
        explode(slice(col("__ids"), col("__i") + lit(2),
          size(col("__ids")) - col("__i") - lit(1))).as("b"))

    def run(tag: String)(make: => DataFrame): Long = {
      System.gc(); Thread.sleep(300)
      peakRetained = retained()
      val base = peakRetained
      peakExec.set(0L)
      val t0 = System.nanoTime()
      val cnt = make.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[hotbucket] $tag%-4s pairs=$cnt  time=$dt%7.2f s  " +
        f"taskPeakExecMB=${peakExec.get() / (1 << 20)}%5d  " +
        f"retainedDeltaMB=${(peakRetained - base).max(0L) / (1 << 20)}%5d")
      cnt
    }

    // new shape first (if the old shape OOMs, the new result is on record)
    val cNew = run("new") {
      val keyed = rows.repartition(col("key"))
      val hot = keyed.groupBy("key").agg(count(lit(1)).as("__n"))
        .filter(col("__n") > cap).select("key")
      unnest(keyed.join(hot, Seq("key"), "left_anti")
        .groupBy("key").agg(collect_list(col("id")).as("__ids"))
        .filter(size(col("__ids")) >= 2))
    }
    val cOld = run("old") {
      unnest(rows.groupBy("key").agg(collect_list(col("id")).as("__ids"))
        .filter(size(col("__ids")).between(2, cap)))
    }
    stopPoll = true
    assert(cNew == cOld, s"pair sets diverged: new=$cNew old=$cOld")
    println(s"[hotbucket] identical pair counts ($cNew) — shapes agree; " +
      s"n=$n cap=$cap")
    spark.stop()
  }
}
