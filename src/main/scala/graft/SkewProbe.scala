package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew evidence for the keyed-window family (VERDICT r10 #7): sessionize /
  * rollingAgg / sessionStats partition their window by the key column, so a
  * hot key serializes on one task. This probe REMAPS 20% of events onto a
  * single user (event_id % 5 == 0 → user -1) and records the task-duration
  * histogram of each operator, skewed vs natural, so the caveat carries a
  * measurement instead of a comment. AQE's skew handling covers joins and
  * shuffle-read splitting, NOT window partitions — a window over one key
  * value cannot be split without changing semantics — so the expected
  * result is one long task ≈ the hot key's share, and the question the
  * numbers answer is whether wall-clock stays bounded by max(hot-task,
  * rest/(cores-1)). Output: one JSON line per run on stdout.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val durations = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) durations.add(t.taskInfo.duration)
    })

    val natural = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts", "value", "event_type")
    // 20% of events on one hot user; everything else untouched
    val skewed = natural.withColumn("user_id",
      when(col("event_id") % 5 === 0, lit(-1L)).otherwise(col("user_id")))

    def run(name: String, df: DataFrame): Unit = {
      durations.clear()
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are posted asynchronously; give the bus a moment
      // to drain (private API; a bounded sleep is enough for a probe)
      Thread.sleep(500)
      val ds = {
        import scala.jdk.CollectionConverters._
        durations.asScala.map(_.toLong).toArray.sorted
      }
      val n = ds.length
      val p50 = if (n > 0) ds(n / 2) else 0L
      val max = if (n > 0) ds.last else 0L
      println(f"""{"probe":"$name","wall_sec":$wall%.2f,"tasks":$n,""" +
        f""""task_p50_ms":$p50,"task_max_ms":$max,""" +
        f""""max_over_p50":${if (p50 > 0) max.toDouble / p50 else 0d}%.1f}""")
    }

    import operators.TimeseriesOps
    for ((tag, ev) <- Seq("natural" -> natural, "skewed" -> skewed)) {
      run(s"sessionize_$tag",
        TimeseriesOps.sessionize(ev.select("event_id", "user_id", "ts"),
          "user_id", "ts", gapSeconds = 21600L))
      run(s"session_stats_$tag",
        TimeseriesOps.sessionStats(ev.select("user_id", "ts"),
          "user_id", "ts", gapSeconds = 21600L))
      run(s"rolling_agg_$tag",
        TimeseriesOps.rollingAgg(ev, "user_id", "ts", 21600L,
          Map("roll_n" -> count(lit(1)),
            "roll_sum_cents" -> sum(round(col("value") * 100).cast("long")))))
      run(s"rolling_agg_banded_$tag",
        TimeseriesOps.rollingAggBanded(
          ev.withColumn("cents", round(col("value") * 100).cast("long")),
          "event_id", "user_id", "ts", 21600L,
          Map("roll_n" -> ("cents", "count"),
            "roll_sum_cents" -> ("cents", "sum"))))
      // as-of join keyed forms: default keyed window vs the built-in
      // skewSafe bucketed runningLastKeyed path
      val left = ev.filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts")
      val right = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max(col("value")).as("click_value"))
      for (safe <- Seq(false, true))
        run(s"asof_join_${if (safe) "skewsafe" else "default"}_$tag",
          operators.JoinOps.asofJoin(left, right, on = "ts",
            by = Seq("user_id"), skewSafe = safe))
    }
    spark.stop()
  }
}
