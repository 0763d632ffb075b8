package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream analytics (engine extensions — clickstream staples the
  * reference has no equivalent for, expressed as the keyed aggregations a
  * 100 TB event table needs; companions to [[TimeseriesOps.sessionize]]).
  */
object EventOps {

  /** Ordered funnel: for each key, the earliest time it completed each
    * step IN ORDER (step i+1 must happen strictly after step i's earliest
    * completion — the standard "first touch" funnel). Output: one row per
    * key with `<step>_ts` columns (null once the funnel broke) and
    * `stage` = number of steps completed.
    *
    * Scale shape: one filtered aggregation per step — min(ts) over the
    * step's events later than the previous step's time, carried by an
    * equi join on the key. `steps` is small and fixed (funnels are 3-6
    * stages), so the plan is a short chain of keyed aggregations; every
    * shuffle is on the key, events are filtered to the step's type BEFORE
    * aggregating (pushdown-friendly), and nothing is per-event quadratic.
    */
  def funnel(df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel: need at least one step")
    require(steps.distinct.size == steps.size, "funnel: duplicate steps")
    val k = col(s"`$keyCol`")
    val base = df.select(k, col(s"`$tsCol`").as("__ts"),
      col(s"`$typeCol`").as("__type"))
    val keys = base.select(k).distinct()
    steps.zipWithIndex.foldLeft(keys) { case (acc, (step, i)) =>
      val prevTs = if (i == 0) lit(null) else col(s"`${steps(i - 1)}_ts`")
      val stepEvents = base.filter(col("__type") === step)
      // first step: plain min; later steps: min of this type AFTER the
      // previous step's first completion — join on key, filter, agg
      val firstTs =
        if (i == 0)
          stepEvents.groupBy(k).agg(min(col("__ts")).as(s"${step}_ts"))
        else
          stepEvents.join(acc.select(k, prevTs.as("__prev")), Seq(keyCol))
            .filter(col("__ts") > col("__prev"))
            .groupBy(k).agg(min(col("__ts")).as(s"${step}_ts"))
      acc.join(firstTs, Seq(keyCol), "left")
    }.withColumn("stage",
      steps.map(s => when(col(s"`${s}_ts`").isNotNull, 1).otherwise(0))
        .reduce(_ + _).cast("long"))
  }

  /** Cohort retention: assign each key to the cohort period of its FIRST
    * event, then count distinct keys active in each later period offset —
    * the (cohort, offset) → users retention triangle. `period` is any
    * `date_trunc` unit ("week", "day", "month").
    *
    * Scale shape: one aggregation on the key for the cohort (min ts), an
    * equi join back on the key (AQE-broadcastable — one row per key), and
    * one count_distinct aggregation on (cohort, offset). All shuffles
    * keyed; no window, no self-join of events.
    */
  def cohortRetention(df: DataFrame, keyCol: String, tsCol: String,
      period: String = "week"): DataFrame = {
    val k = col(s"`$keyCol`")
    val bucket = date_trunc(period, col(s"`$tsCol`"))
    val cohorts = df.groupBy(k)
      .agg(min(date_trunc(period, col(s"`$tsCol`"))).as("cohort"))
    val unit = period.toLowerCase match {
      case "day" => 86400L
      case "week" => 604800L
      case "month" => 0L // months are irregular: offset via months_between
      case other => throw new IllegalArgumentException(
        s"cohort_retention: unsupported period '$other' (day|week|month)")
    }
    val offset =
      if (unit == 0L)
        months_between(col("__b"), col("cohort")).cast("long")
      else
        ((unix_micros(col("__b")) - unix_micros(col("cohort"))) /
          (unit * 1000000L)).cast("long")
    df.select(k, bucket.as("__b"))
      .join(cohorts, Seq(keyCol))
      .withColumn("period_offset", offset)
      .groupBy(col("cohort"), col("period_offset"))
      .agg(count_distinct(k).as("n_active"))
  }
}
