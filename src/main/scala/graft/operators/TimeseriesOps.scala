package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Timeseries verbs (SURVEY §2.12; reference: janitor/timeseries.py).
  * pandas keys these off the DatetimeIndex; the Spark forms take the
  * timestamp/order column explicitly.
  */
object TimeseriesOps {

  /** Reindex over a complete timestamp grid (reference:
    * janitor/timeseries.py:14-77): rows whose timestamp is missing from
    * grid(first..last step frequency) appear with null value columns.
    * `frequency` is a Spark interval string ("1 hour", "15 minutes").
    * Bounds default to min/max of the data (one tiny aggregate, driver-
    * collected — 1 row). The grid is a distributed `spark.range(0, n)` Range
    * exec (split across all executors) mapped to timestamps, NOT one
    * exploded `sequence()` row — a year of seconds is 31M grid rows, which
    * must never materialize on a single task. Matches `sequence` semantics:
    * grid(i) = lo + i*step (fixed duration for day-and-smaller units,
    * calendar arithmetic for month/quarter/year). A mixed calendar+time
    * frequency ("1 month 3 hours") falls back to the explode form.
    */
  def fillMissingTimestamps(df: DataFrame, tsCol: String, frequency: String,
      firstTimeStamp: Option[java.sql.Timestamp] = None,
      lastTimeStamp: Option[java.sql.Timestamp] = None): DataFrame = {
    val spark = df.sparkSession
    val b = df.agg(
      firstTimeStamp.map(lit).getOrElse(min(col(s"`$tsCol`"))).as("__lo"),
      lastTimeStamp.map(lit).getOrElse(max(col(s"`$tsCol`"))).as("__hi"))
      .collect()(0)
    if (b.isNullAt(0) || b.isNullAt(1))
      return spark.emptyDataFrame
        .withColumn(tsCol, lit(null).cast("timestamp"))
        .join(df, Seq(tsCol), "left")
    val lo = b.getTimestamp(0)
    val hi = b.getTimestamp(1)

    val microsPer = Map("microsecond" -> 1L, "millisecond" -> 1000L,
      "second" -> 1000000L, "minute" -> 60000000L, "hour" -> 3600000000L,
      "day" -> 86400000000L, "week" -> 604800000000L)
    val monthsPer = Map("month" -> 1L, "quarter" -> 3L, "year" -> 12L)
    val parts = frequency.trim.toLowerCase.split("\\s+")
    require(parts.length >= 2 && parts.length % 2 == 0,
      s"fill_missing_timestamps: bad frequency '$frequency'")
    val units = parts.grouped(2).map(a => (a(0).toLong, a(1).stripSuffix("s"))).toSeq
    def epochMicros(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000 + t.getNanos / 1000

    val daysPer = Map("day" -> 1L, "week" -> 7L)
    val grid: DataFrame =
      if (units.forall(u => daysPer.contains(u._2))) {
        // pure day/week frequencies use calendar-day arithmetic in the
        // session timezone (DST-correct, like sequence / pandas date_range
        // 'D'/'W'), not fixed 86400s micro-steps; mixed day+time frequencies
        // ("1 day 3 hours") stay fixed-duration below, matching pandas
        // Timedelta composites
        val stepD = units.map { case (a, u) => a * daysPer(u) }.sum
        require(stepD > 0, s"fill_missing_timestamps: non-positive step '$frequency'")
        // generous bound: DST-short 23h days, then filter
        val upper = (hi.getTime - lo.getTime) / (23L * 3600000L * stepD) + 2
        spark.range(0, upper)
          .withColumn("__lo", lit(lo))
          .select(expr(s"timestampadd(DAY, CAST(id * $stepD AS INT), __lo)").as(tsCol))
          .filter(col(s"`$tsCol`") <= lit(hi))
      } else if (units.forall(u => microsPer.contains(u._2))) {
        val step = units.map { case (a, u) => a * microsPer(u) }.sum
        require(step > 0, s"fill_missing_timestamps: non-positive step '$frequency'")
        val loU = epochMicros(lo)
        val n = (epochMicros(hi) - loU) / step + 1
        spark.range(0, n)
          .select(timestamp_micros(lit(loU) + col("id") * lit(step)).as(tsCol))
      } else if (units.forall(u => monthsPer.contains(u._2))) {
        val stepM = units.map { case (a, u) => a * monthsPer(u) }.sum
        require(stepM > 0, s"fill_missing_timestamps: non-positive step '$frequency'")
        // generous upper bound on step count (28-day months), then filter —
        // `sequence` month semantics are lo + i*interval with end-of-month
        // clamping, which timestampadd(MONTH, ...) reproduces exactly
        val upper = (hi.getTime - lo.getTime) / (28L * 86400000L * stepM) + 2
        spark.range(0, upper)
          .withColumn("__lo", lit(lo))
          .select(expr(s"timestampadd(MONTH, CAST(id * $stepM AS INT), __lo)").as(tsCol))
          .filter(col(s"`$tsCol`") <= lit(hi))
      } else {
        // bounds as lit() columns, not Timestamp.toString interpolation —
        // the string form renders in the JVM-default timezone, which can
        // disagree with spark.sql.session.timeZone
        spark.range(0, 1)
          .select(explode(sequence(lit(lo), lit(hi),
            expr(s"interval $frequency"))).as(tsCol))
      }
    grid.join(df, Seq(tsCol), "left")
  }

  /** Sort so the timestamp column is monotonic (reference:
    * janitor/timeseries.py:225-256). strict=true drops duplicate
    * timestamps keeping the first occurrence — "first" needs a total order
    * in a distributed setting, so pass `tiebreak` columns (pandas uses
    * positional order, which doesn't exist here; SURVEY §7.7).
    */
  def sortTimestampsMonotonically(df: DataFrame, tsCol: String,
      direction: String = "increasing", strict: Boolean = false,
      tiebreak: Seq[String] = Nil): DataFrame = {
    require(direction == "increasing" || direction == "decreasing",
      s"sort_timestamps_monotonically: bad direction $direction")
    val deduped =
      if (!strict) df
      else if (tiebreak.nonEmpty)
        GroupedOps.takeFirst(df, Seq(tsCol), tiebreak.head,
          tiebreak = tiebreak.tail)
      else df.dropDuplicates(tsCol)
    if (direction == "increasing") deduped.orderBy(col(s"`$tsCol`").asc)
    else deduped.orderBy(col(s"`$tsCol`").desc)
  }

  /** Per-column jump criteria (reference: janitor/timeseries.py:257-399).
    * scale ∈ absolute|percentage, direction ∈ increasing|decreasing|any,
    * threshold ≥ 0 (always a strict greater-than check).
    */
  case class JumpCriteria(scale: String = "percentage",
      direction: String = "any", threshold: Double = 0.0) {
    require(Seq("absolute", "percentage").contains(scale),
      s"flag_jumps: unrecognized scale '$scale'")
    require(Seq("increasing", "decreasing", "any").contains(direction),
      s"flag_jumps: unrecognized direction '$direction'")
    require(threshold >= 0.0,
      s"flag_jumps: threshold $threshold must be >= 0.0; use direction for sign intent")
  }

  /** Flag rows whose change vs the previous row (in `orderCol` order — the
    * stand-in for the pandas index) exceeds the criteria; appends
    * `<col>_jump_flag` (0/1) per flagged column. Default criteria apply to
    * every column except `orderCol`; `perColumn` overrides individually;
    * strict=true flags ONLY the perColumn keys (reference raises when
    * strict and no dict was given). The consecutive-row lag is the
    * scale-safe bucketed [[ScaleWindows.lag1]] — no single-partition window.
    */
  def flagJumps(df: DataFrame, orderCol: String,
      default: JumpCriteria = JumpCriteria(),
      perColumn: Map[String, JumpCriteria] = Map.empty,
      strict: Boolean = false): DataFrame = {
    if (strict) require(perColumn.nonEmpty,
      "flag_jumps: when enacting strict=true, per-column criteria must be provided")
    val cols =
      if (strict) perColumn.keys.toSeq.sorted
      else df.columns.filterNot(_ == orderCol).toSeq.sorted
    val lagged = ScaleWindows.lag1(df, orderCol, cols)
    val flagged = cols.foldLeft(lagged) { (acc, c) =>
      val crit = perColumn.getOrElse(c, default)
      val cur = col(s"`$c`").cast("double")
      val prev = col(s"`${c}__prev`").cast("double")
      val diff = cur - prev
      // pandas pct_change at a zero previous value is IEEE ±inf (0/0 is
      // NaN); Spark 4's ANSI division THROWS on /0, so the zero case is
      // branched explicitly. NaN guard: Spark orders NaN above every
      // number (abs(NaN) > t would flag a 0 -> 0 row), pandas' NaN
      // comparison is false — mask it.
      val pct = when(prev === 0.0d,
          when(cur > 0.0d, lit(Double.PositiveInfinity))
            .when(cur < 0.0d, lit(Double.NegativeInfinity))
            .otherwise(lit(Double.NaN)))
        .otherwise(cur / prev - 1.0d)
      val pctExceeds = !isnan(pct) && (abs(pct) > crit.threshold)
      // the same NaN mask applies to the absolute branches: a NaN diff
      // (NaN neighbor value) compares greater than any threshold in
      // Spark's ordering, where pandas' NaN comparison is false
      val diffOk = !isnan(diff)
      val cond = (crit.scale, crit.direction) match {
        case ("percentage", "increasing") => diffOk && (diff > 0) && pctExceeds
        case ("percentage", "decreasing") => diffOk && (diff < 0) && pctExceeds
        case ("percentage", _) => pctExceeds
        case ("absolute", "increasing") => diffOk && (diff > crit.threshold)
        case ("absolute", "decreasing") => diffOk && (diff < 0) && (abs(diff) > crit.threshold)
        case ("absolute", _) => diffOk && (abs(diff) > crit.threshold)
      }
      acc.withColumn(s"${c}_jump_flag", when(cond, 1).otherwise(0))
    }
    flagged.drop(cols.map(_ + "__prev"): _*)
  }

  /** Per-key sessionization: split each key's event stream into sessions
    * separated by inactivity gaps > `gapSeconds`. Appends `session_id`
    * (0-based per key, in `tsCol` order). Classic clickstream/telemetry
    * prep the reference has no equivalent for (public semantics: the
    * inactivity-gap session window, as in Spark's own `session_window`).
    *
    * Scale shape: ONE shuffle on the key; both the consecutive-event lag
    * and the running break count ride the SAME keyed window spec, so the
    * plan is Exchange(key) → Sort(key, ts) → two chained Window operators,
    * no join. Keyed windows parallelize across keys (the skew caveat is a
    * single hot key — a user with billions of events — which AQE cannot
    * split inside a window; that key is a data bug upstream, not a plan
    * problem). Timestamp arithmetic is exact integer micros.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"sessionize: gapSeconds must be > 0, got $gapSeconds")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(s"`$keyCol`")).orderBy(col(s"`$tsCol`"))
    val micros = unix_micros(col(s"`$tsCol`"))
    val break = when(
      micros - lag(micros, 1).over(w) > gapSeconds * 1000000L, 1L)
      .otherwise(lit(0L)) // first row per key: lag null -> comparison null -> 0
    df.withColumn("session_id",
      sum(break).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-key rolling time-window aggregates (pandas `rolling("7D")` /
    * SQL RANGE BETWEEN): for each event, aggregate the key's events in
    * `(ts − windowSeconds, ts]`... inclusive of the current row, trailing.
    * `aggs` maps output column → aggregating Column over the value
    * (e.g. "roll_sum" -> sum(col("v"))).
    *
    * Scale shape: ONE shuffle on the key; the RANGE frame over integer
    * micros is evaluated by Spark's sliding window frame (two pointers
    * over the sorted key partition, O(n) amortized per key) — no
    * self-join, no explode of the window. Same keyed-window skew caveat
    * as [[sessionize]].
    */
  def rollingAgg(df: DataFrame, keyCol: String, tsCol: String,
      windowSeconds: Long, aggs: Map[String, Column]): DataFrame = {
    require(windowSeconds > 0, "rolling_agg: windowSeconds must be > 0")
    require(aggs.nonEmpty, "rolling_agg: no aggregates given")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(s"`$keyCol`"))
      .orderBy(unix_micros(col(s"`$tsCol`")))
      .rangeBetween(-(windowSeconds * 1000000L - 1), 0)
    aggs.toSeq.sortBy(_._1).foldLeft(df) { case (acc, (name, agg)) =>
      acc.withColumn(name, agg.over(w))
    }
  }

  /** Skew-safe exact twin of [[rollingAgg]] for hot keys: the keyed-window
    * form serializes each key on one task (AQE splits skewed joins, never
    * window partitions — SkewProbe measured ~15× task skew at a 20%-hot
    * key), and a banded self-join is worse still (it materializes
    * Σ|window| rows — 334M at the sf1 probe — where the incremental frame
    * touches each row once). This variant decomposes the trailing window
    * `(t − W, t]` over time bands of width W: with b = floor(t/W), the
    * window is exactly (band-b prefix up to t) + (band-(b−1) suffix after
    * t − W). Both parts come from running aggregates over `(key, band)`
    * partitions — a hot key spreads across its bands, so per-task work is
    * bounded by band population, never by key population:
    *
    *   1. every event contributes a REAL row in its own band, and a
    *      PHANTOM row at time t − W in the previous band;
    *   2. one RANGE-inclusive running pass per (key, band) gives the real
    *      row its within-band prefix, and the phantom its `≤ t − W`
    *      prefix (suffix = band total − prefix for sums; an exclusive
    *      reverse running pass gives min/max suffixes directly);
    *   3. a final groupBy on the event id combines the two contributions.
    *
    * Supported aggregates: sum / count / min / max over a numeric column
    * (avg = sum ÷ count) — the decomposition needs per-part combinability.
    * Returns `(idCol, keyCol, outputs…)`; join back on `idCol` for the
    * full row. O(n log n) total, two shuffles on (key, band) + one on id.
    */
  def rollingAggBanded(df: DataFrame, idCol: String, keyCol: String,
      tsCol: String, windowSeconds: Long,
      specs: Map[String, (String, String)]): DataFrame = {
    require(windowSeconds > 0, "rolling_agg_banded: windowSeconds must be > 0")
    require(specs.nonEmpty, "rolling_agg_banded: no aggregates given")
    val bad = specs.values.map(_._2).filterNot(
      Set("sum", "count", "min", "max")).toSeq
    require(bad.isEmpty, s"rolling_agg_banded: unsupported agg(s) $bad " +
      "(sum/count/min/max; avg = sum/count)")
    // phantom rows null value columns BY NAME — aggregating the id/key/ts
    // column itself would null the grouping key on phantoms and split the
    // out-of-band contribution into a spurious null-keyed row
    specs.values.map(_._1).find(Set(idCol, keyCol, tsCol)).foreach { c =>
      throw new IllegalArgumentException(
        s"rolling_agg_banded: cannot aggregate structural column '$c' " +
          "(id/key/ts) — alias it to a separate column first")
    }
    import org.apache.spark.sql.expressions.Window
    val L = windowSeconds * 1000000L
    val sorted = specs.toSeq.sortBy(_._1)
    val valueCols = sorted.map(_._2._1).distinct
    val base = df.select(
      (Seq(col(s"`$idCol`"), col(s"`$keyCol`"), col(s"`$tsCol`")) ++
        valueCols.map(c => col(s"`$c`"))): _*)
      .withColumn("__u", unix_micros(col(s"`$tsCol`")))
      .withColumn("__b", floor(col("__u") / L))
      .drop(tsCol)
    val real = base.withColumn("__ph", lit(0))
    val phantom = base
      .withColumn("__b", col("__b") - 1)
      .withColumn("__u", col("__u") - L)
      .withColumn("__ph", lit(1))
      // phantom rows carry no values — they only mark the t − W boundary
      .select(real.columns.map {
        case c if valueCols.contains(c) => lit(null).cast(base.schema(c).dataType).as(c)
        case c => col(s"`$c`")
      }: _*)
    val un = real.unionByName(phantom)
    val part = Window.partitionBy(col("__k_"), col("__b"))
    // inclusive forward prefix: RANGE to current value includes all ties at
    // __u, so a phantom at t − W counts every event with u ≤ t − W (those
    // are exactly the ones OUTSIDE the strict u > t − W window)
    val fwd = part.orderBy(col("__u"))
      .rangeBetween(Window.unboundedPreceding, 0)
    // exclusive reverse pass for min/max suffixes: on negated micros,
    // RANGE to -1 means u ≥ phantom's u + 1, i.e. strictly inside the window
    val rev = part.orderBy(col("__negu"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val keyed = un
      .withColumnRenamed(keyCol, "__k_")
      .withColumn("__negu", -col("__u"))
    val contrib = sorted.foldLeft(keyed) { case (acc, (out, (vc, fn))) =>
      val v = when(col("__ph") === 0, col(s"`$vc`"))
      val one = when(col("__ph") === 0, lit(1L))
      fn match {
        case "sum" | "count" =>
          val x = if (fn == "count") one else v
          val prefix = sum(x).over(fwd)
          val total = sum(x).over(part)
          // an empty ≤ t−W prefix is null, but the suffix is then the whole
          // band: total − coalesce(prefix, 0), never total − null
          acc.withColumn(s"__c_$out",
            when(col("__ph") === 0, prefix)
              .otherwise(total - coalesce(prefix, lit(0))))
        case "min" =>
          acc.withColumn(s"__c_$out",
            when(col("__ph") === 0, min(v).over(fwd))
              .otherwise(min(v).over(rev)))
        case "max" =>
          acc.withColumn(s"__c_$out",
            when(col("__ph") === 0, max(v).over(fwd))
              .otherwise(max(v).over(rev)))
      }
    }
    contrib.groupBy(col(s"`$idCol`"), col("__k_").as(keyCol))
      .agg(
        {
          val (out, (_, fn)) = sorted.head
          combine(fn, s"__c_$out").as(out)
        },
        sorted.tail.map { case (out, (_, fn)) =>
          combine(fn, s"__c_$out").as(out)
        }: _*)
  }

  private def combine(fn: String, c: String): Column = fn match {
    case "min" => min(col(s"`$c`"))
    case "max" => max(col(s"`$c`"))
    case _ => sum(col(s"`$c`")) // sum/count: parts add; null part = empty band
  }

  /** Per-session aggregate over [[sessionize]] output: one row per
    * (key, session) with start/end, event count, and duration seconds —
    * the table a funnel/engagement query actually consumes. One extra
    * combinable aggregation on (key, session_id), reusing the
    * sessionize exchange when planned together.
    */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long): DataFrame =
    sessionize(df, keyCol, tsCol, gapSeconds)
      .groupBy(col(s"`$keyCol`"), col("session_id"))
      .agg(
        min(col(s"`$tsCol`")).as("session_start"),
        max(col(s"`$tsCol`")).as("session_end"),
        count(lit(1)).as("n_events"),
        ((unix_micros(max(col(s"`$tsCol`"))) -
          unix_micros(min(col(s"`$tsCol`")))) / 1e6d).as("duration_sec"))
}
