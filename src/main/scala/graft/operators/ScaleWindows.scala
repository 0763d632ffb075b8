package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Scale-safe replacements for `Window.orderBy(...)` with no partition key —
  * the pattern that funnels every row through a single task.
  *
  * The trick: carve the global order into range buckets using approxQuantile
  * bounds baked in as literals (deterministic, narrow bucket assignment; all
  * ties land in one bucket), run the running aggregate per bucket, then add
  * each bucket's cumulative offset back via a tiny join. The bucketing only
  * affects parallelism, never values: a prefix sum over `order <= x` is
  * bucket-invariant.
  */
object ScaleWindows {

  /** Double view of an orderable column for quantile bucketing; None when the
    * type has no meaningful numeric order (caller falls back to the
    * single-partition window).
    */
  def orderAsDouble(df: DataFrame, column: String): Option[Column] = {
    val c = col(s"`$column`")
    df.schema(column).dataType match {
      case _: NumericType => Some(c.cast("double"))
      case TimestampType | TimestampNTZType => Some(c.cast("double"))
      case DateType => Some(c.cast("timestamp").cast("double"))
      case _ => None
    }
  }

  /** Bucket id = number of quantile bounds strictly below the value; nulls
    * land in bucket 0 (they sort first, matching asc_nulls_first).
    */
  private def bucketOf(ord: Column, bounds: Array[Double]): Column =
    bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(ord > lit(b), 1).otherwise(0)
    }

  /** Adaptive cutover: below this plan-estimated size the bucketed machinery
    * (an approxQuantile scan + a bounded collect + a literal-CASE rebind —
    * three fixed jobs) costs more than the single-partition window it avoids.
    * A one-task window over ≲256 MB is cheap; the estimate comes free from
    * Catalyst (`optimizedPlan.stats.sizeInBytes` — file sizes for scans,
    * Long.MaxValue when unknown, which safely routes to the bucketed path).
    * Override with `graft.scaleWindows.smallBytes`.
    */
  private def isSmall(df: DataFrame): Boolean = {
    val threshold = BigInt(df.sparkSession.conf
      .get("graft.scaleWindows.smallBytes", (256L << 20).toString).toLong)
    try df.queryExecution.optimizedPlan.stats.sizeInBytes <= threshold
    catch { case _: Throwable => false }
  }

  /** Global running sum of `valueCol` in ascending `orderCol` order, without
    * a single-partition window: per-bucket prefix sums + cumulative bucket
    * offsets (the offsets table is ≤ nBuckets rows; AQE broadcasts the join).
    * Ties in `orderCol` accumulate in arbitrary order within their bucket —
    * the same contract as the global-window form it replaces. Falls back to
    * that form when the order column isn't numerically bucketable.
    */
  def runningSum(df: DataFrame, orderCol: String, valueCol: String,
      dest: String, nBuckets: Int = 0): DataFrame = {
    val n = if (nBuckets > 0) nBuckets
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    orderAsDouble(df, orderCol).filterNot(_ => isSmall(df)) match {
      case None =>
        val w = Window.orderBy(col(s"`$orderCol`"))
          .rowsBetween(Window.unboundedPreceding, 0)
        df.withColumn(dest, sum(col(s"`$valueCol`")).over(w))
      case Some(ord) =>
        val probes = (1 until n).map(_.toDouble / n).toArray
        val bounds = df.select(ord.as("__ord")).na.drop()
          .stat.approxQuantile("__ord", probes, 0.001)
          .distinct.sorted
        val b = df.withColumn("__bkt", bucketOf(ord, bounds))
        val wLocal = Window.partitionBy(col("__bkt"))
          .orderBy(col(s"`$orderCol`"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val local = b.withColumn("__loc", sum(col(s"`$valueCol`")).over(wLocal))
        // per-bucket totals: a bounded collect (≤ nBuckets rows — SURVEY
        // §7.7), folded into exclusive prefix offsets on the driver and baked
        // back in as a literal CASE — no global window, no extra join
        val totalsDf = b.groupBy(col("__bkt"))
          .agg(sum(col(s"`$valueCol`")).as("__tot"))
        val sumType = totalsDf.schema("__tot").dataType
        val totals = totalsDf.collect()
          .map(r => r.getInt(0) -> r.get(1)).sortBy(_._1)
        def plus(a: Any, x: Any): Any = (a, x) match {
          case (null, v) => v
          case (v, null) => v
          case (p: java.lang.Long, v: java.lang.Long) => java.lang.Long.valueOf(p + v)
          case (p: java.lang.Double, v: java.lang.Double) => java.lang.Double.valueOf(p + v)
          case (p: java.math.BigDecimal, v: java.math.BigDecimal) => p.add(v)
          case (p, v) => throw new IllegalStateException(
            s"runningSum: unsupported sum type ${p.getClass}/${v.getClass}")
        }
        var acc: Any = null
        val offs = totals.map { case (bkt, tot) =>
          val before = acc; acc = plus(acc, tot); bkt -> before
        }.collect { case (bkt, off) if off != null => bkt -> off }
        val offExpr = offs.foldLeft(lit(0).cast(sumType)) { case (e, (bkt, off)) =>
          when(col("__bkt") === bkt, lit(off)).otherwise(e)
        }
        local.withColumn(dest, col("__loc") + offExpr)
          .drop("__bkt", "__loc")
    }
  }

  /** Scale-safe lag(1) in global `orderCol` order for several columns at
    * once: per-bucket window lag, then each bucket's first row takes the
    * previous non-empty bucket's last value — computed with one bounded
    * max_by aggregate (≤ nBuckets rows), carried forward on the driver and
    * baked back in as literal CASEs. Adds `<col><suffix>` per input column.
    * Falls back to the single-partition window for non-bucketable orders.
    */
  def lag1(df: DataFrame, orderCol: String, cols: Seq[String],
      suffix: String = "__prev", nBuckets: Int = 0): DataFrame = {
    if (cols.isEmpty) return df
    val n = if (nBuckets > 0) nBuckets
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    orderAsDouble(df, orderCol).filterNot(_ => isSmall(df)) match {
      case None =>
        val w = Window.orderBy(col(s"`$orderCol`"))
        cols.foldLeft(df)((acc, c) =>
          acc.withColumn(c + suffix, lag(col(s"`$c`"), 1).over(w)))
      case Some(ord) =>
        val probes = (1 until n).map(_.toDouble / n).toArray
        val bounds = df.select(ord.as("__ord")).na.drop()
          .stat.approxQuantile("__ord", probes, 0.001)
          .distinct.sorted
        val b = df.withColumn("__bkt", bucketOf(ord, bounds))
        val w = Window.partitionBy(col("__bkt")).orderBy(col(s"`$orderCol`"))
        // last row per bucket (by order), one bounded collect
        val lastAggs = cols.map(c => max_by(col(s"`$c`"), col(s"`$orderCol`")).as(c))
        val lastRows = b.groupBy(col("__bkt"))
          .agg(lastAggs.head, lastAggs.tail: _*)
          .collect()
          .sortBy(_.getInt(0))
        // carry[bucket] = last values of the nearest non-empty bucket below
        val carries: Seq[(Int, Seq[Any])] = {
          var prev: Option[Seq[Any]] = None
          lastRows.toSeq.map { r =>
            val bkt = r.getInt(0)
            val entry = bkt -> prev.orNull
            prev = Some(cols.indices.map(i => r.get(i + 1)))
            entry
          }.collect { case (bkt, vals: Seq[Any] @unchecked) if vals != null => bkt -> vals }
        }
        val withRn = b.withColumn("__rn1", row_number().over(w))
        val out = cols.zipWithIndex.foldLeft(withRn) { case (acc, (c, i)) =>
          val dt = df.schema(c).dataType
          val carryExpr = carries.foldLeft(lit(null).cast(dt)) {
            case (e, (bkt, vals)) =>
              when(col("__bkt") === bkt, lit(vals(i)).cast(dt)).otherwise(e)
          }
          acc.withColumn(c + suffix,
            when(col("__rn1") === 1, carryExpr)
              .otherwise(lag(col(s"`$c`"), 1).over(w)))
        }
        out.drop("__bkt", "__rn1")
    }
  }

  /** Scale-safe global forward fill (ffill): per-bucket
    * `last(ignoreNulls)` window, then rows the bucket can't fill (a leading
    * all-null run) take the nearest earlier bucket's last non-null value —
    * computed with one bounded agg (`max_by(c, order-if-non-null)`,
    * ≤ nBuckets rows), chained on the driver, baked back in as literal
    * CASEs. Falls back to the single-partition window for non-bucketable
    * orders.
    */
  def fillDown(df: DataFrame, orderCol: String, cols: Seq[String],
      nBuckets: Int = 0): DataFrame =
    fillDirectional(df, orderCol, cols, nBuckets, up = false)

  /** Scale-safe global backward fill (bfill) — mirror of [[fillDown]]:
    * per-bucket `first(ignoreNulls)` looking forward, carry from the nearest
    * *later* bucket's first non-null value.
    */
  def fillUp(df: DataFrame, orderCol: String, cols: Seq[String],
      nBuckets: Int = 0): DataFrame =
    fillDirectional(df, orderCol, cols, nBuckets, up = true)

  /** Scale-safe global running `last(valueCol, ignoreNulls)` in
    * (`orderCol` asc|desc, `tieCol` asc) order — the kernel under a global
    * as-of join. Same bucket machinery as [[runningSum]], but the carried
    * boundary values may be STRUCTS, which cannot ride a literal CASE: the
    * ≤ nBuckets carry rows go back through a broadcast join on the bucket
    * id instead (equally bounded, and type-agnostic). Falls back to the
    * single-partition window for small or non-bucketable orders.
    */
  def runningLast(df: DataFrame, orderCol: String, tieCol: String,
      valueCol: String, dest: String, descending: Boolean = false,
      nBuckets: Int = 0): DataFrame = {
    val n = if (nBuckets > 0) nBuckets
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    def ordCols = Seq(
      if (descending) col(s"`$orderCol`").desc else col(s"`$orderCol`").asc,
      col(s"`$tieCol`").asc)
    orderAsDouble(df, orderCol).filterNot(_ => isSmall(df)) match {
      case None =>
        val w = Window.orderBy(ordCols: _*)
          .rowsBetween(Window.unboundedPreceding, 0)
        df.withColumn(dest, last(col(s"`$valueCol`"), ignoreNulls = true).over(w))
      case Some(ord) =>
        val probes = (1 until n).map(_.toDouble / n).toArray
        val bounds = df.select(ord.as("__ord")).na.drop()
          .stat.approxQuantile("__ord", probes, 0.001)
          .distinct.sorted
        val b = df.withColumn("__bkt", bucketOf(ord, bounds))
        val w = Window.partitionBy(col("__bkt")).orderBy(ordCols: _*)
          .rowsBetween(Window.unboundedPreceding, 0)
        val local = last(col(s"`$valueCol`"), ignoreNulls = true).over(w)
        // boundary value each bucket exports = its last non-null value in
        // traversal order (max_by asc / min_by desc over (ord, tie); rows
        // with a null value are skipped via the null ordering key). The tie
        // is ASC in BOTH traversals, so under descending the last-visited
        // row at the minimal ord is the tie-MAX — negate the tie key so
        // min_by lands on it rather than the tie-MIN.
        val tieKey = if (descending) -col(s"`$tieCol`").cast("double")
          else col(s"`$tieCol`").cast("double")
        val ordIfSet = when(col(s"`$valueCol`").isNotNull,
          struct(ord.as("o"), tieKey.as("t")))
        val edgeAgg = if (descending) min_by(col(s"`$valueCol`"), ordIfSet)
          else max_by(col(s"`$valueCol`"), ordIfSet)
        val edges = b.groupBy(col("__bkt")).agg(edgeAgg.as("__edge"))
        val edgeRows = edges.collect()
          .sortBy(r => if (descending) -r.getInt(0) else r.getInt(0))
        // carry[bucket] = nearest earlier (in traversal order) bucket's edge
        var prev: Any = null
        val carryRows = edgeRows.map { r =>
          val out = org.apache.spark.sql.Row(r.getInt(0), prev)
          if (!r.isNullAt(1)) prev = r.get(1)
          out
        }.filter(!_.isNullAt(1)).toSeq
        val valueType = df.schema(valueCol).dataType
        val spark = df.sparkSession
        val carrySchema = StructType(Seq(
          StructField("__bkt", IntegerType, nullable = false),
          StructField("__carry", valueType)))
        import scala.jdk.CollectionConverters._
        val carryDf = spark.createDataFrame(carryRows.asJava, carrySchema)
        b.join(broadcast(carryDf), Seq("__bkt"), "left")
          .withColumn(dest, coalesce(local, col("__carry")))
          .drop("__bkt", "__carry")
    }
  }

  /** Keyed, skew-safe running `last(valueCol, ignoreNulls)` — for when ONE
    * `by` key carries a disproportionate share of rows and the plain
    * `Window.partitionBy(by)` serializes it on a single task. Each key is
    * sub-bucketed on the order column (global quantile bounds: bucketing
    * only balances work, correctness comes from the carry chain), the
    * running last runs per (key, bucket), and each bucket's missing prefix
    * takes the nearest earlier bucket's boundary value WITHIN the key.
    * Unlike [[runningLast]]'s driver-side carry, the carry here is fully
    * distributed: one aggregation to a (keys × buckets)-row edges table,
    * then a per-key window over ≤ nBuckets rows each — no collect at any
    * key cardinality. Falls back to the plain keyed window for
    * non-bucketable order columns.
    */
  def runningLastKeyed(df: DataFrame, by: Seq[String], orderCol: String,
      tieCol: String, valueCol: String, dest: String,
      descending: Boolean = false, nBuckets: Int = 0): DataFrame = {
    require(by.nonEmpty, "runningLastKeyed: no by keys (use runningLast)")
    val n = if (nBuckets > 0) nBuckets
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val byCols = by.map(c => col(s"`$c`"))
    def ordCols = Seq(
      if (descending) col(s"`$orderCol`").desc else col(s"`$orderCol`").asc,
      col(s"`$tieCol`").asc)
    orderAsDouble(df, orderCol) match {
      case None =>
        val w = Window.partitionBy(byCols: _*).orderBy(ordCols: _*)
          .rowsBetween(Window.unboundedPreceding, 0)
        df.withColumn(dest, last(col(s"`$valueCol`"), ignoreNulls = true).over(w))
      case Some(ord) =>
        val probes = (1 until n).map(_.toDouble / n).toArray
        val bounds = df.select(ord.as("__ord")).na.drop()
          .stat.approxQuantile("__ord", probes, 0.001)
          .distinct.sorted
        val b = df.withColumn("__bkt", bucketOf(ord, bounds))
        val w = Window.partitionBy((byCols :+ col("__bkt")): _*)
          .orderBy(ordCols: _*).rowsBetween(Window.unboundedPreceding, 0)
        val local = last(col(s"`$valueCol`"), ignoreNulls = true).over(w)
        // same descending tie inversion as runningLast: traversal tie is
        // ASC, so the boundary row at the minimal ord is the tie-MAX
        val tieKey = if (descending) -col(s"`$tieCol`").cast("double")
          else col(s"`$tieCol`").cast("double")
        val ordIfSet = when(col(s"`$valueCol`").isNotNull,
          struct(ord.as("o"), tieKey.as("t")))
        val edgeAgg = if (descending) min_by(col(s"`$valueCol`"), ordIfSet)
          else max_by(col(s"`$valueCol`"), ordIfSet)
        val edges = b.groupBy((byCols :+ col("__bkt")): _*).agg(edgeAgg.as("__edge"))
        val carryW = Window.partitionBy(byCols: _*)
          .orderBy(if (descending) col("__bkt").desc else col("__bkt").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val carries = edges
          .withColumn("__carry", last(col("__edge"), ignoreNulls = true).over(carryW))
          .drop("__edge")
        // the carry join surfaces (by, __bkt) as leading columns — restore
        // the caller's column order (callers compare frames positionally)
        b.join(carries, by :+ "__bkt", "left")
          .withColumn(dest, coalesce(local, col("__carry")))
          .select(df.columns.map(c => col(s"`$c`")).toSeq :+ col(s"`$dest`"): _*)
    }
  }

  private def fillDirectional(df: DataFrame, orderCol: String,
      cols: Seq[String], nBuckets: Int, up: Boolean): DataFrame = {
    if (cols.isEmpty) return df
    val n = if (nBuckets > 0) nBuckets
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // A backward fill is a RUNNING forward fill over the reversed order:
    // `last(ignoreNulls) over (desc, unboundedPreceding..0)`. Never frame it
    // as `first over (0..unboundedFollowing)` — Spark evaluates an
    // unbounded-FOLLOWING frame by rescanning to the partition end for
    // every row, O(n²) per partition (measured: 158 s for a 100k-row
    // single-partition bfill; the running form is ~1 s).
    orderAsDouble(df, orderCol).filterNot(_ => isSmall(df)) match {
      case None =>
        val base =
          if (up) Window.orderBy(col(s"`$orderCol`").desc)
          else Window.orderBy(col(s"`$orderCol`"))
        val w = base.rowsBetween(Window.unboundedPreceding, 0)
        cols.foldLeft(df) { (acc, c) =>
          acc.withColumn(c, last(col(s"`$c`"), ignoreNulls = true).over(w))
        }
      case Some(ord) =>
        val probes = (1 until n).map(_.toDouble / n).toArray
        val bounds = df.select(ord.as("__ord")).na.drop()
          .stat.approxQuantile("__ord", probes, 0.001)
          .distinct.sorted
        val b = df.withColumn("__bkt", bucketOf(ord, bounds))
        val base = Window.partitionBy(col("__bkt")).orderBy(
          if (up) col(s"`$orderCol`").desc else col(s"`$orderCol`").asc)
        val w = base.rowsBetween(Window.unboundedPreceding, 0)
        // per bucket, the boundary non-null value each neighbor would carry:
        // last non-null (down) / first non-null (up), one bounded collect
        val edgeAggs = cols.map { c =>
          val ordIfSet = when(col(s"`$c`").isNotNull, ord)
          (if (up) min_by(col(s"`$c`"), ordIfSet)
           else max_by(col(s"`$c`"), ordIfSet)).as(c)
        }
        val edgeRows = b.groupBy(col("__bkt"))
          .agg(edgeAggs.head, edgeAggs.tail: _*)
          .collect()
          .sortBy(r => if (up) -r.getInt(0) else r.getInt(0))
        // carry[bucket][col] = boundary value of the nearest bucket in the
        // fill direction that has one (chains across all-null buckets)
        val carries: Seq[(Int, Array[Any])] = {
          val prev = Array.fill[Any](cols.length)(null)
          edgeRows.toSeq.map { r =>
            val bkt = r.getInt(0)
            val entry = bkt -> prev.clone()
            cols.indices.foreach { i =>
              val v = r.get(i + 1)
              if (v != null) prev(i) = v
            }
            entry
          }
        }
        val out = cols.zipWithIndex.foldLeft(b) { case (acc, (c, i)) =>
          val dt = df.schema(c).dataType
          val carryExpr = carries.foldLeft(lit(null).cast(dt)) {
            case (e, (bkt, vals)) =>
              if (vals(i) == null) e
              else when(col("__bkt") === bkt, lit(vals(i)).cast(dt)).otherwise(e)
          }
          // `w` already reverses the order for up-fills, so the running
          // last(ignoreNulls) IS the backward fill — O(n) either direction
          val local = last(col(s"`$c`"), ignoreNulls = true).over(w)
          acc.withColumn(c, coalesce(local, carryExpr))
        }
        out.drop("__bkt")
    }
  }
}
