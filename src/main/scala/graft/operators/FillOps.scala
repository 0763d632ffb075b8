package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Missing-data verbs (SURVEY §2.7). */
object FillOps {

  /** Directional fill over an explicit ordering column (the Spark replacement
    * for pandas' implicit row order — SURVEY §1.1).
    * direction ∈ down(ffill) | up(bfill) | updown | downup
    * (reference: janitor/functions/fill.py:25-107)
    *
    * Scale note: with `partitionBy` keys the fill runs per-group and scales
    * directly. The global form routes through [[graft.operators.ScaleWindows]]
    * — range-bucketed carry with bounded per-bucket boundary collects — so it
    * never funnels the table through a single-partition window either (only
    * a non-bucketable order type falls back to one, inside ScaleWindows).
    */
  def fillDirection(df: DataFrame, columns: Map[String, String], orderCol: String,
      partitionBy: Seq[String] = Nil): DataFrame = {
    val badDir = columns.values.find(d => !Set("down", "up", "updown", "downup")(d))
    badDir.foreach(d => throw new IllegalArgumentException(s"fill_direction: bad direction $d"))
    // unknown columns raise eagerly like the reference's check_column
    // (fill.py; test_wrong_column_name), not at plan-analysis time
    val unknown = columns.keys.filterNot(df.columns.contains)
    require(unknown.isEmpty,
      s"fill_direction: columns not in the dataframe: ${unknown.mkString(", ")}")
    if (partitionBy.isEmpty) {
      // updown = bfill then ffill the trailing remainder; downup = mirror —
      // same values as coalesce(first-up, last-down) over a global window
      val downCols = columns.collect { case (c, "down") => c }.toSeq
      val upCols = columns.collect { case (c, "up") => c }.toSeq
      val updownCols = columns.collect { case (c, "updown") => c }.toSeq
      val downupCols = columns.collect { case (c, "downup") => c }.toSeq
      var out = df
      out = ScaleWindows.fillDown(out, orderCol, downCols ++ downupCols)
      out = ScaleWindows.fillUp(out, orderCol, upCols ++ updownCols ++ downupCols)
      out = ScaleWindows.fillDown(out, orderCol, updownCols)
      out
    } else {
      // bfill as a RUNNING frame over the reversed order — an
      // unbounded-FOLLOWING frame rescans to the partition end per row,
      // O(n²) per group (see ScaleWindows.fillDirectional)
      val keys = partitionBy.map(n => col(s"`$n`"))
      val down = Window.partitionBy(keys: _*).orderBy(col(s"`$orderCol`").asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val up = Window.partitionBy(keys: _*).orderBy(col(s"`$orderCol`").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      columns.foldLeft(df) { case (acc, (c, dir)) =>
        val cc = col(s"`$c`")
        val filled = dir match {
          case "down" => last(cc, ignoreNulls = true).over(down)
          case "up"   => last(cc, ignoreNulls = true).over(up)
          case "updown" => coalesce(last(cc, ignoreNulls = true).over(up),
            last(cc, ignoreNulls = true).over(down))
          case "downup" => coalesce(last(cc, ignoreNulls = true).over(down),
            last(cc, ignoreNulls = true).over(up))
        }
        acc.withColumn(c, filled)
      }
    }
  }

  /** (reference: janitor/functions/fill.py:137-206) */
  def fillEmpty(df: DataFrame, values: Map[String, Any]): DataFrame =
    values.foldLeft(df) { case (acc, (c, v)) =>
      acc.withColumn(c, coalesce(col(s"`$c`"), lit(v)))
    }

  /** Fill with a statistic ∈ mean|average|median|mode|min|max|sum or a scalar
    * (reference: janitor/functions/impute.py:17). The statistic is one tiny
    * aggregate (driver-collected scalar) — no global window, scales freely.
    */
  def impute(df: DataFrame, column: String, statistic: Option[String] = None,
      value: Option[Any] = None): DataFrame = {
    val c = col(s"`$column`")
    val fillValue: Column = (statistic, value) match {
      case (None, Some(v)) => lit(v)
      case (Some(stat), None) =>
        val aggExpr = stat match {
          case "mean" | "average" => avg(c)
          case "median" => expr(s"percentile(`$column`, 0.5)")
          case "mode" => expr(s"mode(`$column`)")
          case "min" | "minimum" => min(c)
          case "max" | "maximum" => max(c)
          case "sum" => sum(c)
          case other => throw new IllegalArgumentException(s"impute: bad statistic $other")
        }
        lit(df.agg(aggExpr.as("v")).collect()(0).get(0))
      case _ => throw new IllegalArgumentException("impute: provide exactly one of statistic or value")
    }
    df.withColumn(column, coalesce(c, fillValue))
  }

  /** First non-null across columns into target (reference:
    * janitor/functions/coalesce.py:14-133). Without a target the outcome
    * lands in the FIRST source column and every other source column is
    * KEPT unchanged (coalesce.py:129-130 `df.iloc[:, indexers[0]] =
    * outcome` — the frame shape never shrinks; test_coalesce_without_target
    * asserts b and c survive). Empty `columns` is the identity
    * (test_empty_column_names); one column raises the reference's
    * minimum-of-2 ValueError (coalesce.py:105-108).
    */
  def coalesceColumns(df: DataFrame, columns: Seq[String], targetColumn: Option[String] = None,
      defaultValue: Option[Any] = None): DataFrame = {
    if (columns.isEmpty) return df
    require(columns.length >= 2,
      "The number of columns to coalesce should be a minimum of 2.")
    val exprs = columns.map(n => col(s"`$n`")) ++ defaultValue.map(lit).toSeq
    df.withColumn(targetColumn.getOrElse(columns.head), coalesce(exprs: _*))
  }

  /** 0/1 any-null flag column (reference: janitor/functions/flag_nulls.py:13).
    * Raises eagerly when the flag name already exists or a requested column
    * does not (flag_nulls.py ValueErrors; test_fail_column_name_in_columns /
    * test_fail_column_val_not_in_columns). Float NaN counts as missing like
    * pandas' isna — Spark separates NaN from null, pandas does not.
    */
  def flagNulls(df: DataFrame, columnName: String = "null_flag",
      columns: Seq[String] = Nil): DataFrame = {
    require(!df.columns.contains(columnName),
      s"flag_nulls: column_name '$columnName' is already in the dataframe")
    val missing = columns.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"flag_nulls: columns not in the dataframe: ${missing.mkString(", ")}")
    val cs = if (columns.nonEmpty) columns else df.columns.toSeq
    val anyNull = cs.map { n =>
      df.schema(n).dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType =>
          col(s"`$n`").isNull || isnan(col(s"`$n`"))
        case _ => col(s"`$n`").isNull
      }
    }.reduce(_ || _)
    df.withColumn(columnName, when(anyNull, 1).otherwise(0))
  }
}
