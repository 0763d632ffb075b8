package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Grouped aggregation / window-style verbs (SURVEY §2.5). */
object GroupedOps {

  /** Group-transform broadcast back to every row — exact 1:1 with a window
    * aggregate (reference: janitor/functions/groupby_agg.py:19,101-107).
    * Map-side partial aggregation + shuffle on `by` only; scales.
    *
    * `dropna` mirrors pandas `groupby(dropna=)` (groupby_agg.py:25,65-97):
    * true (the pandas default) excludes null-keyed rows from grouping — their
    * transform result is null; false treats nulls as an ordinary group,
    * which is what a Spark window does natively.
    */
  def groupbyAgg(df: DataFrame, by: Seq[String], aggColumn: String, agg: String,
      newColumnName: String, dropna: Boolean = true): DataFrame = {
    val w = Window.partitionBy(by.map(n => col(s"`$n`")): _*)
    val c = col(s"`$aggColumn`")
    // nunique: `size` is a scalar wrapper AROUND the windowed collect_set —
    // `size(collect_set(c)).over(w)` is not a window function and fails
    // analysis (caught by the skew-safe equivalence spec; no earlier gate
    // query exercised nunique through the window form)
    val result = agg match {
      case "nunique" => size(collect_set(c).over(w))
      case "sum" => sum(c).over(w)
      case "mean" | "average" | "avg" => avg(c).over(w)
      case "min" => min(c).over(w)
      case "max" => max(c).over(w)
      case "count" => count(c).over(w)
      case "size" => count(lit(1)).over(w)
      case "first" => first(c).over(w)
      case "last" => last(c).over(w)
      case "std" => stddev(c).over(w)
      case "var" => variance(c).over(w)
      case "median" => expr(s"percentile(`$aggColumn`, 0.5)").over(w)
      case other => throw new IllegalArgumentException(s"groupby_agg: bad agg $other")
    }
    if (dropna && by.nonEmpty) {
      val anyKeyNull = by.map(n => col(s"`$n`").isNull).reduce(_ || _)
      df.withColumn(newColumnName, when(anyKeyNull, lit(null)).otherwise(result))
    } else df.withColumn(newColumnName, result)
  }

  /** Skew-immune groupby_agg — identical semantics to [[groupbyAgg]],
    * different physical shape: the window form shuffles EVERY fact row on
    * `by`, so one hot key (10 % of a 100 TB table) lands on one task. This
    * form aggregates first (map-side partial combine absorbs the hot key
    * before any shuffle — the agg table is |distinct keys| rows), then
    * joins the result back; AQE broadcasts the agg side when it is small,
    * in which case the fact rows NEVER shuffle at all. Null-safe join
    * equality (`<=>`) keeps dropna=false's null-keys-form-a-group contract.
    * Prefer this form whenever keys are skewed or the distinct-key count is
    * broadcastable; the window form wins only when the agg table itself
    * would be huge AND keys are well distributed.
    */
  def groupbyAggSkewSafe(df: DataFrame, by: Seq[String], aggColumn: String,
      agg: String, newColumnName: String, dropna: Boolean = true): DataFrame = {
    require(by.nonEmpty, "groupby_agg: no group keys")
    // reuse the same agg-function table by delegating to groupbyAgg over a
    // one-row-per-group frame would change semantics; build the agg directly
    val c = col(s"`$aggColumn`")
    val a = agg match {
      case "sum" => sum(c)
      case "mean" | "average" | "avg" => avg(c)
      case "min" => min(c)
      case "max" => max(c)
      case "count" => count(c)
      case "size" => count(lit(1))
      case "nunique" => size(collect_set(c))
      case "first" => first(c)
      case "last" => last(c)
      case "std" => stddev(c)
      case "var" => variance(c)
      case "median" => expr(s"percentile(`$aggColumn`, 0.5)")
      case other => throw new IllegalArgumentException(s"groupby_agg: bad agg $other")
    }
    val aggDf = (if (dropna)
      df.filter(by.map(n => col(s"`$n`").isNotNull).reduce(_ && _)) else df)
      .groupBy(by.map(n => col(s"`$n`")): _*)
      .agg(a.as(newColumnName))
    val renamed = by.foldLeft(aggDf)((acc, n) => acc.withColumnRenamed(n, s"__k_$n"))
    val cond = by.map(n => col(s"`$n`") <=> col(s"`__k_$n`")).reduce(_ && _)
    df.join(renamed, cond, "left")
      .drop(by.map(n => s"__k_$n"): _*)
  }

  /** Top/bottom-k rows per group by a column (reference:
    * janitor/functions/groupby_topk.py:13,109-125). `tiebreak` columns make
    * the result deterministic in a distributed setting.
    */
  def groupbyTopk(df: DataFrame, by: Seq[String], column: String, k: Int,
      ascending: Boolean = false, tiebreak: Seq[String] = Nil): DataFrame = {
    // the reference's eager ValueErrors (groupby_topk.py;
    // test_wrong_groupby_column_name / test_wrong_sort_column_name /
    // test_negative_k)
    (by :+ column).foreach(c => require(df.columns.contains(c),
      s"$c not present in dataframe columns!"))
    require(k >= 1,
      s"Numbers of rows per group to be returned must be greater than 0, got $k")
    val sortCols = (col(s"`$column`") +: tiebreak.map(n => col(s"`$n`"))).map(c =>
      if (ascending) c.asc else c.desc)
    val w = Window.partitionBy(by.map(n => col(s"`$n`")): _*).orderBy(sortCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Skew-safe two-phase top-k: a single window per group sorts the whole
    * group on one task — a giant (skewed) group stalls the stage at scale.
    * Phase 1 computes top-k within (group, salt) — salts × k candidate rows
    * per group — then phase 2 ranks the survivors. Results are identical to
    * [[groupbyTopk]] when `tiebreak` makes the order total. The salt is a
    * deterministic hash of the tiebreak columns, so re-runs agree.
    */
  def groupbyTopkSalted(df: DataFrame, by: Seq[String], column: String, k: Int,
      ascending: Boolean = false, tiebreak: Seq[String] = Nil,
      salts: Int = 16): DataFrame = {
    require(tiebreak.nonEmpty, "groupbyTopkSalted: tiebreak columns required for determinism")
    val sortCols = (col(s"`$column`") +: tiebreak.map(n => col(s"`$n`"))).map(c =>
      if (ascending) c.asc else c.desc)
    val salted = df.withColumn("__salt",
      pmod(xxhash64(tiebreak.map(n => col(s"`$n`")): _*), lit(salts)))
    val w1 = Window.partitionBy((by.map(n => col(s"`$n`")) :+ col("__salt")): _*)
      .orderBy(sortCols: _*)
    val survivors = salted.withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= k).drop("__rn", "__salt")
    val w2 = Window.partitionBy(by.map(n => col(s"`$n`")): _*).orderBy(sortCols: _*)
    survivors.withColumn("__rn", row_number().over(w2))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Sort by `by`, keep first/last row per `subset` group
    * (reference: janitor/functions/take_first.py:10,42-46).
    */
  def takeFirst(df: DataFrame, subset: Seq[String], by: String,
      ascending: Boolean = true, tiebreak: Seq[String] = Nil): DataFrame = {
    val sortCols = (col(s"`$by`") +: tiebreak.map(n => col(s"`$n`"))).map(c =>
      if (ascending) c.asc else c.desc)
    val w = Window.partitionBy(subset.map(n => col(s"`$n`")): _*).orderBy(sortCols: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Running count of distinct values seen so far, in `orderCol` order
    * (reference: janitor/functions/count_cumulative_unique.py:13,107-112 —
    * groupby-cumcount==0 → cumsum). First-occurrence flag is a window keyed
    * on the value; the global running sum is a two-phase range-bucketed
    * prefix sum ([[ScaleWindows.runningSum]]) — no single-partition window,
    * so the batch form now scales like the streaming one.
    */
  def countCumulativeUnique(df: DataFrame, column: String, orderCol: String,
      newColumnName: String, caseSensitive: Boolean = true): DataFrame = {
    // case_sensitive=False needs a string-like column — the reference
    // raises TypeError instead of silently folding a coerced cast
    // (count_cumulative_unique.py; test_not_case_sensitive_but_nonstring)
    if (!caseSensitive)
      require(df.schema(column).dataType ==
          org.apache.spark.sql.types.StringType,
        s"case_sensitive=False can only be used with a string-like type; " +
          s"'$column' is ${df.schema(column).dataType}")
    val v = if (caseSensitive) col(s"`$column`") else lower(col(s"`$column`"))
    val wFirst = Window.partitionBy(v).orderBy(col(s"`$orderCol`"))
    val flagged = df.withColumn("__new",
      when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
    ScaleWindows.runningSum(flagged, orderCol, "__new", newColumnName)
      .drop("__new")
  }

  /** Random row permutation (reference: janitor/functions/shuffle.py:10). */
  def shuffle(df: DataFrame, seed: Long = 42L): DataFrame =
    df.orderBy(rand(seed))

  /** Natural (human/alphanumeric) sort by a column (reference:
    * janitor/functions/sort_naturally.py:11) via the NaturalSortKey expression.
    */
  def sortNaturally(df: DataFrame, column: String): DataFrame =
    df.orderBy(graft.functions.expressions.natural_sort_key(col(s"`$column`")))

  /** Sort by a user-given precedence list of values (reference:
    * janitor/functions/sort_column_value_order.py:10). Value→rank is a literal
    * CASE chain — no join, no shuffle beyond the sort.
    */
  def sortColumnValueOrder(df: DataFrame, column: String, order: Seq[String]): DataFrame = {
    // the reference raises for a missing/empty column name and an empty
    // order dict (sort_column_value_order.py ValueErrors)
    require(column.nonEmpty && df.columns.contains(column),
      s"sort_column_value_order: column '$column' not in dataframe")
    require(order.nonEmpty, "sort_column_value_order: column_value_order is empty")
    df.orderBy(valueRank(column, order))
  }

  def valueRank(column: String, order: Seq[String]): Column = {
    val c = col(s"`$column`")
    order.zipWithIndex.foldRight(lit(order.size): Column) { case ((v, i), acc) =>
      when(c === lit(v), lit(i)).otherwise(acc)
    }
  }

  /** Distinct values of a column (reference: janitor/functions/toset.py:18 —
    * Series → set). Distributed form: a distinct DataFrame.
    */
  def toSet(df: DataFrame, column: String): DataFrame =
    df.select(col(s"`$column`")).distinct()

  /** Deterministic per-group k-sample via the custom
    * [[graft.functions.aggregates.BottomKByHash]] TypedImperativeAggregate:
    * the k values per group with the smallest content hash — stable under
    * repartitioning, reruns, and engines, with REAL partial aggregation
    * (each map task ships a bounded k-heap per group, never the rows; the
    * window form row_number-over-hash ≤ k would sort every group's rows).
    * Output: one row per sampled value — (by..., pos, sampled) in hash
    * order.
    */
  def groupSample(df: DataFrame, by: Seq[String], valueCol: String,
      k: Int): DataFrame =
    df.groupBy(by.map(c => col(s"`$c`")): _*)
      .agg(graft.functions.aggregates.bottom_k_by_hash(col(s"`$valueCol`"), k)
        .as("__sample"))
      .select(by.map(c => col(s"`$c`")) :+
        posexplode(col("__sample")).as(Seq("pos", "sampled")): _*)
}
