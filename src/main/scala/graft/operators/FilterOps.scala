package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Filters / predicates / dedup (SURVEY §2.3). Pure `filter` plans — these
  * push down to the parquet scan.
  */
object FilterOps {

  /** (reference: janitor/functions/filter.py:21-104) */
  def filterString(df: DataFrame, column: String, searchString: String,
      regex: Boolean = true, caseSensitive: Boolean = true,
      complement: Boolean = false, naDefault: Boolean = false): DataFrame = {
    val c = col(s"`$column`")
    val base: Column =
      if (regex) {
        val pat = if (caseSensitive) searchString else "(?i)" + searchString
        c.rlike(pat)
      } else {
        if (caseSensitive) c.contains(searchString)
        else lower(c).contains(searchString.toLowerCase)
      }
    val withNa = coalesce(base, lit(naDefault))
    df.filter(if (complement) !withNa else withNa)
  }

  /** (reference: janitor/functions/filter.py:114-181) — Spark SQL *is* the
    * query engine; `criteria` is a SQL boolean expression.
    */
  def filterOn(df: DataFrame, criteria: String, complement: Boolean = false): DataFrame =
    df.filter(if (complement) !expr(criteria) else expr(criteria))

  /** (reference: janitor/functions/filter.py:186-293). `format` parses ONLY
    * the start/end bound strings (filter.py:271,275 feeds it to
    * pd.to_datetime(start_date, format=format) — "This only affects the
    * format of the start_date and end_date parameters", filter.py:234-238);
    * the COLUMN parse is governed separately by `columnFormats`, the
    * column_date_options analog (filter.py:264-266): candidate Java
    * datetime patterns tried in order, first successful parse wins
    * (`try_to_timestamp` coalesce — pandas' dayfirst=True hint is
    * Seq("dd/MM/yy", "MM/dd/yy")). A string column with no `columnFormats`
    * parses as ISO; Spark has no dateutil-style format inference, so
    * non-ISO columns must name their pattern(s).
    */
  def filterDate(df: DataFrame, column: String,
      startDate: Option[String] = None, endDate: Option[String] = None,
      years: Seq[Int] = Nil, months: Seq[Int] = Nil, days: Seq[Int] = Nil,
      format: Option[String] = None, columnFormats: Seq[String] = Nil): DataFrame = {
    val ts: Column = df.schema(column).dataType match {
      case org.apache.spark.sql.types.TimestampType => col(s"`$column`")
      case org.apache.spark.sql.types.DateType => col(s"`$column`").cast("timestamp")
      case _ if columnFormats.nonEmpty =>
        coalesce(columnFormats.map(f =>
          try_to_timestamp(col(s"`$column`"), lit(f))): _*)
      case _ => to_timestamp(col(s"`$column`"))
    }
    def parseBound(s: String): Column =
      format.map(f => to_timestamp(lit(s), f)).getOrElse(to_timestamp(lit(s)))
    var conds = List.empty[Column]
    startDate.foreach(s => conds ::= (ts >= parseBound(s)))
    endDate.foreach(e => conds ::= (ts <= parseBound(e)))
    if (years.nonEmpty) conds ::= year(ts).isin(years.map(Integer.valueOf): _*)
    if (months.nonEmpty) conds ::= month(ts).isin(months.map(Integer.valueOf): _*)
    if (days.nonEmpty) conds ::= dayofmonth(ts).isin(days.map(Integer.valueOf): _*)
    // conjunction, as the reference reduces with AND (filter.py:260-262)
    conds.reduceOption(_ && _).map(df.filter).getOrElse(df)
  }

  /** (reference: janitor/functions/filter.py:298-359) */
  def filterColumnIsin(df: DataFrame, column: String, values: Seq[Any],
      complement: Boolean = false): DataFrame = {
    val pred = col(s"`$column`").isin(values: _*)
    df.filter(if (complement) !coalesce(pred, lit(false)) else pred)
  }

  /** Keep rows where the column IS null (reference: janitor/functions/dropnotnull.py:13). */
  def dropNotNull(df: DataFrame, column: String): DataFrame =
    df.filter(col(s"`$column`").isNull)

  /** Drop all-null rows and all-null columns
    * (reference: janitor/functions/remove_empty.py:8). Column detection is one
    * aggregate pass.
    */
  def removeEmpty(df: DataFrame): DataFrame = {
    val noNullRows = df.na.drop("all")
    val counts = df.agg(count(lit(1)).as("__n"),
      df.columns.map(c => count(col(s"`$c`")).as(s"__c_$c")).toIndexedSeq: _*).collect()(0)
    val keep = df.columns.filter(c => counts.getAs[Long](s"__c_$c") > 0L)
    noNullRows.select(keep.map(n => col(s"`$n`")).toIndexedSeq: _*)
  }

  /** All rows duplicated on `subset` — pandas `keep=False` semantics
    * (reference: janitor/functions/get_dupes.py:13). Window count, no self-join.
    */
  def getDupes(df: DataFrame, subset: Seq[String]): DataFrame = {
    val cols = if (subset.nonEmpty) subset else df.columns.toSeq
    val w = Window.partitionBy(cols.map(n => col(s"`$n`")): _*)
    df.withColumn("__cnt", count(lit(1)).over(w))
      .filter(col("__cnt") > 1)
      .drop("__cnt")
  }

  /** Conditional update (reference: janitor/functions/update_where.py:14;
    * the reference's own Spark backend uses CASE WHEN selectExpr —
    * janitor/spark/functions.py:92-174).
    */
  def updateWhere(df: DataFrame, condition: String, targetColumn: String, targetVal: Any): DataFrame = {
    val value = lit(targetVal)
    if (df.columns.contains(targetColumn))
      df.withColumn(targetColumn,
        when(expr(condition), value).otherwise(col(s"`$targetColumn`")))
    else
      df.withColumn(targetColumn, when(expr(condition), value))
  }
}
