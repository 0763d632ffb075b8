package graft.operators

import graft.ColumnSelector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Projection / selection verbs (SURVEY §2.2). All compile to one `select`. */
object SelectOps {

  /** (reference: janitor/functions/select.py:332-447) */
  def selectColumns(df: DataFrame, sels: Seq[ColumnSelector], invert: Boolean = false): DataFrame = {
    val names = ColumnSelector.resolve(df.schema, sels, invert)
    df.select(names.map(n => col(s"`$n`")): _*)
  }

  /** Matched labels themselves, not a projection (reference:
    * janitor/functions/select.py:450-474 get_index_labels with
    * axis="columns"; the row-index axis has no Spark analogue — the index
    * is an explicit ordering column, SURVEY §1.1). Driver-side metadata
    * (schema only), no job.
    */
  def getIndexLabels(df: DataFrame, sels: Seq[ColumnSelector]): Seq[String] =
    ColumnSelector.resolve(df.schema, sels)

  /** Column selection on grouped data (reference:
    * janitor/functions/select.py:477-497 get_columns on a GroupBy object).
    * Spark's RelationalGroupedDataset can't be projected after the fact, so
    * the faithful mapping selects (keys ∪ matched columns) BEFORE grouping —
    * same downstream aggregations, and the narrower projection prunes the
    * scan, which is strictly better at scale.
    */
  def getColumns(df: DataFrame, by: Seq[String],
      sels: Seq[ColumnSelector]): org.apache.spark.sql.RelationalGroupedDataset = {
    val names = ColumnSelector.resolve(df.schema, sels)
    val keep = (by ++ names.filterNot(by.contains(_))).map(n => col(s"`$n`"))
    df.select(keep: _*).groupBy(by.map(n => col(s"`$n`")): _*)
  }

  /** (reference: janitor/functions/remove_columns.py:19) */
  def removeColumns(df: DataFrame, names: Seq[String]): DataFrame = {
    names.foreach(n => require(df.columns.contains(n), s"Column '$n' not found"))
    df.drop(names: _*)
  }

  /** (reference: janitor/functions/reorder_columns.py:12) — given columns
    * first, remaining in original order.
    */
  def reorderColumns(df: DataFrame, first: Seq[String]): DataFrame = {
    first.foreach(n => require(df.columns.contains(n), s"Column '$n' not found"))
    val rest = df.columns.filterNot(first.contains(_))
    df.select((first ++ rest).map(n => col(s"`$n`")): _*)
  }

  /** Column-axis move (reference: janitor/functions/move.py:13,90-133). */
  def moveColumn(df: DataFrame, source: String, target: String, position: String = "before"): DataFrame = {
    val cols = df.columns.toBuffer
    require(cols.contains(source) && cols.contains(target), "move: unknown column")
    cols -= source
    val ti = cols.indexOf(target)
    val at = if (position == "after") ti + 1 else ti
    cols.insert(at, source)
    df.select(cols.map(n => col(s"`$n`")).toIndexedSeq: _*)
  }

  /** (reference: janitor/functions/drop_constant_columns.py:8). One aggregate
    * pass (min/max per column — cheaper than countDistinct at scale), then a
    * projection dropping single-valued columns.
    */
  def dropConstantColumns(df: DataFrame): DataFrame = {
    val aggs = df.columns.flatMap(c => Seq(
      min(col(s"`$c`")).cast("string").as(s"__min_$c"),
      max(col(s"`$c`")).cast("string").as(s"__max_$c"),
      count(col(s"`$c`")).as(s"__cnt_$c"),
      count(lit(1)).as(s"__n_$c")))
    val row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).collect()(0)
    val keep = df.columns.filter { c =>
      val mn = row.getAs[String](s"__min_$c")
      val mx = row.getAs[String](s"__max_$c")
      val cnt = row.getAs[Long](s"__cnt_$c")
      val n = row.getAs[Long](s"__n_$c")
      // constant iff: no nulls and min==max, or all nulls
      !((cnt == n && mn != null && mn == mx) || cnt == 0)
    }
    df.select(keep.map(n => col(s"`$n`")).toIndexedSeq: _*)
  }

  /** Among identically-named columns keep the nth occurrence
    * (reference: janitor/functions/drop_duplicate_columns.py:10).
    */
  def dropDuplicateColumns(df: DataFrame, name: String, nth: Int = 0): DataFrame = {
    val idxs = df.columns.zipWithIndex.filter(_._1 == name).map(_._2)
    require(idxs.nonEmpty, s"Column '$name' not found")
    val dropIdx = idxs.patch(nth, Nil, 1).toSet // keep nth, drop the rest
    val keepCols = df.schema.fields.zipWithIndex.collect {
      case (f, i) if !dropIdx.contains(i) => (f, i)
    }
    // Spark can't address dup-named columns by name; rebuild via a positional
    // rename to unique temp aliases, then project.
    val tmp = df.toDF(df.columns.zipWithIndex.map { case (c, i) => s"__c$i" }.toIndexedSeq: _*)
    tmp.select(keepCols.map { case (f, i) => col(s"__c$i").as(f.name) }.toIndexedSeq: _*)
  }
}
