package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row/value transforms & chaining combinators (SURVEY §2.9). */
object TransformOps {

  /** SQL CASE with first-match-wins (reference:
    * janitor/functions/case_when.py:23,50-58). Conditions are SQL boolean
    * strings or Columns; 1:1 with chained `when`.
    */
  def caseWhen(df: DataFrame, targetColumn: String,
      condsAndValues: Seq[(Column, Column)], default: Column): DataFrame = {
    val chained = condsAndValues.foldLeft(Option.empty[Column]) {
      case (None, (c, v)) => Some(when(c, v))
      case (Some(acc), (c, v)) => Some(acc.when(c, v))
    }.map(_.otherwise(default)).getOrElse(default)
    df.withColumn(targetColumn, chained)
  }

  def caseWhenSql(df: DataFrame, targetColumn: String,
      condsAndValues: Seq[(String, Any)], default: Any): DataFrame =
    caseWhen(df, targetColumn,
      condsAndValues.map { case (c, v) => (expr(c), lit(v)) }, lit(default))

  /** Per-column value mapping, exact or regex (reference:
    * janitor/functions/find_replace.py:18).
    */
  def findReplace(df: DataFrame, column: String, mapping: Map[Any, Any],
      matchMode: String = "exact"): DataFrame = {
    // the reference's dict is always insertion-ordered and regex patterns
    // apply sequentially, so order is part of the contract — route through
    // the Seq form. Exact mode is order-insensitive (each cell matches at
    // most one needle), but regex patterns can cascade, so only Maps whose
    // iteration IS insertion order are accepted in regex mode: SeqMap
    // (ListMap/VectorMap), the Map1..Map4 literals `Map(...)` builds (their
    // fields iterate in construction order), or size <= 1. A HashMap at any
    // size iterates in hash order and is rejected rather than silently
    // reordered.
    def insertionOrdered(m: Map[Any, Any]): Boolean = m.size <= 1 ||
      m.isInstanceOf[scala.collection.immutable.SeqMap[_, _]] ||
      m.getClass.getName.startsWith("scala.collection.immutable.Map$Map")
    require(matchMode != "regex" || insertionOrdered(mapping),
      "find_replace: regex mapping order is contractual (find_replace.py:" +
        "174-177 applies patterns in dict insertion order) and this Map " +
        "implementation iterates in hash order — pass a ListMap or use " +
        "findReplaceOrdered(Seq)")
    findReplaceOrdered(df, column, mapping.toSeq, matchMode)
  }

  /** Order-explicit form of [[findReplace]]: regex patterns apply
    * sequentially in the given order against the current value, matching the
    * reference dict's insertion order (find_replace.py:174-177).
    */
  def findReplaceOrdered(df: DataFrame, column: String, mapping: Seq[(Any, Any)],
      matchMode: String = "exact"): DataFrame = {
    // a null/NaN needle raises like the reference (find_replace.py:146-154;
    // test_find_replace_null_raises_error) — equality would silently never
    // match it; fill_empty is the null-filling verb
    require(!mapping.map(_._1).exists(k => k == null ||
        (k.isInstanceOf[Double] && k.asInstanceOf[Double].isNaN) ||
        (k.isInstanceOf[Float] && k.asInstanceOf[Float].isNaN)),
      "find_replace: null/NaN cannot be a find value; use fill_empty instead")
    val c = col(s"`$column`")
    val replaced = matchMode match {
      case "exact" =>
        mapping.foldLeft(Option.empty[Column]) {
          case (None, (k, v)) => Some(when(c === lit(k), lit(v)))
          case (Some(acc), (k, v)) => Some(acc.when(c === lit(k), lit(v)))
        }.map(_.otherwise(c)).getOrElse(c)
      case "regex" =>
        // the reference's regex mode replaces the ENTIRE cell whenever the
        // pattern matches anywhere (find_replace.py:174-177:
        // str.contains(k) -> assign v), applied sequentially per pattern
        // against the current value — NOT a substring regexp_replace
        // (empirically verified: {'^cl': 'KL'} maps 'click' to 'KL').
        // Application order is the Seq order — contractual, not incidental.
        mapping.foldLeft(c) { case (acc, (k, v)) =>
          when(acc.rlike(k.toString), lit(v)).otherwise(acc)
        }
      case other => throw new IllegalArgumentException(s"find_replace: bad match $other")
    }
    df.withColumn(column, replaced)
  }

  /** Apply a Column→Column function (reference:
    * janitor/functions/transform_columns.py:22,127). Stays codegen'd when `f`
    * composes built-ins.
    */
  def transformColumn(df: DataFrame, column: String, f: Column => Column,
      destColumn: Option[String] = None): DataFrame =
    df.withColumn(destColumn.getOrElse(column), f(col(s"`$column`")))

  /** `newColumnNames` maps source -> target like the reference's
    * new_column_names dict (keys outside `columns` pass through silently —
    * reference bug #1063 behavior); mutually exclusive with `suffix`,
    * raising the reference's ValueError otherwise.
    */
  def transformColumns(df: DataFrame, columns: Seq[String], f: Column => Column,
      suffix: Option[String] = None,
      newColumnNames: Map[String, String] = Map.empty): DataFrame = {
    require(suffix.isEmpty || newColumnNames.isEmpty,
      "Only one of `suffix` or `new_column_names` should be specified")
    // ONE projection evaluated against the ORIGINAL frame, matching the
    // reference's dict/assign semantics
    val destNames = columns.map(c =>
      c -> newColumnNames.getOrElse(c, c + suffix.getOrElse("")))
    val targets = destNames.map { case (src, dst) => dst -> f(col(s"`$src`")) }
    require(targets.map(_._1).distinct.length == targets.length,
      s"transform_columns: duplicate target names ${targets.map(_._1).mkString(", ")}")
    // the reference check_column(df, new_col, present=False) fires for EVERY
    // destination != source — suffix-derived ones included — while dict keys
    // outside `columns` never participate (transform_columns.py:223-233);
    // renaming onto an existing column raises, it never overwrites
    val collisions = destNames.collect {
      case (src, dst) if dst != src && df.columns.contains(dst) => dst
    }
    require(collisions.isEmpty,
      s"transform_columns: new_column_names target(s) already present in " +
        s"dataframe: ${collisions.mkString(", ")}")
    // ListMap keeps spec order so appended columns land deterministically
    // (withColumns iterates the map; an unordered HashMap scrambles >4 keys)
    df.withColumns(scala.collection.immutable.ListMap(targets: _*))
  }

  /** Add column from scalar/expression (reference:
    * janitor/functions/add_columns.py:18,146). Adding is strictly additive —
    * an existing label raises (add_columns.py:96;
    * test_add_column_already_exists); use transform_column to overwrite.
    */
  def addColumn(df: DataFrame, name: String, value: Column): DataFrame = {
    require(!df.columns.contains(name),
      s"Attempted to add column that already exists: $name.")
    df.withColumn(name, value)
  }

  /** Iterable form of add_column (reference: add_columns.py:99-129): values
    * assigned positionally; with `fillRemaining` a short list cycles to frame
    * length, without it the lengths must match (raises like pandas — one
    * bounded count job for the check). Position in a distributed frame comes
    * from an explicit `orderCol`, which must order rows uniquely (pandas uses
    * row position, which does not exist here — SURVEY §7.7); the 0-based rank
    * is a scale-safe prefix count ([[ScaleWindows.runningSum]]), no
    * single-partition window.
    */
  def addColumnIterable(df: DataFrame, name: String, values: Seq[Any],
      orderCol: String, fillRemaining: Boolean = false): DataFrame = {
    require(values.nonEmpty, "add_column: empty values iterable")
    require(!df.columns.contains(name),
      s"Attempted to add column that already exists: $name.")
    val n = df.count()
    // a values list LONGER than the frame raises even with fill_remaining
    // (add_columns.py:109; test_add_column_fill_remaining_iterable)
    require(n >= values.length,
      s"add_column: `value` has more elements than number of rows " +
        s"in your DataFrame ($n rows, ${values.length} values)")
    if (!fillRemaining) {
      require(n == values.length,
        s"add_column: attempted to add iterable of values with length not equal " +
          s"to number of DataFrame rows ($n rows, ${values.length} values); " +
          "pass fillRemaining=true to cycle")
    }
    val arr = array(values.map(lit).toIndexedSeq: _*)
    val idx = ScaleWindows.runningSum(
      df.withColumn("__one", lit(1L)), orderCol, "__one", "__cum")
    idx.withColumn(name,
        element_at(arr, (pmod(col("__cum") - 1, lit(values.length)) + 1).cast("int")))
      .drop("__one", "__cum")
  }

  /** Row-wise function as a new column (reference:
    * janitor/functions/join_apply.py:10 — not a join; a projection).
    */
  def joinApply(df: DataFrame, f: Column, newColumnName: String): DataFrame =
    df.withColumn(newColumnName, f)

  /** Side-effect combinator (reference: janitor/functions/also.py:10). */
  def also(df: DataFrame, f: DataFrame => Unit): DataFrame = { f(df); df }

  /** Pipe combinator (reference: janitor/functions/then.py:16) — Spark's own
    * `transform` is the native equivalent; kept for API parity.
    */
  def andThen(df: DataFrame, f: DataFrame => DataFrame): DataFrame = f(df)
}
