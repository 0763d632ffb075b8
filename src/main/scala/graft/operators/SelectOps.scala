package graft.operators

import graft.{ColumnSelector, RowSelector}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

/** Projection / selection verbs (SURVEY §2.2). All compile to one `select`. */
object SelectOps {

  /** (reference: janitor/functions/select.py:332-447) */
  def selectColumns(df: DataFrame, sels: Seq[ColumnSelector], invert: Boolean = false): DataFrame = {
    val names = ColumnSelector.resolve(df.schema, sels, invert)
    df.select(names.map(n => col(s"`$n`")): _*)
  }

  /** Combined two-axis select (reference: select.py:900-1018 `select` with
    * index= and columns=): the row predicate and the column projection
    * apply in one call, and `invert` complements BOTH axes
    * (tests/functions/test_select.py test_invert).
    */
  def select(df: DataFrame, indexCol: String, rows: Option[RowSelector] = None,
      columns: Seq[ColumnSelector] = Nil, invert: Boolean = false): DataFrame = {
    val afterRows = rows.map(r => selectRows(df, indexCol, r, invert)).getOrElse(df)
    if (columns.isEmpty) afterRows else selectColumns(afterRows, columns, invert)
  }

  /** Row selection against an explicit index column (reference:
    * janitor/functions/select.py:860-899 select_rows via _select_index;
    * semantics per [[graft.RowSelector]]). Every predicate form is one
    * pushdown-friendly `filter`; positional forms (slice step, boolean
    * masks) rank rows in index order with
    * [[ScaleWindows.runningSum]] — no single-partition window. `invert`
    * drops the matched rows (test_invert_num), applied AFTER the
    * existence checks, exactly like pandas raising before inverting.
    */
  def selectRows(df: DataFrame, indexCol: String, sel: RowSelector,
      invert: Boolean = false): DataFrame = {
    import RowSelector._
    val idx = col(s"`$indexCol`")
    def dtype = df.schema(indexCol).dataType
    def isTemporal = dtype match {
      case DateType | TimestampType | TimestampNTZType => true
      case _ => false
    }
    // pandas partial-string indexing: prefix -> [period start, next period)
    def periodBounds(s: String): (String, String) = s match {
      case y if y.matches("""\d{4}""") =>
        (s"$y-01-01", f"${y.toInt + 1}%04d-01-01")
      case ym if ym.matches("""\d{4}-\d{2}""") =>
        val d = java.time.LocalDate.parse(s"$ym-01").plusMonths(1)
        (s"$ym-01", d.toString)
      case ymd if ymd.matches("""\d{4}-\d{2}-\d{2}""") =>
        (ymd, java.time.LocalDate.parse(ymd).plusDays(1).toString)
      case other => throw new IllegalArgumentException(
        s"select_rows: unsupported partial date string '$other'")
    }
    def periodPred(s: String): Column = {
      val (lo, hi) = periodBounds(s)
      idx >= lit(lo).cast(dtype) && idx < lit(hi).cast(dtype)
    }
    // the reference raises eagerly when labels don't exist; one bounded
    // job (distinct over the candidate labels — result <= |labels|)
    def requireSomeMatch(pred: Column, arg: Any): Column = {
      // an un-castable label (ANSI cast failure: "2.5" against an int
      // index) is a no-match, like select.py:566's `except ... raise
      // KeyError` around get_loc
      val empty = try df.filter(pred).isEmpty
        catch { case _: org.apache.spark.SparkException |
                     _: NumberFormatException |
                     _: java.time.DateTimeException => true }
      if (empty) throw new NoSuchElementException(
        s"No match was returned for '$arg'")
      pred
    }
    def requireAllLabels(values: Seq[Any], labelOf: Column = idx): Column = {
      val pred = labelOf.isin(values: _*)
      // membership is decided Spark-side per label in ONE bounded aggregate
      // (a max(matched) flag per requested label), not by comparing driver
      // string spellings — Spark's cast-to-string ("1.50" for a decimal)
      // and String.valueOf ("1.5") can disagree and spuriously raise
      val aggs = values.zipWithIndex.map { case (v, i) =>
        max(coalesce(labelOf === lit(v), lit(false))).as(s"__m$i") }
      val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      val missing = values.zipWithIndex.collect {
        case (v, i) if row.isNullAt(i) || !row.getBoolean(i) => v }
      if (missing.length == values.length) throw new NoSuchElementException(
        s"No match was returned for any of the labels in ${values.mkString("[", ", ", "]")}")
      if (missing.nonEmpty) throw new NoSuchElementException(
        s"No match was returned for these labels: ${missing.mkString(", ")}")
      pred
    }
    def ranked(flagged: DataFrame, inCol: String): DataFrame =
      ScaleWindows.runningSum(flagged, indexCol, inCol, "__rank")
    val keep: Either[Column, DataFrame] = sel match {
      case Label(v: String) if isTemporal =>
        // on a datetime index a bare string IS partial-string indexing;
        // a full timestamp string falls back to exact equality
        val pred = try periodPred(v)
          catch { case _: IllegalArgumentException => idx === lit(v).cast(dtype) }
        Left(requireSomeMatch(pred, v))
      case Label(v) => Left(requireSomeMatch(idx === lit(v), v))
      case Labels(vs) => Left(requireAllLabels(vs))
      case Rx(r) =>
        // pandas' index.str accessor fails on non-string indexes and
        // select.py:513 wraps that failure in the same KeyError — regex row
        // selection is defined on string labels only
        if (dtype != org.apache.spark.sql.types.StringType)
          throw new NoSuchElementException(
            s"No match was returned for '$r' (regex row selection needs a " +
              s"string index; '$indexCol' is $dtype)")
        Left(requireSomeMatch(idx.rlike(r.toString), r))
      case DateStr(p) => Left(requireSomeMatch(periodPred(p), p))
      case Where(f) => Left(f(df))
      case Levels(levels) =>
        Left(levels.map { case (lvl, vs) =>
          requireAllLabels(vs, col(s"`$lvl`"))
        }.reduce(_ && _))
      case LabelSlice(start, stop, step) =>
        require(step > 0, s"select_rows: slice step must be positive, got $step")
        def bound(b: Any, isStop: Boolean): Column = b match {
          case s: String if isTemporal =>
            val (lo, hi) = periodBounds(s)
            if (isStop) idx < lit(hi).cast(dtype) else idx >= lit(lo).cast(dtype)
          case v => if (isStop) idx <= lit(v) else idx >= lit(v)
        }
        val bounds = (start.map(bound(_, isStop = false)) ++
          stop.map(bound(_, isStop = true))).reduceOption(_ && _).getOrElse(lit(true))
        if (step == 1) Left(bounds)
        else if (!invert) {
          // non-inverted: rows outside the bounds can never be kept, so
          // filter FIRST — the bounds predicate pushes to the scan and the
          // rank runs over the sliced region only (same positions)
          val flagged = df.filter(bounds).withColumn("__in", lit(1L))
          Right(ranked(flagged, "__in")
            .withColumn("__keep", (col("__rank") - 1) % step === 0))
        } else { // inverted: every row survives somewhere — rank in place
          val flagged = df.withColumn("__in", when(bounds, 1L).otherwise(0L))
          Right(ranked(flagged, "__in")
            .withColumn("__keep",
              col("__in") === 1L && (col("__rank") - 1) % step === 0))
        }
      case BoolMask(mask) =>
        val n = df.count()
        if (n != mask.length) throw new IllegalArgumentException(
          "The length of the list of booleans does not match " +
            s"the number of rows in the DataFrame (${mask.length} vs $n)")
        val flagged = df.withColumn("__in", lit(1L))
        Right(ranked(flagged, "__in")
          .withColumn("__keep",
            element_at(array(mask.map(lit): _*), col("__rank").cast("int"))))
    }
    keep match {
      case Left(pred) => df.filter(if (invert) !pred else pred)
      case Right(withKeep) =>
        withKeep.filter(if (invert) !col("__keep") else col("__keep"))
          .drop("__in", "__rank", "__keep")
    }
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
  def moveColumn(df: DataFrame, source: String, target: String, position: String = "before"): DataFrame =
    moveColumns(df, Seq(graft.ColumnSelector.Exact(source)),
      Seq(graft.ColumnSelector.Exact(target)), position)

  /** Row-axis move (reference move.py axis=0, tests/functions/
    * test_move.py:11-94): reposition the row(s) labeled `source` in the
    * presentation order defined by `indexCol` to immediately before/after
    * the row labeled `target`. A distributed frame has no positions, so the
    * new order is emitted as a 0-based `posCol` (order by it to present);
    * labels and data are untouched. Two scalable passes
    * ([[ScaleWindows.runningSum]] — never a single-partition window) plus
    * two bounded label lookups (the reference's KeyError contract).
    */
  def moveRows(df: DataFrame, indexCol: String, source: Any, target: Any,
      position: String = "before", posCol: String = "row_pos"): DataFrame = {
    require(position == "before" || position == "after",
      s"Invalid position '$position'. Can only be 'before' or 'after'.")
    val idx = col(s"`$indexCol`")
    val withPos = ScaleWindows.runningSum(
      df.withColumn("__one", lit(1L)), indexCol, "__one", "__p").drop("__one")
    val tRows = withPos.filter(idx === lit(target)).select(min(col("__p"))).collect()
    if (tRows.isEmpty || tRows(0).isNullAt(0)) throw new NoSuchElementException(
      s"move: $target not found in $indexCol")
    if (withPos.filter(idx === lit(source)).isEmpty)
      throw new NoSuchElementException(s"move: $source not found in $indexCol")
    val tPos = tRows(0).getLong(0).toDouble
    val off = if (position == "before") -0.5 else 0.5
    // source rows land at the target's position ± 0.5; a tiny per-row
    // fraction keeps multi-row source blocks in their original relative
    // order without a composite sort key (exact for < 1e8 rows)
    val adj = withPos.withColumn("__np",
      when(idx === lit(source),
        lit(tPos + off) + col("__p").cast("double") * 1e-9d)
        .otherwise(col("__p").cast("double")))
    ScaleWindows.runningSum(adj.withColumn("__one", lit(1L)), "__np", "__one", posCol)
      .withColumn(posCol, col(s"`$posCol`") - 1L)
      .drop("__one", "__p", "__np")
  }

  /** Sequence form of `move` (reference: janitor/functions/move.py:13-133):
    * the selected source block is removed, then re-inserted at
    * searchsorted(remaining, first target) for position="before" or
    * searchsorted(remaining, last target)+1 for "after"; no target means
    * the front ("before") or the end ("after"). Sources keep selection
    * order inside the moved block.
    */
  def moveColumns(df: DataFrame, source: Seq[graft.ColumnSelector],
      target: Seq[graft.ColumnSelector] = Nil,
      position: String = "before"): DataFrame = {
    require(position == "before" || position == "after",
      s"Invalid position '$position'. Can only be 'before' or 'after'.")
    val names = df.columns.toSeq
    // move.py: `assert names.is_unique`
    require(names.distinct.length == names.length,
      "move: column labels must be unique")
    val src = graft.ColumnSelector.resolve(df.schema, source)
    val srcIdx = src.map(names.indexOf).toSet
    val remaining = names.indices.filterNot(srcIdx.contains)
    def searchsorted(t: Int): Int = remaining.indexWhere(_ >= t) match {
      case -1 => remaining.length
      case i => i
    }
    val pos =
      if (target.isEmpty) { if (position == "after") remaining.length else 0 }
      else {
        val tgt = graft.ColumnSelector.resolve(df.schema, target)
          .map(names.indexOf)
        if (position == "before") searchsorted(tgt.head)
        else math.min(searchsorted(tgt.last) + 1, remaining.length)
      }
    val order = remaining.take(pos).map(names) ++ src ++
      remaining.drop(pos).map(names)
    df.select(order.map(n => col(s"`$n`")): _*)
  }

  /** (reference: janitor/functions/drop_constant_columns.py:8). One aggregate
    * pass (min/max per column — cheaper than countDistinct at scale), then a
    * projection dropping single-valued columns.
    */
  def dropConstantColumns(df: DataFrame): DataFrame = {
    // pandas parity (empirically verified against the reference): a column
    // drops iff nunique() == 1 — ONE distinct non-null value, nulls/NaN
    // ignored — so constants-with-gaps drop and ALL-null columns survive
    // (nunique 0 != 1). min==max over the null/NaN-masked column decides
    // single-distinct without a count_distinct (whose multi-column form
    // would EXPAND the scan |columns|-fold).
    val aggs = df.columns.flatMap { c =>
      val base = col(s"`$c`")
      val nn = df.schema(c).dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType =>
          when(isnan(base), lit(null)).otherwise(base)
        case _ => base
      }
      Seq(min(nn).cast("string").as(s"__min_$c"),
        max(nn).cast("string").as(s"__max_$c"),
        count(nn).as(s"__cnt_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).collect()(0)
    val keep = df.columns.filter { c =>
      val mn = row.getAs[String](s"__min_$c")
      val mx = row.getAs[String](s"__max_$c")
      val cnt = row.getAs[Long](s"__cnt_$c")
      !(cnt > 0 && mn != null && mn == mx)
    }
    df.select(keep.map(n => col(s"`$n`")).toIndexedSeq: _*)
  }

  /** Among identically-named columns keep the nth occurrence
    * (reference: janitor/functions/drop_duplicate_columns.py:10).
    */
  def dropDuplicateColumns(df: DataFrame, name: String, nth: Int = 0): DataFrame = {
    val idxs = df.columns.zipWithIndex.filter(_._1 == name).map(_._2)
    require(idxs.nonEmpty, s"Column '$name' not found")
    // the reference drops ONLY the nth occurrence and keeps the rest
    // (drop_duplicate_columns.py doctest: nth_index=1 over a,b,a,a keeps
    // a,b,a; tests/functions/test_drop_duplicate_columns.py); an
    // out-of-range nth raises like the reference IndexError
    require(nth >= 0 && nth < idxs.length,
      s"drop_duplicate_columns: nth_index $nth out of range for " +
        s"${idxs.length} occurrence(s) of '$name'")
    val dropIdx = Set(idxs(nth))
    val keepCols = df.schema.fields.zipWithIndex.collect {
      case (f, i) if !dropIdx.contains(i) => (f, i)
    }
    // Spark can't address dup-named columns by name; rebuild via a positional
    // rename to unique temp aliases, then project.
    val tmp = df.toDF(df.columns.zipWithIndex.map { case (c, i) => s"__c$i" }.toIndexedSeq: _*)
    tmp.select(keepCols.map { case (f, i) => col(s"__c$i").as(f.name) }.toIndexedSeq: _*)
  }
}
