package graft.operators

import graft.ColumnSelector
import graft.functions.{Norm, expressions => gx}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-name hygiene / header verbs (SURVEY §2.1).
  * All pure driver-side renames → a single projection; nothing touches data
  * except the value-mode of clean_names and row_to_names' bounded collect.
  */
object NameOps {

  /** clean_names on column labels (reference: janitor/functions/clean_names.py:19-169;
    * Spark precedent: janitor/spark/functions.py:28-88).
    */
  def cleanNames(
      df: DataFrame,
      caseType: String = "lower",
      removeSpecial: Boolean = false,
      stripAccents: Boolean = true,
      stripUnderscores: Option[String] = None,
      truncateLimit: Int = 0): DataFrame = {
    val cleaned = df.columns.map(c =>
      Norm.cleanName(c, caseType, removeSpecial, stripAccents, stripUnderscores, truncateLimit))
    // de-duplicate collisions with _1, _2 suffixes (pandas allows dup labels;
    // parquet/Spark downstream does not)
    val seen = scala.collection.mutable.Map[String, Int]()
    val unique = cleaned.map { c =>
      val n = seen.getOrElse(c, 0)
      seen(c) = n + 1
      if (n == 0) c else s"${c}_$n"
    }
    df.toDF(unique.toIndexedSeq: _*)
  }

  /** clean_names applied to string *values* of selected columns
    * (reference: clean_names.py axis=None + column_names mode).
    */
  def cleanNamesValues(
      df: DataFrame,
      columns: Seq[String],
      caseType: String = "lower",
      removeSpecial: Boolean = false,
      stripAccentsFlag: Boolean = true,
      stripUnderscores: Option[String] = None,
      truncateLimit: Int = 0): DataFrame = {
    // clean_names.py:121-123: axis=None demands explicit column_names
    require(columns.nonEmpty,
      "Kindly provide an argument to `column_names`, if axis is None.")
    val colsSet = columns.toSet
    val projected = df.columns.map { c =>
      if (!colsSet.contains(c)) col(c)
      else {
        var e: Column = col(c)
        e = caseType.toLowerCase match {
          case "upper" => upper(e)
          case "preserve" => e
          case "lower" => lower(e)
          case "snake" => // columnar twin of Norm.toSnake's two-pass regex
            lower(regexp_replace(
              regexp_replace(e, "(.)([A-Z][a-z]+)", "$1_$2"),
              "([a-z0-9])([A-Z])", "$1_$2"))
          case other => throw new IllegalArgumentException(
            s"case_type must be one of preserve|upper|lower|snake, got $other")
        }
        e = regexp_replace(e, "[ /:,?()\\.-]", "_")
        e = regexp_replace(e, "['’]", "")
        e = regexp_replace(e, "[ ]", "_") // _normalize_1's third FIX
        // remove_special pairs with .str.strip() in the reference
        if (removeSpecial) e = trim(regexp_replace(e, "[^A-Za-z_\\d]", ""))
        if (stripAccentsFlag) e = gx.strip_accents(e)
        e = regexp_replace(e, "_+", "_")
        e = stripUnderscores match {
          case Some("left") | Some("l") => regexp_replace(e, "^_+", "")
          case Some("right") | Some("r") => regexp_replace(e, "_+$", "")
          case Some("both") | Some("true") =>
            regexp_replace(regexp_replace(e, "^_+", ""), "_+$", "")
          case None => e
          case Some(other) => throw new IllegalArgumentException(
            s"strip_underscores must be one of: None, left, right, both, l, r, true — got $other")
        }
        if (truncateLimit > 0) e = substring(e, 1, truncateLimit)
        e.as(c)
      }
    }
    df.select(projected.toIndexedSeq: _*)
  }

  /** (reference: janitor/functions/rename_columns.py:17) */
  def renameColumn(df: DataFrame, old: String, newName: String): DataFrame = {
    require(df.columns.contains(old), s"Column '$old' not found")
    df.withColumnRenamed(old, newName)
  }

  /** (reference: janitor/functions/rename_columns.py:68) — mapping or function */
  def renameColumns(df: DataFrame, mapping: Map[String, String] = Map.empty,
      fn: Option[String => String] = None): DataFrame = {
    val renamed = df.columns.map { c =>
      mapping.getOrElse(c, fn.map(_(c)).getOrElse(c))
    }
    df.toDF(renamed.toIndexedSeq: _*)
  }

  /** (reference: janitor/functions/limit_column_characters.py:10) */
  def limitColumnCharacters(df: DataFrame, length: Int, sep: String = "_"): DataFrame = {
    val truncated = df.columns.map(_.take(length))
    val seen = scala.collection.mutable.Map[String, Int]()
    val unique = truncated.map { c =>
      val n = seen.getOrElse(c, 0)
      seen(c) = n + 1
      if (n == 0) c else s"$c$sep$n"
    }
    df.toDF(unique.toIndexedSeq: _*)
  }

  /** Promote row(s) to header by position in `orderCol` order
    * (reference: janitor/functions/row_to_names.py:16-183). Scale-safe: the
    * header prefix is fetched with orderBy(...).limit(maxRow+1) — Spark's
    * TakeOrderedAndProject, a distributed top-k with per-partition
    * pre-pruning — never a global row_number window (which funnels the whole
    * table through one task). Row-removal filters are then expressed on
    * `orderCol` *values* taken from the collected prefix, so the main scan
    * needs no row numbering at all. Requires `orderCol` to order rows
    * uniquely at the header positions (ties there would make "row i"
    * ill-defined under any implementation). Multiple rows join with `sep`
    * (polars precedent: janitor/polars/row_to_names.py:23).
    */
  def rowToNames(df: DataFrame, orderCol: String, rowNumbers: Seq[Int],
      removeRows: Boolean = false, removeRowsAbove: Boolean = false,
      sep: String = "_"): DataFrame = {
    require(rowNumbers.nonEmpty, "row_to_names: no row numbers given")
    // remove_rows_above is defined only for a CONTIGUOUS header block — the
    // polars backend raises for a non-consecutive list
    // (polars/row_to_names.py; test_row_to_names_not_a_slice_remove_rows_above)
    require(!removeRowsAbove ||
        rowNumbers.sorted.sliding(2).forall(p => p.length < 2 || p(1) - p(0) == 1),
      "row_to_names: the remove_rows_above argument is applicable only when " +
        "the row_numbers are consecutive")
    val maxRow = rowNumbers.max
    // null-ordered rows are excluded from header candidacy ("row i" is defined
    // over non-null orderCol values); they are data rows and survive removal
    val head = df.filter(col(s"`$orderCol`").isNotNull)
      .orderBy(col(s"`$orderCol`")).limit(maxRow + 1).collect()
    require(head.length == maxRow + 1, "row_to_names: header rows missing")
    val hdrRows = rowNumbers.map(head(_))
    val dataCols = df.columns
    val newNames = dataCols.zipWithIndex.map { case (_, idx) =>
      hdrRows.map(r => String.valueOf(r.get(idx))).mkString(sep)
    }
    val ordIdx = dataCols.indexOf(orderCol)
    var out = df
    if (removeRows) {
      val hdrVals = hdrRows.map(r => lit(r.get(ordIdx)))
      // isin is null for null orderCol — keep those rows explicitly (they can
      // never be header rows, headers come from the non-null prefix)
      out = out.filter(!col(s"`$orderCol`").isin(hdrVals: _*) ||
        col(s"`$orderCol`").isNull)
    }
    // only rows ABOVE the first header row are removed (row_to_names.py:144-183);
    // the header rows themselves are governed by removeRows
    if (removeRowsAbove) {
      val minVal = head(rowNumbers.min).get(ordIdx)
      out = out.filter(col(s"`$orderCol`") >= lit(minVal) ||
        col(s"`$orderCol`").isNull)
    }
    out.toDF(newNames.toIndexedSeq: _*)
  }

  /** Slice form of row_to_names (reference: row_to_names.py:144-183 accepts a
    * python `slice`): rows [start, end) with `step`, same removal semantics.
    */
  def rowToNamesSlice(df: DataFrame, orderCol: String, start: Int, end: Int,
      step: Int = 1, removeRows: Boolean = false,
      removeRowsAbove: Boolean = false, sep: String = "_"): DataFrame =
    rowToNames(df, orderCol, start until end by step, removeRows, removeRowsAbove, sep)

  /** Flatten multi-part names: our normal form is already flat, so this joins
    * struct-column subfields into top-level `parent<sep>child` columns
    * (reference: janitor/functions/collapse_levels.py:11).
    */
  def collapseLevels(df: DataFrame, sep: String = "_"): DataFrame =
    collapseLevelsWith(df, Some(sep), None)

  /** Full collapse_levels surface (reference:
    * janitor/functions/collapse_levels.py): `sep` joins the level values,
    * `glue` is a template over positional level placeholders `{0}` (the
    * struct column name) and `{1}` (the field name) — the positional
    * stand-in for pandas' named levels; only one of the two may be given
    * (test_sep_and_glue).
    */
  def collapseLevelsWith(df: DataFrame, sep: Option[String] = None,
      glue: Option[String] = None): DataFrame = {
    require(sep.isEmpty || glue.isEmpty,
      "Only one of sep or glue should be provided.")
    import org.apache.spark.sql.types.StructType
    val label: (String, String) => String = (parent, sub) => glue match {
      case Some(g) => g.replace("{0}", parent).replace("{1}", sub)
      case None => s"$parent${sep.getOrElse("_")}$sub"
    }
    val cols: Seq[Column] = df.schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case s: StructType =>
          s.fieldNames.toSeq.map(sub => col(s"`${f.name}`.`$sub`").as(label(f.name, sub)))
        case _ => Seq(col(s"`${f.name}`"))
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** The `axis="index"` form of collapse_levels (reference:
    * collapse_levels.py `axis` param; tests/functions/test_collapse_levels.py
    * test_glue_output): the row MultiIndex — explicit index COLUMNS in our
    * model (SURVEY §1.1) — collapses into one index column. `glue` is a
    * template over `{name}` placeholders (pandas' named levels); `sep`
    * joins the stringified level values. One narrow projection, no job.
    */
  def collapseLevelsRows(df: DataFrame, indexCols: Seq[String],
      sep: Option[String] = None, glue: Option[String] = None,
      into: String = "index"): DataFrame = {
    require(sep.isEmpty || glue.isEmpty,
      "Only one of sep or glue should be provided.")
    require(indexCols.nonEmpty, "collapse_levels: no index columns")
    indexCols.foreach(c => require(df.columns.contains(c),
      s"collapse_levels: index column '$c' not found"))
    val collapsed: Column = glue match {
      case Some(g) =>
        // split the template on {name} placeholders; literals become lit()
        val parts = """\{([^{}]+)\}""".r.split(g) // literal chunks
        val names = """\{([^{}]+)\}""".r.findAllMatchIn(g).map(_.group(1)).toSeq
        names.foreach(n => require(indexCols.contains(n),
          s"collapse_levels: glue placeholder '$n' is not an index column"))
        val pieces = scala.collection.mutable.ArrayBuffer.empty[Column]
        for (i <- names.indices) {
          if (i < parts.length && parts(i).nonEmpty) pieces += lit(parts(i))
          pieces += col(s"`${names(i)}`").cast("string")
        }
        if (parts.length > names.length && parts.last.nonEmpty) pieces += lit(parts.last)
        concat(pieces.toSeq: _*)
      case None =>
        concat_ws(sep.getOrElse("_"), indexCols.map(c => col(s"`$c`").cast("string")): _*)
    }
    val firstIdx = df.columns.indexWhere(indexCols.contains)
    val keep = df.columns.filterNot(indexCols.contains)
    val (before, after) = keep.splitAt(firstIdx)
    df.select((before.map(c => col(s"`$c`")) ++ Seq(collapsed.as(into)) ++
      after.map(c => col(s"`$c`"))).toIndexedSeq: _*)
  }

  /** Inverse of collapseLevels: split labels on `sep` into struct columns
    * (reference: janitor/functions/explode_index.py:15).
    */
  def explodeIndex(df: DataFrame, sep: String = "_"): DataFrame =
    explodeIndexBy(df, c => {
      val parts = c.split(java.util.regex.Pattern.quote(sep), 2)
      if (parts.length == 2) Some((parts(0), parts(1))) else None
    })

  /** Regex form of explode_index (explode_index.py names_pattern;
    * test_names_pattern): the two capture groups become the outer struct
    * name and the field name; labels the pattern does not match stay flat.
    */
  def explodeIndexPattern(df: DataFrame, namesPattern: String): DataFrame = {
    // strip ONLY (?P<name>/(?<name> where name is an identifier — a looser
    // pattern would also rewrite lookbehinds (?<=…)/(?<!…) into capture
    // groups and silently change the pattern's semantics (ADVICE r16)
    val p = java.util.regex.Pattern.compile(
      """\(\?P?<([A-Za-z][A-Za-z0-9_]*)>""".r.replaceAllIn(namesPattern, "("))
    require(p.matcher("").groupCount() >= 2,
      "explode_index: names_pattern needs at least two capture groups")
    explodeIndexBy(df, c => {
      val m = p.matcher(c)
      if (m.matches()) Some((m.group(1), m.group(2))) else None
    })
  }

  private def explodeIndexBy(df: DataFrame,
      splitLabel: String => Option[(String, String)]): DataFrame = {
    val parsed = df.columns.toSeq.map(c => c -> splitLabel(c))
    val groups = parsed.groupBy { case (c, s) => s.map(_._1).getOrElse(c) }
    val cols = groups.toSeq
      .sortBy { case (_, cs) => parsed.indexWhere(_._1 == cs.head._1) }
      .map { case (parent, cs) =>
        if (cs.length == 1 && cs.head._2.isEmpty) col(s"`${cs.head._1}`")
        else struct(cs.map { case (c, s) =>
          col(s"`$c`").as(s.map(_._2).getOrElse(c))
        }.toIndexedSeq: _*).as(parent)
      }
    df.select(cols: _*)
  }
}
