package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reshape verbs (SURVEY §2.6): pivot_longer/wider, expand/expand_grid,
  * complete. The pivot_longer spec computation is pure driver-side schema
  * work (reference computes it the same way — janitor/functions/pivot.py:913);
  * execution is one shuffle-free `explode(array(struct(...)))` projection.
  */
object ReshapeOps {

  /** One output-row template per label-combination: the new label values plus,
    * per value-target column, which source column feeds it (None → null).
    */
  private case class LongSpecRow(labelValues: Seq[String], sources: Map[String, Option[String]])

  /** tidyr-style wide→long (reference: janitor/functions/pivot.py:26-410).
    * Supports namesSep or namesPattern (regex with capture groups), the
    * `.value` placeholder in namesTo (label fragments become output column
    * names), namesTransform casts, and dropna.
    */
  def pivotLonger(
      df: DataFrame,
      index: Seq[String],
      namesTo: Seq[String] = Seq("variable"),
      valuesTo: String = "value",
      namesSep: Option[String] = None,
      namesPattern: Option[String] = None,
      columnNames: Seq[String] = Nil,
      dropna: Boolean = false,
      namesTransform: Map[String, String] = Map.empty): DataFrame = {

    require(namesSep.isEmpty || namesPattern.isEmpty,
      "Only one of names_pattern or names_sep should be provided.")
    namesTo.filterNot(_ == ".value").groupBy(identity).collectFirst {
      case (n, g) if g.size > 1 => n
    }.foreach(n => throw new IllegalArgumentException(
      s"'$n' is duplicated in names_to."))

    // column_names without index: the untouched columns become the index
    // (pivot.py:607-613 test_pivot_column_only)
    val idx = if (index.isEmpty && columnNames.nonEmpty)
      df.columns.filterNot(columnNames.contains(_)).toSeq else index
    val valueCols = if (columnNames.nonEmpty) columnNames
      else df.columns.filterNot(idx.contains(_)).toSeq

    if (!namesTo.contains(".value")) {
      // without .value the new labels/values must not collide with the
      // surviving index (pivot.py:667-677,841-862)
      require(!namesTo.contains(valuesTo),
        "The argument provided for values_to already exists in names_to; " +
          "Kindly use a unique name.")
      if (namesSep.isEmpty && namesPattern.isEmpty)
        require(!idx.contains(valuesTo),
          "The argument provided to values_to already exist as a column " +
            "label assigned to the dataframe's index parameter. " +
            "Kindly use a unique label.")
      val inter = namesTo.toSet.intersect(idx.toSet)
      require(inter.isEmpty,
        s"Labels ${inter.mkString(", ")} in names_to already exist as " +
          "column labels assigned to the dataframe's index parameter. " +
          "Kindly provide unique label(s).")
    }

    // every column assigned to the index: nothing to flip, frame unchanged
    // (pivot.py:624 returns the input; test_no_column_names)
    if (valueCols.isEmpty) return df

    // 1. driver-side spec: source label -> per-namesTo fragments
    val fragments: Seq[(String, Seq[String])] = valueCols.map { c =>
      val parts: Seq[String] = (namesSep, namesPattern) match {
        // pandas str.split: a single-character separator is literal, a
        // longer one is a regex (test_names_sep_len relies on this)
        case (Some(sep), _) if sep.length == 1 =>
          c.split(java.util.regex.Pattern.quote(sep), -1).toSeq
        case (Some(sep), _) => c.split(sep, -1).toSeq
        case (_, Some(pat)) =>
          val m = java.util.regex.Pattern.compile(pat).matcher(c)
          if (m.matches()) (1 to m.groupCount()).map(m.group)
          else throw new IllegalArgumentException(s"pivot_longer: '$c' does not match names_pattern")
        case _ => Seq(c)
      }
      require(parts.length == namesTo.length,
        s"pivot_longer: label '$c' split into ${parts.length} parts but names_to has ${namesTo.length}")
      c -> parts
    }

    val hasDotValue = namesTo.contains(".value")
    val labelNames = namesTo.filterNot(_ == ".value")

    val spec: Seq[LongSpecRow] =
      if (!hasDotValue) {
        fragments.map { case (src, parts) =>
          LongSpecRow(parts, Map(valuesTo -> Some(src)))
        }
      } else {
        // group source columns by their non-.value label combo; each .value
        // fragment becomes an output column (pivot.py:1308-1725)
        val rows = fragments.map { case (src, parts) =>
          val labels = namesTo.zip(parts).collect { case (n, p) if n != ".value" => p }
          // multiple .value fragments concatenate directly: ("x","_mean") →
          // "x_mean" (reference: pivot.py doctest "multiple .value")
          val target = namesTo.zip(parts).collect { case (".value", p) => p }.mkString
          (labels, target, src)
        }
        val targets = rows.map(_._2).distinct
        // the extracted output columns must not collide with the other
        // names_to labels or the index (pivot.py _dot_value_extra_checks)
        val badNames = targets.toSet.intersect(labelNames.toSet)
        require(badNames.isEmpty,
          s"Labels ${badNames.mkString(", ")} in names_to already exist in " +
            "the new dataframe's columns. Kindly provide unique label(s).")
        val badIdx = targets.toSet.intersect(idx.toSet)
        require(badIdx.isEmpty,
          s"Labels ${badIdx.mkString(", ")} already exist as column labels " +
            "assigned to the dataframe's index parameter. " +
            "Kindly provide unique label(s).")
        // with non-.value labels present, duplicate (labels, target) rows
        // cannot reshape (pivot.py:1346-1347); only the .value-only form
        // stacks occurrences
        if (labelNames.nonEmpty) {
          val specDupes = rows.map(r => (r._1, r._2))
          require(specDupes.distinct.length == specDupes.length,
            "spec contains duplicate entries, cannot reshape.")
        }
        // when several sources collapse to the SAME (labels, target) pair —
        // e.g. names_to=[".value"] with pattern "(.)." mapping x1 AND x2 to
        // "x" — each occurrence is its own long row, stacked (the polars
        // dot_value_only cum_count over ".value",
        // polars/pivot_longer.py:508-510; pandas stacks identically)
        val occ = scala.collection.mutable.Map[(Seq[String], String), Int]()
        val rowsOcc = rows.map { case (labels, target, src) =>
          val k = (labels, target)
          val o = occ.getOrElse(k, 0); occ(k) = o + 1
          (labels, o, target, src)
        }
        rowsOcc.map(r => (r._1, r._2)).distinct.map { case (labels, o) =>
          val srcByTarget = rowsOcc.collect {
            case (`labels`, `o`, t, src) => t -> src
          }.toMap
          LongSpecRow(labels, targets.map(t => t -> srcByTarget.get(t)).toMap)
        }
      }

    val targetNames: Seq[String] =
      if (hasDotValue) spec.head.sources.keys.toSeq.sorted
      else Seq(valuesTo)

    // 2. execution: one explode over per-spec-row structs
    val structs = spec.map { row =>
      val labelCols = labelNames.zip(row.labelValues).map { case (n, v) =>
        val c = lit(v)
        namesTransform.get(n).map(t => c.cast(t)).getOrElse(c).as(n)
      }
      val valCols = targetNames.map { t =>
        row.sources.getOrElse(t, None) match {
          case Some(src) => col(s"`$src`").as(t)
          case None => lit(null).as(t)
        }
      }
      struct(labelCols ++ valCols: _*)
    }
    // value columns of heterogeneous types: Spark unifies via common type in
    // array(); mismatches surface as analysis errors (document).
    val exploded = df.select((idx.map(n => col(s"`$n`")) :+
      explode(array(structs: _*)).as("__pl")): _*)
    val out = exploded.select((idx.map(n => col(s"`$n`")) ++
      (labelNames ++ targetNames).map(n => col(s"__pl.`$n`").as(n))): _*)
    if (dropna) out.na.drop("all", targetNames) else out
  }

  /** Sequence-of-regexes form of pivot_longer (reference: pivot.py doctest
    * "Reshape the dataframe by passing a sequence to names_pattern"):
    * each source column is claimed by the FIRST regex (search semantics)
    * that matches it; each names_to entry becomes an output value column
    * fed by its regex's columns, paired positionally across groups
    * (ragged groups null-fill).
    */
  def pivotLongerMulti(df: DataFrame, index: Seq[String], namesTo: Seq[String],
      namesPatterns: Seq[String], dropna: Boolean = false): DataFrame = {
    require(namesTo.length == namesPatterns.length,
      "pivot_longer: names_to and names_pattern sequences must align")
    require(!namesTo.contains(".value"),
      ".value is not accepted in names_to if names_pattern is a list/tuple.")
    val valueCols = df.columns.filterNot(index.contains(_)).toSeq
    val groups = claimColumns(valueCols, namesPatterns)
    val maxLen = groups.map(_.length).max
    val structs = (0 until maxLen).map { p =>
      struct(namesTo.zip(groups).map { case (n, cols) =>
        cols.lift(p).map(c => col(s"`$c`")).getOrElse(lit(null)).as(n)
      }: _*)
    }
    val out = df.select((index.map(n => col(s"`$n`")) :+
      explode(array(structs: _*)).as("__pl")): _*)
      .select((index.map(n => col(s"`$n`")) ++
        namesTo.map(n => col(s"__pl.`$n`").as(n))): _*)
    // dropna drops rows where EVERY stacked value column is null
    // (pivot.py _pivot_longer_dropna: logical_and.reduce over contents)
    if (dropna) out.na.drop("all", namesTo) else out
  }

  /** Tuple `values_to` form (reference: pivot.py:1044-1161, doctest
    * "Multiple values_to"): each regex claims its matching source columns
    * (first match wins, search semantics); group g's claimed column at
    * position p contributes its NAME to output column namesTo(g) and its
    * VALUE to output column valuesTo(g). Positions pair across groups
    * zip_longest-style: ragged groups null-fill both the name and the value
    * (the reference's (watermelon, None) pairing).
    */
  def pivotLongerValuesTo(df: DataFrame, index: Seq[String], namesTo: Seq[String],
      valuesTo: Seq[String], namesPatterns: Seq[String],
      columnNames: Seq[String] = Nil): DataFrame = {
    require(namesTo.length == namesPatterns.length,
      "pivot_longer: names_to and names_pattern sequences must align (pivot.py:721-726)")
    require(valuesTo.length == namesPatterns.length,
      "pivot_longer: values_to and names_pattern sequences must align (pivot.py:736-741)")
    // values_to entries must be unique, absent from names_to, and must not
    // collide with the index (pivot.py:736-756,658-666)
    valuesTo.groupBy(identity).collectFirst { case (v, g) if g.size > 1 => v }
      .foreach(v => throw new IllegalArgumentException(
        s"'$v' is duplicated in values_to."))
    valuesTo.find(namesTo.contains(_)).foreach(v =>
      throw new IllegalArgumentException(
        s"'$v' in values_to already exists in names_to."))
    val badIdx = valuesTo.toSet.intersect(index.toSet)
    require(badIdx.isEmpty,
      s"Labels ${badIdx.mkString(", ")} in values_to already exist as " +
        "column labels assigned to the dataframe's index parameter. " +
        "Kindly use unique labels.")
    val valueCols = if (columnNames.nonEmpty) columnNames
      else df.columns.filterNot(index.contains(_)).toSeq
    val groups = claimColumns(valueCols, namesPatterns)
    val maxLen = groups.map(_.length).max
    val structs = (0 until maxLen).map { p =>
      val nameCols = namesTo.zip(groups).map { case (n, cols) =>
        cols.lift(p).map(c => lit(c)).getOrElse(lit(null).cast("string")).as(n)
      }
      val valCols = valuesTo.zip(groups).map { case (v, cols) =>
        cols.lift(p).map(c => col(s"`$c`")).getOrElse(lit(null)).as(v)
      }
      struct(nameCols ++ valCols: _*)
    }
    df.select((index.map(n => col(s"`$n`")) :+
      explode(array(structs: _*)).as("__pl")): _*)
      .select((index.map(n => col(s"`$n`")) ++
        (namesTo ++ valuesTo).map(n => col(s"__pl.`$n`").as(n))): _*)
  }

  /** Dictionary `names_pattern` (reference: pivot.py:762-789, doctest
    * "passing a dictionary"): keys are the new value-column names, values
    * are the claiming regexes — exactly the sequence form with
    * names_to = keys. Ordered pairs stand in for Python's dict.
    */
  def pivotLongerDict(df: DataFrame, index: Seq[String],
      pattern: Seq[(String, String)]): DataFrame =
    pivotLongerMulti(df, index, pattern.map(_._1), pattern.map(_._2))

  /** Nested-dictionary `names_pattern` (reference: pivot.py doctest
    * "nested dictionary"): outer key → names_to, inner key → values_to,
    * inner value → claiming regex. Triples (namesTo, valuesTo, regex)
    * stand in for Python's nested dict.
    */
  def pivotLongerNestedDict(df: DataFrame, index: Seq[String],
      pattern: Seq[(String, String, String)]): DataFrame =
    pivotLongerValuesTo(df, index, pattern.map(_._1), pattern.map(_._2),
      pattern.map(_._3))

  /** Named-group `names_pattern` with no names_to (reference: pivot.py
    * doctest "named groups", :196-204): group names become names_to; a name
    * of only underscores (_, __, ...) is the `.value` placeholder. Accepts
    * both Python `(?P<name>...)` and Java `(?<name>...)` spellings; names
    * are stripped before matching so underscore names (illegal in Java
    * regex) never reach the compiler.
    */
  def pivotLongerNamedGroups(df: DataFrame, index: Seq[String],
      namesPattern: String, valuesTo: String = "value",
      columnNames: Seq[String] = Nil, dropna: Boolean = false,
      namesTransform: Map[String, String] = Map.empty): DataFrame = {
    val nameRe = """\(\?P?<([^>]+)>""".r
    val names = nameRe.findAllMatchIn(namesPattern).map(_.group(1)).toSeq
    require(names.nonEmpty, "pivot_longer: names_pattern has no named groups and names_to is absent")
    val namesTo = names.map(n => if (n.forall(_ == '_')) ".value" else n)
    val stripped = nameRe.replaceAllIn(namesPattern, "(")
    pivotLonger(df, index, namesTo, valuesTo, namesPattern = Some(stripped),
      columnNames = columnNames, dropna = dropna, namesTransform = namesTransform)
  }

  /** First-match-wins column claiming shared by the sequence forms; raises
    * when a regex claims nothing, like the reference (pivot.py:1066-1070).
    */
  private def claimColumns(valueCols: Seq[String],
      namesPatterns: Seq[String]): Seq[Seq[String]] = {
    val regexes = namesPatterns.map(_.r)
    val claimed = valueCols.flatMap { c =>
      regexes.zipWithIndex.collectFirst {
        case (r, gi) if r.findFirstIn(c).isDefined => (gi, c)
      }
    }
    namesPatterns.zipWithIndex.foreach { case (p, gi) =>
      require(claimed.exists(_._1 == gi),
        s"pivot_longer: no match was returned for the regex $p")
    }
    namesPatterns.indices.map(gi => claimed.collect { case (`gi`, c) => c })
  }

  /** Declarative long-form with a user-provided spec
    * (reference: janitor/functions/pivot.py:413-552). The spec DataFrame-free
    * form: rows of (sourceColumn, valueTarget, labelValues).
    */
  def pivotLongerSpec(df: DataFrame, index: Seq[String],
      spec: Seq[(String, String, Map[String, String])]): DataFrame = {
    // the polars backend's spec validation (polars/pivot_longer.py and
    // tests/polars/functions/test_pivot_longer_spec_polars.py): `.name`
    // labels must be unique, must exist in the frame, and the spec's extra
    // label columns must not collide with existing frame columns
    val dupNames = spec.map(_._1).diff(spec.map(_._1).distinct).distinct
    require(dupNames.isEmpty,
      s"pivot_longer_spec: the labels in the `.name` column should be " +
        s"unique: ${dupNames.mkString(", ")}")
    val missingSrc = spec.map(_._1).filterNot(df.columns.contains)
    require(missingSrc.isEmpty,
      s"pivot_longer_spec: `.name` labels not in the dataframe: " +
        missingSrc.mkString(", "))
    val collide = spec.flatMap(_._3.keys).distinct.filter(df.columns.contains)
    require(collide.isEmpty,
      s"pivot_longer_spec: labels (${collide.mkString(", ")}) in the spec " +
        "dataframe already exist as column labels in the source dataframe")
    val labelNames = spec.flatMap(_._3.keys).distinct
    val targets = spec.map(_._2).distinct
    val combos = spec.groupBy(_._3).toSeq
      .sortBy(g => spec.indexWhere(_._3 == g._1))
    val structs = combos.map { case (labels, group) =>
      val srcByTarget = group.map(r => r._2 -> r._1).toMap
      struct(
        labelNames.map(n => lit(labels(n)).as(n)) ++
          targets.map(t => srcByTarget.get(t).map(s0 => col(s"`$s0`")).getOrElse(lit(null)).as(t)): _*)
    }
    val exploded = df.select((index.map(n => col(s"`$n`")) :+
      explode(array(structs: _*)).as("__pl")): _*)
    exploded.select((index.map(n => col(s"`$n`")) ++
      (labelNames ++ targets).map(n => col(s"__pl.`$n`").as(n))): _*)
  }

  /** long→wide (reference: janitor/functions/pivot.py:1865-2203).
    * `knownValues` supplies the full category universe explicitly;
    * `namesExpand` (pivot.py:1874,1960-1980) reads it from the
    * [[TypeOps.encodeCategorical]] registry on `namesFrom`. Either way,
    * unseen categories still become (null) columns AND Spark skips the
    * extra distinct-values job — both correctness and a scale win.
    * `namesGlue` (pivot.py:1872,1937-1943) templates the new labels:
    * `{_value}` is the values_from name, `{<names_from>}` the pivoted value
    * — e.g. "{_value}_step{step}" → "a_step1".
    */
  def pivotWider(df: DataFrame, index: Seq[String], namesFrom: String,
      valuesFrom: String, agg: String = "first", namesPrefix: String = "",
      knownValues: Seq[String] = Nil, namesGlue: String = "",
      namesExpand: Boolean = false, indexExpand: Boolean = false): DataFrame = {
    val universe =
      if (namesExpand)
        TypeOps.categoriesOf(df, namesFrom).getOrElse(throw new IllegalArgumentException(
          s"pivot_wider: names_expand=true but '$namesFrom' has no category registry " +
            "(encode_categorical it first, or pass knownValues)"))
      else knownValues
    val grouped = df.groupBy(index.map(n => col(s"`$n`")): _*)
    val piv = if (universe.nonEmpty) grouped.pivot(namesFrom, universe)
      else grouped.pivot(namesFrom)
    val out = agg match {
      case "first" =>
        // janitor's pivot_wider is pd.pivot, NOT pivot_table: a duplicate
        // (index, names_from) pair raises (test_pivot_wider.py:170-180).
        // The guard rides the SAME shuffle — a paired per-cell count whose
        // raise_error trips during evaluation, no second job. Any other
        // `agg` is our pivot_table-style extension and aggregates dupes.
        val p = piv.agg(first(col(s"`$valuesFrom`")).as("__v"),
          count(lit(1)).as("__n"))
        val sel = index.map(n => col(s"`$n`")) ++
          p.columns.filterNot(index.contains(_)).filter(_.endsWith("___v"))
            .toSeq.map { vc =>
              val lvl = vc.stripSuffix("___v")
              when(col(s"`${lvl}___n`") > 1, raise_error(lit(
                "pivot_wider: index contains duplicate entries, cannot reshape")))
                .otherwise(col(s"`$vc`")).as(lvl)
            }
        p.select(sel: _*)
      case "sum" => piv.agg(sum(col(s"`$valuesFrom`")))
      case "avg" | "mean" => piv.agg(avg(col(s"`$valuesFrom`")))
      case "count" => piv.agg(count(col(s"`$valuesFrom`")))
      case "max" => piv.agg(max(col(s"`$valuesFrom`")))
      case "min" => piv.agg(min(col(s"`$valuesFrom`")))
      case other => throw new IllegalArgumentException(s"pivot_wider: bad agg $other")
    }
    val rename: String => String =
      if (namesGlue.nonEmpty)
        v => namesGlue.replace("{_value}", valuesFrom).replace(s"{$namesFrom}", v)
      else if (namesPrefix.nonEmpty) v => namesPrefix + v
      else identity
    val renamed = out.columns.map(c => if (index.contains(c)) c else rename(c))
    val flat = out.toDF(renamed.toIndexedSeq: _*)
    if (!indexExpand) flat
    else {
      // index_expand (pivot.py:1875, test_pivot_wider.py:542): reindex the
      // output over the index column's full category registry — unobserved
      // categories become all-null rows. Same outer merge as complete's
      // literal universes.
      require(index.length == 1,
        "pivot_wider: index_expand needs a single index column here")
      val cats = TypeOps.categoriesOf(df, index.head).getOrElse(
        throw new IllegalArgumentException(
          s"pivot_wider: index_expand=true but '${index.head}' has no " +
            "category registry (encode_categorical it first)"))
      val dt = df.schema(index.head).dataType
      val uni = expandGrid(df.sparkSession, Seq(index.head -> cats))
        .select(col(s"`${index.head}`").cast(dt).as(index.head))
      completeAgainst(flat, uni, Seq(index.head), Map.empty, false)
    }
  }

  /** Multi-`values_from` long→wide (reference: pivot.py:1865-2063 — a list
    * `values_from` yields one output column per (value column × names_from
    * level), labeled `{value}{names_sep}{level}` exactly as pandas flattens
    * the MultiIndex with `names_sep`, default "_"). One groupBy+pivot with
    * all the aggregates fused — a single shuffle regardless of how many
    * value columns are pivoted. `namesGlue` (pivot.py:1937-1943) overrides
    * the label template: `{_value}` → value-column name, `{<namesFrom>}` →
    * the pivoted level.
    */
  def pivotWiderMulti(df: DataFrame, index: Seq[String], namesFrom: String,
      valuesFrom: Seq[String], agg: String = "first", namesSep: String = "_",
      knownValues: Seq[String] = Nil, namesGlue: String = ""): DataFrame = {
    require(valuesFrom.nonEmpty, "pivot_wider: no values_from")
    def aggOf(vf: String): Column = {
      val c = col(s"`$vf`")
      val a = agg match {
        case "first" => first(c)
        case "sum" => sum(c)
        case "avg" | "mean" => avg(c)
        case "count" => count(c)
        case "max" => max(c)
        case "min" => min(c)
        case other => throw new IllegalArgumentException(s"pivot_wider: bad agg $other")
      }
      a.as(vf)
    }
    // the level universe must be driver-known to rename deterministically;
    // one distinct job when not supplied (same job Spark's pivot() would run
    // internally anyway — passing values to pivot() then skips it)
    val universe: Seq[String] =
      if (knownValues.nonEmpty) knownValues
      else df.select(col(s"`$namesFrom`").cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq.sortBy(v => Option(v).getOrElse(""))
    // agg="first" = pd.pivot parity: pair every cell with a count and raise
    // on duplicates inside the same shuffle (see pivotWider)
    val guard = agg == "first"
    val aggs0 = valuesFrom.map(aggOf)
    val aggs = if (guard) aggs0 :+ count(lit(1)).as("__n") else aggs0
    val out = df.groupBy(index.map(n => col(s"`$n`")): _*)
      .pivot(namesFrom, universe)
      .agg(aggs.head, aggs.tail: _*)
    // Spark labels multi-agg pivot columns {level}_{aggAlias}; pandas wants
    // {value}{sep}{level}
    val rename: (String, String) => String =
      if (namesGlue.nonEmpty) (vf, lv) =>
        namesGlue.replace("{_value}", vf).replace(s"{$namesFrom}", lv)
      else (vf, lv) => s"$vf$namesSep$lv"
    // with the guard column the pivot is always multi-agg ({level}_{alias});
    // without it a single value column keeps the bare level label
    val multiAgg = guard || valuesFrom.length > 1
    val sel = out.columns.toSeq.filterNot(_.endsWith("___n")).map { c =>
      if (index.contains(c)) col(s"`$c`")
      else {
        val hit = (for {
          lv <- universe.iterator
          vf <- valuesFrom.iterator
          if (multiAgg && c == s"${lv}_$vf") || (!multiAgg && c == lv)
        } yield (lv, vf)).nextOption()
        hit match {
          case Some((lv, vf)) =>
            val base = col(s"`$c`")
            val guarded = if (guard)
              when(col(s"`${lv}___n`") > 1, raise_error(lit(
                "pivot_wider: index contains duplicate entries, cannot reshape")))
                .otherwise(base)
            else base
            guarded.as(rename(vf, lv))
          case None => col(s"`$c`")
        }
      }
    }
    out.select(sel: _*)
  }

  /** Cartesian product of named value lists
    * (reference: janitor/functions/expand_grid.py:27-137; kernel
    * janitor/utils.py:49-140). Chained crossJoins of tiny literal frames —
    * Catalyst plans BroadcastNestedLoop over broadcast singles.
    */
  def expandGrid(spark: SparkSession, inputs: Seq[(String, Seq[Any])]): DataFrame = {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    require(inputs.nonEmpty, "expand_grid: empty input")
    // an empty entry raises eagerly, like the reference's ValueError on
    // empty Series/array/DataFrame entries (test_expand_grid.py
    // test_series_empty/test_numpy_zero_d/test_dataframe_empty)
    inputs.foreach { case (name, values) => require(values.nonEmpty,
      s"expand_grid: entry '$name' is empty") }
    inputs.map { case (name, values) =>
      val dt: DataType = values.head match {
        case _: Int => IntegerType
        case _: Long => LongType
        case _: Double => DoubleType
        case _: Boolean => BooleanType
        case _: String => StringType
        case _: java.sql.Timestamp => TimestampType
        case _: java.sql.Date => DateType
        case other => throw new IllegalArgumentException(
          s"expand_grid: unsupported value type ${other.getClass}")
      }
      spark.createDataFrame(
        values.map(v => org.apache.spark.sql.Row(v)).asJava,
        StructType(Seq(StructField(name, dt))))
    }.reduce(_.crossJoin(_))
  }

  /** DataFrame-valued `others` form of expand_grid (reference:
    * janitor/functions/expand_grid.py; tests/functions/test_expand_grid.py
    * test_series_dataframe/test_chain_df): each entry's columns are
    * prefixed `key_column` — the flat-name analog of the reference's
    * (key, column) MultiIndex (§1.1 normal form, collapse_levels
    * precedent) — and the frames cross-join in entry order. At scale the
    * small sides should be the later entries: Catalyst broadcasts them
    * (BroadcastNestedLoopJoin) under the cartesian product.
    */
  def expandGridFrames(frames: Seq[(String, DataFrame)]): DataFrame = {
    require(frames.nonEmpty, "expand_grid: empty input")
    val dups = frames.map(_._1).diff(frames.map(_._1).distinct).distinct
    require(dups.isEmpty, s"expand_grid: duplicate keys ${dups.mkString(", ")}")
    // empty frame entries raise like the reference ValueError
    // (test_expand_grid.py test_dataframe_empty); isEmpty is a limit-1 probe
    frames.foreach { case (key, d) => require(!d.isEmpty,
      s"expand_grid: entry '$key' is empty") }
    frames.map { case (key, d) =>
      d.select(d.columns.map(c => col(s"`$c`").as(s"${key}_$c")).toIndexedSeq: _*)
    }.reduce(_.crossJoin(_))
  }

  /** Keyless frame cross — the reference's `cartesian_product`
    * (expand_grid.py:406; tests/functions/test_cartesian_product.py): raw
    * rows crossed (duplicates kept), labels used as-is, and a duplicate
    * label across inputs raises eagerly. [[expandGridFrames]] is the keyed
    * ({key}_{col}) expand_grid form of the same cross.
    */
  def cartesianProduct(frames: Seq[DataFrame]): DataFrame = {
    require(frames.nonEmpty, "cartesian_product: empty input")
    val all = frames.flatMap(_.columns)
    val dups = all.diff(all.distinct).distinct
    require(dups.isEmpty,
      s"cartesian_product: label(s) ${dups.mkString(", ")} duplicated across inputs")
    frames.reduce(_.crossJoin(_))
  }

  /** Cartesian product of the distinct values of given columns, from the data
    * itself (reference: janitor/functions/expand_grid.py:141-405).
    */
  def expand(df: DataFrame, columns: Seq[String]): DataFrame =
    columns.map(c => df.select(col(s"`$c`")).distinct()).reduce(_.crossJoin(_))

  /** Grouped expand (reference: expand_grid.py:141-405 `by=` form): the
    * cartesian product of the distinct values is taken WITHIN each `by`
    * group — distinct (by, col) frames equi-joined on the group key, so
    * the cross product never leaves the group and the plan shuffles only
    * on `by`.
    */
  def expandBy(df: DataFrame, by: Seq[String], columns: Seq[String]): DataFrame =
    columns.map(c => df.select((by :+ c).map(n => col(s"`$n`")): _*).distinct())
      .reduce((a, b) => a.join(b, by))

  /** tidyr-`nesting()` expand: each inner Seq is a NESTED column group —
    * only its OBSERVED distinct combinations appear — and the groups are
    * crossed against each other (reference: complete.py/expand accept
    * lists/tuples/DataFrames as grouped specs; tests/functions/
    * test_complete.py:407-436 "multiple groupings"). The flat [[expand]]
    * is the all-singleton special case. Each group is one distinct()
    * aggregation; the cross join multiplies group-combination counts, not
    * raw rows.
    */
  def expandNested(df: DataFrame, groups: Seq[Seq[String]]): DataFrame = {
    require(groups.nonEmpty && groups.forall(_.nonEmpty),
      "expand: empty group spec")
    val flat = groups.flatten
    require(flat.distinct.length == flat.length,
      s"expand: column(s) ${flat.diff(flat.distinct).distinct.mkString(", ")} " +
        "appear in more than one group (the reference raises for duplicate specs)")
    groups.map(g => df.select(g.map(c => col(s"`$c`")): _*).distinct())
      .reduce(_.crossJoin(_))
  }

  /** Mixed expand (reference: expand accepts column labels, lists AND
    * dict/Index value sets in one call — tests/functions/test_expand.py
    * test_various): nested data-derived groups cross against explicit
    * literal value sets, e.g. expand("a", nesting(...), {"year": 1..4}).
    */
  def expandMixed(df: DataFrame, groups: Seq[Seq[String]],
      literals: Seq[(String, Seq[Any])]): DataFrame = {
    require(groups.nonEmpty || literals.nonEmpty, "expand: empty spec")
    val dataUnits = groups.map(g =>
      df.select(g.map(c => col(s"`$c`")): _*).distinct())
    val litUnits = literals.map(l => expandGrid(df.sparkSession, Seq(l)))
    (dataUnits ++ litUnits).reduce(_.crossJoin(_))
  }

  /** Expose implicit-missing rows: expand the key universe, left-join the
    * data back, fill (reference: janitor/functions/complete.py:13-342).
    * fillValue fills only the value columns; explicitOnlyNew=true (reference
    * explicit=False) fills only rows created by the expansion, using the
    * join-side indicator.
    */
  def complete(df: DataFrame, columns: Seq[String],
      fillValue: Map[String, Any] = Map.empty,
      explicitOnlyNew: Boolean = false): DataFrame =
    completeNested(df, columns.map(Seq(_)), fillValue, explicitOnlyNew)

  /** [[complete]] with tidyr-nesting groups: the universe is
    * [[expandNested]] (observed combinations within each group, crossed
    * between groups) instead of the full per-column cross. `literals` is
    * the reference's dict form ({column: values}, complete.py:278) — the
    * provided values become that column's universe, UNIONed with the
    * observed ones (the reference merges how="outer", complete.py:292, so
    * observed combinations outside the provided universe survive). `by`
    * completes WITHIN each group (complete.py `by=`): every unit carries
    * the `by` keys and units equi-join on them, so the cross product never
    * leaves the group. The reference's `sort` flag is presentation-only
    * and has no meaning on an unordered Dataset.
    */
  def completeNested(df: DataFrame, groups: Seq[Seq[String]],
      fillValue: Map[String, Any] = Map.empty,
      explicitOnlyNew: Boolean = false,
      by: Seq[String] = Nil,
      literals: Seq[(String, Seq[Any])] = Nil): DataFrame = {
    // eager error contract (complete.py:270-276): fill_value keys must be
    // existing columns (non-scalar values are unrepresentable in the Map)
    fillValue.keys.foreach(c => require(df.columns.contains(c),
      s"complete: fill_value key $c should be a column in the DataFrame"))
    (by ++ literals.map(_._1)).foreach(c => require(df.columns.contains(c),
      s"complete: $c not found in the DataFrame"))
    val flat = groups.flatten ++ literals.map(_._1)
    require(flat.distinct.length == flat.length,
      s"complete: column(s) ${flat.diff(flat.distinct).distinct.mkString(", ")} " +
        "appear in more than one spec")
    val dataUnits = groups.map(g =>
      df.select((by ++ g).map(c => col(s"`$c`")): _*).distinct())
    val litUnits = literals.map { l =>
      val u = expandGrid(df.sparkSession, Seq(l))
      if (by.isEmpty) u
      else df.select(by.map(c => col(s"`$c`")): _*).distinct().crossJoin(u)
    }
    val universe = (dataUnits ++ litUnits).reduce((a, b) =>
      if (by.isEmpty) a.crossJoin(b) else a.join(b, by))
    completeAgainst(df, universe, by ++ flat, fillValue, explicitOnlyNew)
  }

  /** Per-group integral range completion — the Spark-native form of the
    * reference's `complete({col: lambda grp: range(grp.min(), grp.max()+1)},
    * by=...)` callable (tests/functions/test_complete.py:514-541): the
    * universe is sequence(min, max, step) per `by` group, one aggregation +
    * explode, no driver collect at any group cardinality.
    */
  def completeRange(df: DataFrame, rangeCol: String, by: Seq[String] = Nil,
      step: Long = 1, fillValue: Map[String, Any] = Map.empty,
      explicitOnlyNew: Boolean = false): DataFrame = {
    require(df.columns.contains(rangeCol), s"complete: $rangeCol not found")
    val c = col(s"`$rangeCol`")
    val bounds =
      if (by.isEmpty) df.agg(min(c).as("__mn"), max(c).as("__mx"))
      else df.groupBy(by.map(n => col(s"`$n`")): _*)
        .agg(min(c).as("__mn"), max(c).as("__mx"))
    // cast the step to the column's own type: a long literal would coerce
    // an int range column to long and silently change the output dtype
    val universe = bounds
      .filter(col("__mn").isNotNull)
      .select(by.map(n => col(s"`$n`")) :+
        explode(sequence(col("__mn"), col("__mx"),
          lit(step).cast(df.schema(rangeCol).dataType))).as(rangeCol): _*)
    completeAgainst(df, universe, by :+ rangeCol, fillValue, explicitOnlyNew)
  }

  /** Shared complete assembly (complete.py:286-342): outer merge of the
    * universe against the data with NULL-SAFE key equality (pandas keeps
    * NaN as a real key level — a plain equi-join would orphan observed
    * rows with null keys), original column order, fill restricted to the
    * non-combination columns, explicit=False filling only universe-created
    * rows.
    */
  private def completeAgainst(df: DataFrame, universe: DataFrame,
      mergeCols: Seq[String], fillValue: Map[String, Any],
      explicitOnlyNew: Boolean): DataFrame = {
    val keys = mergeCols.distinct
    val marked = df.withColumn("__present", lit(1))
    val u = universe.alias("u")
    val m = marked.alias("m")
    val joined = u.join(m,
      keys.map(c => col(s"u.`$c`") <=> col(s"m.`$c`")).reduce(_ && _),
      "full_outer")
    val valueCols = df.columns.filterNot(keys.contains(_)).toSeq
    val assembled = joined.select(
      df.columns.toSeq.map { c =>
        if (keys.contains(c)) coalesce(col(s"u.`$c`"), col(s"m.`$c`")).as(c)
        else col(s"m.`$c`")
      } :+ col("m.`__present`").as("__present"): _*)
    // fill applies only to columns outside the combination (complete.py:309)
    val filled = fillValue.filter(kv => valueCols.contains(kv._1))
      .foldLeft(assembled) { case (acc, (c, v)) =>
        if (explicitOnlyNew)
          acc.withColumn(c, when(col("__present").isNull, lit(v)).otherwise(col(s"`$c`")))
        else
          acc.withColumn(c, coalesce(col(s"`$c`"), lit(v)))
      }
    filled.drop("__present")
  }
}
