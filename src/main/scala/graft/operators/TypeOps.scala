package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DataType

/** Type conversion / encoding verbs (SURVEY §2.8). */
object TypeOps {

  /** Cast with failure policy (reference: janitor/functions/change_type.py:19).
    * ignoreException: "none" (strict cast), "fillna" (null on failure via
    * try_cast), "keep_values" (pandas `astype(dtype, errors="ignore")`,
    * which is all-or-nothing AT COLUMN LEVEL: if any value fails to convert
    * the ENTIRE column is returned unchanged — original dtype, original
    * values; only a fully-castable column changes dtype). The decision
    * needs one bounded extra pass: an existence probe (`filter(...)
    * .isEmpty` ≡ limit-1, early-exits per partition) whose predicate is a
    * codegen'd try_cast — linear scan worst case, O(1) result. Nulls count
    * as castable (null → null), matching SQL cast semantics.
    *
    * NOTE: "keep_values" runs that probe EAGERLY (one Spark action inside
    * an otherwise-lazy transformation) — the all-or-nothing decision cannot
    * be expressed per-row. It is therefore rejected on streaming frames,
    * where no such global decision exists; use "fillna" there.
    */
  def changeType(df: DataFrame, column: String, dtype: String,
      ignoreException: String = "none"): DataFrame = {
    val c = col(s"`$column`")
    ignoreException match {
      case "none" => df.withColumn(column, c.cast(dtype))
      case "fillna" => df.withColumn(column, c.try_cast(dtype))
      case "keep_values" =>
        require(!df.isStreaming, "change_type: ignore_exception=keep_values " +
          "needs an eager all-or-nothing probe and cannot run on a " +
          "streaming DataFrame; use \"fillna\"")
        val anyFailure = !df.filter(c.isNotNull && c.try_cast(dtype).isNull).isEmpty
        if (anyFailure) df else df.withColumn(column, c.cast(dtype))
      case other => throw new IllegalArgumentException(s"change_type: bad ignore_exception $other")
    }
  }

  /** List form of change_type (change_type.py accepts a column list /
    * Index; tests/functions/test_change_type.py test_multiple_columns);
    * each column converts independently, so keep_values keeps only the
    * failing column's values.
    */
  def changeTypes(df: DataFrame, columns: Seq[String], dtype: String,
      ignoreException: String = "none"): DataFrame =
    columns.foldLeft(df)((d, c) => changeType(d, c, dtype, ignoreException))

  /** (reference: janitor/functions/to_datetime.py:19) */
  def toDatetime(df: DataFrame, column: String, format: Option[String] = None): DataFrame =
    df.withColumn(column,
      format.map(f => to_timestamp(col(s"`$column`"), f)).getOrElse(to_timestamp(col(s"`$column`"))))

  /** Excel serial day → timestamp, origin 1899-12-30
    * (reference: janitor/functions/convert_date.py:12; polars precedent
    * janitor/polars/dates_to_polars.py:19).
    */
  def convertExcelDate(df: DataFrame, column: String): DataFrame =
    df.withColumn(column,
      timestamp_seconds(col(s"`$column`").cast("double") * 86400d +
        lit(java.time.LocalDate.of(1899, 12, 30).toEpochDay * 86400d)))

  /** MATLAB datenum → timestamp (reference: janitor/functions/convert_date.py:60).
    * datenum 719529 == 1970-01-01, fractional days supported.
    */
  def convertMatlabDate(df: DataFrame, column: String): DataFrame =
    df.withColumn(column,
      timestamp_seconds((col(s"`$column`").cast("double") - 719529d) * 86400d))

  /** Epoch seconds → timestamp (reference: janitor/functions/convert_date.py:113). */
  def convertUnixDate(df: DataFrame, column: String): DataFrame =
    df.withColumn(column, timestamp_seconds(col(s"`$column`").cast("double")))

  /** Truncate every timestamp column to a precision ∈
    * YEAR|MONTH|DAY|HOUR|MINUTE|SECOND (reference:
    * janitor/functions/truncate_datetime.py:10,55-77).
    */
  def truncateDatetime(df: DataFrame, precision: String): DataFrame = {
    val part = precision.toUpperCase match {
      case "YEAR" => "year"; case "MONTH" => "month"; case "DAY" => "day"
      case "HOUR" => "hour"; case "MINUTE" => "minute"; case "SECOND" => "second"
      case other => throw new IllegalArgumentException(s"truncate_datetime: bad precision $other")
    }
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case org.apache.spark.sql.types.TimestampType =>
          date_trunc(part, col(s"`${f.name}`")).as(f.name)
        case _ => col(s"`${f.name}`")
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Integer codes per distinct value (reference:
    * janitor/functions/factorize_columns.py:12; kernel functions/utils.py:231-243).
    * First-seen order needs an ordering column in a distributed setting; codes
    * are assigned by rank of min(orderCol) per value via a two-phase prefix
    * sum ([[ScaleWindows.runningSum]]) — no single-partition window even when
    * the column is a high-cardinality id. The join back is deliberately NOT
    * hinted: AQE broadcasts the codes table at runtime when it is actually
    * small, and falls back to a shuffle join when it isn't (an unconditional
    * broadcast OOMed executors on high-cardinality columns).
    */
  def factorizeColumns(df: DataFrame, column: String, orderCol: String,
      suffix: String = "_enc"): DataFrame = {
    // unknown column raises eagerly (factorize_columns.py check_column;
    // test_single_column_fail_factorize_columns)
    require(df.columns.contains(column),
      s"factorize_columns: column '$column' not in dataframe")
    // pd.factorize parity (empirically verified against the reference):
    // null/NaN gets code -1 and does NOT occupy a code slot — codes rank
    // only the non-null uniques in first-appearance order
    val c = col(s"`$column`")
    val isNullish = df.schema(column).dataType match {
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType => c.isNull || isnan(c)
      case _ => c.isNull
    }
    val firstSeen = df.filter(!isNullish).groupBy(c.as("__v"))
      .agg(min(col(s"`$orderCol`")).as("__first"))
      .withColumn("__one", lit(1L))
    val codes = ScaleWindows.runningSum(firstSeen, "__first", "__one", "__rank")
      .select(col("__v"), (col("__rank") - 1).cast("int").as("__code"))
    df.join(codes, df(column) === codes("__v"), "left")
      .drop("__v")
      .withColumn(column + suffix, coalesce(col("__code"), lit(-1)))
      .drop("__code")
  }

  /** Currency string → numeric (reference:
    * janitor/functions/currency_column_to_numeric.py:12). Accounting style:
    * strip currency symbols/commas, parentheses mean negative.
    */
  /** Full reference surface (currency_column_to_numeric.py:95-176):
    * cleaningStyle None = the DEFAULT style (extract [-.0-9], originally
    * empty strings stay null even under fill, castNonNumeric maps exact
    * strings, fillAllNonNumeric fills coerced-to-empty values,
    * removeNonNumeric drops coerced rows but keeps originally-empty ones);
    * Some("accounting") = strip/de-comma/parens-to-negative with the bare
    * "-" meaning 0.0. Any other style raises, like the reference
    * ValueError. One divergence by engine nature: values the accounting
    * cast cannot parse become null (pandas astype(float) raises — a
    * per-row raise has no lazy distributed analog).
    */
  def currencyColumnToNumeric(df: DataFrame, column: String,
      cleaningStyle: Option[String] = None,
      castNonNumeric: Map[String, Double] = Map.empty,
      fillAllNonNumeric: Option[Double] = None,
      removeNonNumeric: Boolean = false): DataFrame = {
    val c = col(s"`$column`")
    cleaningStyle match {
      case Some("accounting") =>
        val t = regexp_replace(trim(c), ",", "")
        val repl = regexp_replace(regexp_replace(t, "\\)", ""), "\\(", "-")
        df.withColumn(column,
          when(repl === "-", lit(0.0d)).otherwise(repl.try_cast("double")))
      case None =>
        val isOrigEmpty = c === ""
        val extracted = regexp_replace(c, "[^0-9.\\-]", "")
        val inMap = castNonNumeric.keys.toSeq.sorted
          .map(k => c === lit(k)).foldLeft(lit(false))(_ || _)
        val mapped = castNonNumeric.toSeq.sortBy(_._1)
          .foldLeft(Option.empty[Column]) {
            case (None, (k, v)) => Some(when(c === lit(k), lit(v)))
            case (Some(acc), (k, v)) => Some(acc.when(c === lit(k), lit(v)))
          }.getOrElse(lit(null).cast("double"))
        val coercedEmpty = !isOrigEmpty && !inMap && c.isNotNull &&
          (extracted === "")
        // the reference drops rows whose value COERCED to empty — rows
        // that were originally empty (the ORIGINAL_NA sentinel) stay; the
        // cleaning projection is shared so the two paths cannot drift
        val base = if (removeNonNumeric) df.filter(!coercedEmpty) else df
        base.withColumn(column,
          when(isOrigEmpty, lit(null).cast("double"))
            .when(inMap, mapped)
            .when(coercedEmpty,
              fillAllNonNumeric.map(lit(_)).getOrElse(lit(null)).cast("double"))
            .otherwise(extracted.try_cast("double")))
      case Some(other) => throw new IllegalArgumentException(
        s"cleaning_style is expected to be one of ('accounting', None). Got '$other'")
    }
  }

  /** Round to nearest 1/denominator (reference:
    * janitor/functions/round_to_fraction.py:14).
    */
  def roundToFraction(df: DataFrame, column: String, denominator: Double,
      digits: Option[Int] = None): DataFrame = {
    // reference raises for denominator <= 0 (test_round_to_fraction.py:30-38);
    // rounding divergence note: np.round is banker's, Spark round is
    // half-up — differs only for products landing exactly on .5
    require(denominator > 0,
      s"round_to_fraction: denominator must be > 0, got $denominator")
    val c = round(col(s"`$column`") * denominator) / denominator
    df.withColumn(column, digits.map(d => round(c, d)).getOrElse(c))
  }

  /** Labeled fixed-width bins (reference: janitor/functions/bin_numeric.py:19,
    * a thin pd.cut wrapper). Pure expression, no MLlib fit pass — scales and
    * streams. Bin assignment is pd.cut's with explicit uniform edges
    * lo..hi and include_lowest: intervals are RIGHT-closed ((e, e+w], the
    * first one [lo, lo+w]), and values outside [lo, hi] bin to null like
    * pd.cut's NaN — the round-18 differential gate caught the previous
    * floor/left-closed convention diverging from the reference on every
    * integral edge value. `labels` is pd.cut's labels kwarg: one per bin,
    * wrong length raises (pd.cut ValueError). retbins has no lazy analog
    * and is unsupported by design.
    */
  def binNumeric(df: DataFrame, column: String, newColumnName: String,
      lo: Double, hi: Double, bins: Int, labels: Seq[String] = Nil): DataFrame = {
    require(labels.isEmpty || labels.length == bins,
      s"bin_numeric: number of labels (${labels.length}) must equal number " +
        s"of bins ($bins)")
    val c = col(s"`$column`")
    val width = (hi - lo) / bins
    // v == lo lands in bin 0 via the greatest() clamp (include_lowest)
    val idx = least(greatest(ceil((c - lo) / width).cast("int") - 1, lit(0)),
      lit(bins - 1))
    val out =
      if (labels.isEmpty) idx
      else element_at(array(labels.map(lit): _*), idx + 1)
    df.withColumn(newColumnName,
      when(c.isNull || c < lo || c > hi, null).otherwise(out))
  }

  /** pd.cut-parity form of bin_numeric (reference: bin_numeric.py wraps
    * pd.cut; empirically verified against it): with an integer bin count,
    * edges come from the DATA min/max (linspace), intervals are
    * RIGHT-closed, and the lowest value is included (pandas stretches the
    * first edge by 0.1% of the range). The bin index is
    * ceil((v - min)/w) - 1 clamped to [0, bins-1] — exactly pd.cut's
    * assignment for uniform integer bins (v = min lands in bin 0, each
    * edge value in the LOWER bin). One bounded min/max aggregate + one
    * codegen projection. Without labels the column is the 0-based bin
    * code (pandas' Interval dtype has no Spark analog — documented
    * divergence, same class as categorical dtype).
    */
  def binNumericCut(df: DataFrame, column: String, newColumnName: String,
      bins: Int, labels: Seq[String] = Nil): DataFrame = {
    require(bins > 0, s"bin_numeric: bins must be positive, got $bins")
    require(labels.isEmpty || labels.length == bins,
      s"bin_numeric: number of labels (${labels.length}) must equal number " +
        s"of bins ($bins)")
    val c = col(s"`$column`")
    // NaN must not poison the edges: Spark's max() ranks NaN ABOVE every
    // double, so one NaN would make mx (and then w/idx) NaN and collapse
    // every row into bin 0 — pd.cut derives edges from the non-NaN values
    // and emits NaN for the NaN rows. Mask NaN out of the aggregate and
    // null the output for NaN inputs (same pattern as dropConstantColumns).
    val cd = c.cast("double")
    val cClean = when(isnan(cd), null).otherwise(cd)
    val row = df.agg(min(cClean), max(cClean)).collect()(0)
    // all-null / all-NaN / empty input: every bin is null, like pd.cut
    if (row.isNullAt(0))
      return df.withColumn(newColumnName,
        lit(null).cast(if (labels.isEmpty) "int" else "string"))
    val (mn, mx) = (row.getDouble(0), row.getDouble(1))
    // degenerate single-value range: pandas widens by ±0.1%; every row
    // falls in one bin — bin 0 here
    val w = if (mx > mn) (mx - mn) / bins else 1.0
    val idx = least(greatest(ceil((c - mn) / w).cast("int") - 1, lit(0)),
      lit(bins - 1))
    val out =
      if (labels.isEmpty) idx
      else element_at(array(labels.map(lit): _*), idx + 1)
    df.withColumn(newColumnName, when(c.isNull || isnan(cd), null).otherwise(out))
  }

  /** Scale to [newMin,newMax] (reference:
    * janitor/functions/min_max_scale.py:21,150-191). One min/max aggregate
    * (driver scalar) + arithmetic projection.
    */
  def minMaxScale(df: DataFrame, column: String, newMin: Double = 0d,
      newMax: Double = 1d, destColumn: Option[String] = None): DataFrame = {
    // the reference validates feature_range eagerly: ascending 2-tuple
    // (min_max_scale.py `feature_range` check; test_min_max_new_min_max_errors
    // [2, 1] case)
    require(newMin < newMax,
      s"min_max_scale: feature_range must be ascending, got ($newMin, $newMax)")
    val row = df.agg(min(col(s"`$column`")).cast("double").as("mn"),
      max(col(s"`$column`")).cast("double").as("mx")).collect()(0)
    // all-null column / empty frame: min/max are null — pandas yields NaN,
    // not a crash (min_max_scale.py scales NaN to NaN)
    val mn = if (row.isNullAt(0)) Double.NaN else row.getDouble(0)
    val mx = if (row.isNullAt(1)) Double.NaN else row.getDouble(1)
    val scaled = (col(s"`$column`") - mn) * ((newMax - newMin) / (mx - mn)) + newMin
    df.withColumn(destColumn.getOrElse(column), scaled)
  }

  /** Multi-column min_max_scale with pandas-parity `jointly`
    * (reference: min_max_scale.py:150-191): jointly=false scales each column
    * by its own (min, max); jointly=true scales every column by the single
    * whole-frame (min of mins, max of maxes) — the `_min_max_value` path.
    * Still ONE bounded aggregate job (2×columns scalars) either way.
    */
  def minMaxScaleColumns(df: DataFrame, columns: Seq[String],
      newMin: Double = 0d, newMax: Double = 1d,
      jointly: Boolean = false): DataFrame = {
    require(columns.nonEmpty, "min_max_scale: no columns")
    require(newMin < newMax,
      s"min_max_scale: feature_range must be ascending, got ($newMin, $newMax)")
    val aggs = columns.flatMap(c => Seq(
      min(col(s"`$c`")).cast("double").as(s"__mn_$c"),
      max(col(s"`$c`")).cast("double").as(s"__mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    // all-null columns produce null min/max → NaN (pandas yields NaN columns)
    val perCol = columns.zipWithIndex.map { case (c, i) =>
      val mn = if (row.isNullAt(2 * i)) Double.NaN else row.getDouble(2 * i)
      val mx = if (row.isNullAt(2 * i + 1)) Double.NaN else row.getDouble(2 * i + 1)
      c -> (mn, mx)
    }.toMap
    // joint extremes skip all-null columns, like pandas min/max skipna
    val mns = perCol.values.map(_._1).filterNot(_.isNaN)
    val mxs = perCol.values.map(_._2).filterNot(_.isNaN)
    val gMn = if (mns.nonEmpty) mns.min else Double.NaN
    val gMx = if (mxs.nonEmpty) mxs.max else Double.NaN
    columns.foldLeft(df) { (acc, c) =>
      val (mn, mx) = if (jointly) (gMn, gMx) else perCol(c)
      acc.withColumn(c,
        (col(s"`$c`") - mn) * ((newMax - newMin) / (mx - mn)) + newMin)
    }
  }

  /** Add N(0, scale) noise with optional clip (reference:
    * janitor/functions/jitter.py:13). Seeded but not pandas-bit-equal —
    * distributional tests only (SURVEY §7.3.6).
    */
  def jitter(df: DataFrame, column: String, destColumn: String, scale: Double,
      clip: Option[(Double, Double)] = None, seed: Long = 42L): DataFrame = {
    // the reference's eager checks (jitter.py; test_datatypes_check):
    // positive scale, ascending clip bounds
    require(scale > 0, s"jitter: `scale` must be greater than 0, got $scale")
    clip.foreach { case (lo, hi) => require(lo < hi,
      s"jitter: `clip[0]` must be less than `clip[1]`, got ($lo, $hi)") }
    // the column to jitter must be numeric (test_datatypes_check)
    require(df.schema(column).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"jitter: column '$column' must be numeric, got ${df.schema(column).dataType.sql}")
    val noisy = col(s"`$column`") + randn(seed) * scale
    val clipped = clip.map { case (lo, hi) =>
      least(greatest(noisy, lit(lo)), lit(hi))
    }.getOrElse(noisy)
    df.withColumn(destColumn, clipped)
  }

  /** Record declared categories for a column (reference:
    * janitor/functions/encode_categorical.py:16,150-166). Spark has no
    * categorical dtype (SURVEY §1.2): the registry is column metadata, data
    * stays StringType. `complete`/`pivot_wider(expand)` read it back.
    */
  def encodeCategorical(df: DataFrame, column: String, categories: Seq[String],
      ordered: Boolean = false, checkValues: Boolean = false): DataFrame = {
    // explicit categories must be non-empty, unique, and null-free
    // (encode_categorical.py kwargs checks; test_empty_cat /
    // test_non_unique_cat / test_categories_null_in_categories)
    require(categories.nonEmpty, "encode_categorical: categories is empty")
    require(categories.forall(_ != null),
      "encode_categorical: categories contains nulls")
    require(categories.distinct.length == categories.length,
      "encode_categorical: categories are not unique")
    val c = col(s"`$column`")
    // pandas astype(CategoricalDtype(categories)) NULLS values outside the
    // category set — the registry stamp alone would silently keep them
    // (round-17 fidelity sweep). checkValues reproduces the reference's
    // UserWarning when column values are missing from the categories
    // (encode_categorical.py:241-258 — both reference branches warn in
    // that ONE direction only) with ONE bounded aggregate, and ADDS an
    // engine-side warning for the reverse case (provided categories that
    // never occur), which the reference does not emit. Off by default to
    // keep the stamp free of an eager scan.
    if (checkValues) {
      val row = df.agg(
        sum(when(c.isNotNull && !c.cast("string").isin(categories: _*), 1L)
          .otherwise(0L)).as("bad"),
        countDistinct(when(c.cast("string").isin(categories: _*),
          c.cast("string"))).as("seen"),
        count(c).as("nonnull")).collect()(0)
      val bad = if (row.isNullAt(0)) 0L else row.getLong(0)
      val seen = if (row.isNullAt(1)) 0L else row.getLong(1)
      // the reference raises BEFORE any mismatch warning when the column
      // has no non-null values at all (encode_categorical.py:233-238
      // uniques.empty; test_empty_col) — an all-null column cannot anchor
      // a category comparison
      require(row.getLong(2) > 0L,
        s"encode_categorical: kindly ensure there is at least one " +
          s"non-null value in $column")
      if (bad > 0) System.err.println(s"[graft] WARNING encode_categorical: " +
        s"$bad value(s) in $column are missing from the provided categories " +
        "and will be set to null")
      if (seen < categories.length) System.err.println(
        s"[graft] WARNING encode_categorical: ${categories.length - seen} " +
          s"provided categor(ies) never occur in $column")
    }
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putStringArray("graft.categories", categories.toArray)
      .putBoolean("graft.ordered", ordered)
      .build()
    df.withColumn(column,
      when(c.cast("string").isin(categories: _*), c).otherwise(lit(null))
        .as(column, meta))
  }

  /** Infer and register categories with pandas order semantics
    * (reference: encode_categorical.py:150-166): `order="sort"` →
    * factorize(sort=True), sorted distinct values; `order="appearance"` →
    * factorize(sort=False), first-seen order — which in a distributed frame
    * needs an explicit `orderCol` (same contract as [[factorizeColumns]]).
    * Both register as ordered, like the pandas CategoricalDtype(ordered=True).
    * The collect is bounded by the distinct-category universe — a registry is
    * driver-side column metadata by design (SURVEY §1.2), so its size is a
    * metadata budget, not a data budget.
    */
  def encodeCategoricalOrder(df: DataFrame, column: String, order: String,
      orderCol: Option[String] = None): DataFrame = {
    val c = col(s"`$column`")
    val cats: Seq[String] = order match {
      case "sort" =>
        df.filter(c.isNotNull).select(c.cast("string").as("__c")).distinct()
          .orderBy(col("__c")).collect().map(_.getString(0)).toSeq
      case "appearance" =>
        val oc = orderCol.getOrElse(throw new IllegalArgumentException(
          "encode_categorical(order='appearance') needs an ordering column in a distributed frame"))
        df.filter(c.isNotNull)
          .groupBy(c.cast("string").as("__c"))
          .agg(min(col(s"`$oc`")).as("__first"))
          .orderBy(col("__first"))
          .collect().map(_.getString(0)).toSeq
      case other =>
        throw new IllegalArgumentException(s"encode_categorical: bad order '$other'")
    }
    require(cats.nonEmpty,
      s"encode_categorical: kindly ensure there is at least one non-null value in $column")
    encodeCategorical(df, column, cats, ordered = true)
  }

  /** Align category universes across frames before a union (reference:
    * janitor/functions/utils.py:40-137 unionize_dataframe_categories):
    * merge the registries, re-stamp each frame.
    */
  def unionizeCategories(dfs: Seq[DataFrame], column: String): Seq[DataFrame] = {
    val merged = dfs.flatMap(d =>
      if (d.columns.contains(column)) categoriesOf(d, column).getOrElse(Nil)
      else Nil).distinct
    dfs.map(d =>
      if (d.columns.contains(column) && merged.nonEmpty)
        encodeCategorical(d, column, merged)
      else d)
  }

  /** The reference's full auto-detect form (utils.py
    * unionize_dataframe_categories, tests/functions/
    * test_unionize_dataframe_categories.py): for EVERY registered
    * categorical column present in any frame (or the `columnNames` subset),
    * union the registries across the frames that carry it and re-stamp
    * them; frames lacking the column — and columns without a registry —
    * are untouched, like pandas leaving non-categorical dtypes alone.
    */
  def unionizeAllCategories(dfs: Seq[DataFrame],
      columnNames: Seq[String] = Nil): Seq[DataFrame] = {
    val registered = dfs.flatMap(d => d.schema.fields
      .filter(_.metadata.contains("graft.categories")).map(_.name)).distinct
    val targets = if (columnNames.nonEmpty) columnNames else registered
    targets.foldLeft(dfs) { (acc, c) =>
      val merged = acc.flatMap(d =>
        if (d.columns.contains(c)) categoriesOf(d, c).getOrElse(Nil)
        else Nil).distinct
      acc.map(d =>
        if (merged.nonEmpty && d.columns.contains(c) &&
            categoriesOf(d, c).isDefined)
          encodeCategorical(d, c, merged)
        else d)
    }
  }

  /** Read back a category registry written by [[encodeCategorical]]. */
  def categoriesOf(df: DataFrame, column: String): Option[Seq[String]] = {
    val f = df.schema(column)
    if (f.metadata.contains("graft.categories"))
      Some(f.metadata.getStringArray("graft.categories").toSeq)
    else None
  }
}
