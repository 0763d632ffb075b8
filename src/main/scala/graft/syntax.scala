package graft

import org.apache.spark.sql.{Column, DataFrame}
import graft.operators._

/** The public verb surface: `import graft.syntax._` then chain
  * `df.cleanNames().filterOn("x > 1").groupbyAgg(...)` — the Spark-native
  * equivalent of pyjanitor's method chaining (reference registers each verb on
  * pd.DataFrame via pandas_flavor; janitor/functions/clean_names.py:17).
  * Every verb is lazy (returns a plan) unless its output schema is
  * data-dependent (SURVEY §7.7) — those perform one bounded action.
  */
object syntax {

  implicit class JanitorOps(val df: DataFrame) extends AnyVal {

    // §2.1 name hygiene
    def cleanNames(caseType: String = "lower", removeSpecial: Boolean = false,
        stripAccents: Boolean = true, stripUnderscores: Option[String] = None,
        truncateLimit: Int = 0): DataFrame =
      NameOps.cleanNames(df, caseType, removeSpecial, stripAccents, stripUnderscores, truncateLimit)
    def cleanNamesValues(columns: Seq[String], caseType: String = "lower",
        removeSpecial: Boolean = false, stripAccents: Boolean = true,
        stripUnderscores: Option[String] = None, truncateLimit: Int = 0): DataFrame =
      NameOps.cleanNamesValues(df, columns, caseType, removeSpecial,
        stripAccents, stripUnderscores, truncateLimit)
    def renameColumn(old: String, newName: String): DataFrame = NameOps.renameColumn(df, old, newName)
    def renameColumns(mapping: Map[String, String] = Map.empty, fn: Option[String => String] = None): DataFrame =
      NameOps.renameColumns(df, mapping, fn)
    def limitColumnCharacters(length: Int, sep: String = "_"): DataFrame =
      NameOps.limitColumnCharacters(df, length, sep)
    def rowToNames(orderCol: String, rowNumbers: Seq[Int], removeRows: Boolean = false,
        removeRowsAbove: Boolean = false, sep: String = "_"): DataFrame =
      NameOps.rowToNames(df, orderCol, rowNumbers, removeRows, removeRowsAbove, sep)
    def rowToNamesSlice(orderCol: String, start: Int, end: Int, step: Int = 1,
        removeRows: Boolean = false, removeRowsAbove: Boolean = false, sep: String = "_"): DataFrame =
      NameOps.rowToNamesSlice(df, orderCol, start, end, step, removeRows, removeRowsAbove, sep)
    def collapseLevels(sep: String = "_"): DataFrame = NameOps.collapseLevels(df, sep)
    def collapseLevelsWith(sep: Option[String] = None, glue: Option[String] = None): DataFrame =
      NameOps.collapseLevelsWith(df, sep, glue)
    def collapseLevelsRows(indexCols: Seq[String], sep: Option[String] = None,
        glue: Option[String] = None, into: String = "index"): DataFrame =
      NameOps.collapseLevelsRows(df, indexCols, sep, glue, into)
    def explodeIndex(sep: String = "_"): DataFrame = NameOps.explodeIndex(df, sep)
    def explodeIndexPattern(namesPattern: String): DataFrame =
      NameOps.explodeIndexPattern(df, namesPattern)

    // §2.2 selection
    def selectColumns(sels: ColumnSelector*): DataFrame = SelectOps.selectColumns(df, sels)
    def selectColumnsInvert(sels: ColumnSelector*): DataFrame = SelectOps.selectColumns(df, sels, invert = true)
    def selectRows(indexCol: String, sel: RowSelector, invert: Boolean = false): DataFrame =
      SelectOps.selectRows(df, indexCol, sel, invert)
    def selectBoth(indexCol: String, rows: Option[RowSelector] = None,
        columns: Seq[ColumnSelector] = Nil, invert: Boolean = false): DataFrame =
      SelectOps.select(df, indexCol, rows, columns, invert)
    def removeColumns(names: String*): DataFrame = SelectOps.removeColumns(df, names)
    def reorderColumns(first: String*): DataFrame = SelectOps.reorderColumns(df, first)
    def moveColumn(source: String, target: String, position: String = "before"): DataFrame =
      SelectOps.moveColumn(df, source, target, position)
    def moveColumns(source: Seq[ColumnSelector], target: Seq[ColumnSelector] = Nil,
        position: String = "before"): DataFrame =
      SelectOps.moveColumns(df, source, target, position)
    def moveRows(indexCol: String, source: Any, target: Any,
        position: String = "before", posCol: String = "row_pos"): DataFrame =
      SelectOps.moveRows(df, indexCol, source, target, position, posCol)
    def dropConstantColumns(): DataFrame = SelectOps.dropConstantColumns(df)
    def getIndexLabels(sels: ColumnSelector*): Seq[String] = SelectOps.getIndexLabels(df, sels)
    def getColumns(by: Seq[String], sels: ColumnSelector*): org.apache.spark.sql.RelationalGroupedDataset =
      SelectOps.getColumns(df, by, sels)
    def dropDuplicateColumns(name: String, nth: Int = 0): DataFrame =
      SelectOps.dropDuplicateColumns(df, name, nth)

    // §2.3 filters
    def filterString(column: String, searchString: String, regex: Boolean = true,
        caseSensitive: Boolean = true, complement: Boolean = false, naDefault: Boolean = false): DataFrame =
      FilterOps.filterString(df, column, searchString, regex, caseSensitive, complement, naDefault)
    def filterOn(criteria: String, complement: Boolean = false): DataFrame =
      FilterOps.filterOn(df, criteria, complement)
    def filterDate(column: String, startDate: Option[String] = None, endDate: Option[String] = None,
        years: Seq[Int] = Nil, months: Seq[Int] = Nil, days: Seq[Int] = Nil,
        format: Option[String] = None, columnFormats: Seq[String] = Nil): DataFrame =
      FilterOps.filterDate(df, column, startDate, endDate, years, months, days, format, columnFormats)
    def filterColumnIsin(column: String, values: Seq[Any], complement: Boolean = false): DataFrame =
      FilterOps.filterColumnIsin(df, column, values, complement)
    def dropNotNull(column: String): DataFrame = FilterOps.dropNotNull(df, column)
    def removeEmpty(): DataFrame = FilterOps.removeEmpty(df)
    def getDupes(subset: String*): DataFrame = FilterOps.getDupes(df, subset)
    def updateWhere(condition: String, targetColumn: String, targetVal: Any): DataFrame =
      FilterOps.updateWhere(df, condition, targetColumn, targetVal)

    // §2.5 grouped / window
    /** `dropna` follows the pandas groupby default (true): null-keyed rows get
      * a null transform instead of forming a group (groupby_agg.py:65-97). */
    def groupbyAgg(by: Seq[String], aggColumn: String, agg: String, newColumnName: String,
        dropna: Boolean = true): DataFrame =
      GroupedOps.groupbyAgg(df, by, aggColumn, agg, newColumnName, dropna)
    def groupbyAggSkewSafe(by: Seq[String], aggColumn: String, agg: String,
        newColumnName: String, dropna: Boolean = true): DataFrame =
      GroupedOps.groupbyAggSkewSafe(df, by, aggColumn, agg, newColumnName, dropna)
    def groupbyTopk(by: Seq[String], column: String, k: Int, ascending: Boolean = false,
        tiebreak: Seq[String] = Nil): DataFrame =
      GroupedOps.groupbyTopk(df, by, column, k, ascending, tiebreak)
    def takeFirst(subset: Seq[String], by: String, ascending: Boolean = true,
        tiebreak: Seq[String] = Nil): DataFrame =
      GroupedOps.takeFirst(df, subset, by, ascending, tiebreak)
    def countCumulativeUnique(column: String, orderCol: String, newColumnName: String,
        caseSensitive: Boolean = true): DataFrame =
      GroupedOps.countCumulativeUnique(df, column, orderCol, newColumnName, caseSensitive)
    def shuffleRows(seed: Long = 42L): DataFrame = GroupedOps.shuffle(df, seed)
    def sortNaturally(column: String): DataFrame = GroupedOps.sortNaturally(df, column)
    def sortColumnValueOrder(column: String, order: Seq[String]): DataFrame =
      GroupedOps.sortColumnValueOrder(df, column, order)
    def toSetOf(column: String): DataFrame = GroupedOps.toSet(df, column)

    // §2.7 missing data
    def fillDirection(columns: Map[String, String], orderCol: String,
        partitionBy: Seq[String] = Nil): DataFrame =
      FillOps.fillDirection(df, columns, orderCol, partitionBy)
    def fillEmpty(values: Map[String, Any]): DataFrame = FillOps.fillEmpty(df, values)
    def impute(column: String, statistic: Option[String] = None, value: Option[Any] = None): DataFrame =
      FillOps.impute(df, column, statistic, value)
    def coalesceColumns(columns: Seq[String], targetColumn: Option[String] = None,
        defaultValue: Option[Any] = None): DataFrame =
      FillOps.coalesceColumns(df, columns, targetColumn, defaultValue)
    def flagNulls(columnName: String = "null_flag", columns: Seq[String] = Nil): DataFrame =
      FillOps.flagNulls(df, columnName, columns)

    // §2.8 types / encodings
    def changeType(column: String, dtype: String, ignoreException: String = "none"): DataFrame =
      TypeOps.changeType(df, column, dtype, ignoreException)
    def changeTypes(columns: Seq[String], dtype: String, ignoreException: String = "none"): DataFrame =
      TypeOps.changeTypes(df, columns, dtype, ignoreException)
    def toDatetime(column: String, format: Option[String] = None): DataFrame =
      TypeOps.toDatetime(df, column, format)
    def convertExcelDate(column: String): DataFrame = TypeOps.convertExcelDate(df, column)
    def convertMatlabDate(column: String): DataFrame = TypeOps.convertMatlabDate(df, column)
    def convertUnixDate(column: String): DataFrame = TypeOps.convertUnixDate(df, column)
    def truncateDatetime(precision: String): DataFrame = TypeOps.truncateDatetime(df, precision)
    def factorizeColumns(column: String, orderCol: String, suffix: String = "_enc"): DataFrame =
      TypeOps.factorizeColumns(df, column, orderCol, suffix)
    def currencyColumnToNumeric(column: String,
        cleaningStyle: Option[String] = None,
        castNonNumeric: Map[String, Double] = Map.empty,
        fillAllNonNumeric: Option[Double] = None,
        removeNonNumeric: Boolean = false): DataFrame =
      TypeOps.currencyColumnToNumeric(df, column, cleaningStyle,
        castNonNumeric, fillAllNonNumeric, removeNonNumeric)
    def roundToFraction(column: String, denominator: Double, digits: Option[Int] = None): DataFrame =
      TypeOps.roundToFraction(df, column, denominator, digits)
    def binNumeric(column: String, newColumnName: String, lo: Double, hi: Double,
        bins: Int, labels: Seq[String] = Nil): DataFrame =
      TypeOps.binNumeric(df, column, newColumnName, lo, hi, bins, labels)
    def binNumericCut(column: String, newColumnName: String, bins: Int,
        labels: Seq[String] = Nil): DataFrame =
      TypeOps.binNumericCut(df, column, newColumnName, bins, labels)
    def minMaxScale(column: String, newMin: Double = 0d, newMax: Double = 1d,
        destColumn: Option[String] = None): DataFrame =
      TypeOps.minMaxScale(df, column, newMin, newMax, destColumn)
    def minMaxScaleColumns(columns: Seq[String], newMin: Double = 0d, newMax: Double = 1d,
        jointly: Boolean = false): DataFrame =
      TypeOps.minMaxScaleColumns(df, columns, newMin, newMax, jointly)
    def jitter(column: String, destColumn: String, scale: Double,
        clip: Option[(Double, Double)] = None, seed: Long = 42L): DataFrame =
      TypeOps.jitter(df, column, destColumn, scale, clip, seed)
    def encodeCategorical(column: String, categories: Seq[String], ordered: Boolean = false): DataFrame =
      TypeOps.encodeCategorical(df, column, categories, ordered)
    def encodeCategoricalOrder(column: String, order: String,
        orderCol: Option[String] = None): DataFrame =
      TypeOps.encodeCategoricalOrder(df, column, order, orderCol)

    // §2.5 accessor + §2.1/2.8 aliases
    def dataDescription(): DataFrame = DescribeOps.dataDescription(df)
    def setDescriptions(descs: Map[String, String]): DataFrame =
      DescribeOps.setDescriptions(df, descs)
    /** label_encode — deprecated alias of factorize (reference:
      * janitor/functions/label_encode.py:21). */
    def labelEncode(column: String, orderCol: String): DataFrame =
      TypeOps.factorizeColumns(df, column, orderCol, "_enc")
    /** change_index_dtype: the explicit ordering column IS the index
      * (SURVEY §1.1), so this is a cast of that column. */
    def changeIndexDtype(orderCol: String, dtype: String): DataFrame =
      TypeOps.changeType(df, orderCol, dtype)
    /** add_columns loops add_column, so the exists-raise propagates
      * (add_columns.py:146-208). */
    def addColumns(values: Map[String, Column]): DataFrame =
      values.foldLeft(df) { case (acc, (n, c)) => TransformOps.addColumn(acc, n, c) }

    // §2.9 transforms
    def caseWhenSql(targetColumn: String, condsAndValues: Seq[(String, Any)], default: Any): DataFrame =
      TransformOps.caseWhenSql(df, targetColumn, condsAndValues, default)
    def findReplace(column: String, mapping: Map[Any, Any], matchMode: String = "exact"): DataFrame =
      TransformOps.findReplace(df, column, mapping, matchMode)
    def findReplaceOrdered(column: String, mapping: Seq[(Any, Any)],
        matchMode: String = "exact"): DataFrame =
      TransformOps.findReplaceOrdered(df, column, mapping, matchMode)
    def transformColumn(column: String, f: Column => Column, destColumn: Option[String] = None): DataFrame =
      TransformOps.transformColumn(df, column, f, destColumn)
    def transformColumns(columns: Seq[String], f: Column => Column,
        suffix: Option[String] = None,
        newColumnNames: Map[String, String] = Map.empty): DataFrame =
      TransformOps.transformColumns(df, columns, f, suffix, newColumnNames)
    def addColumn(name: String, value: Column): DataFrame = TransformOps.addColumn(df, name, value)
    def addColumnIterable(name: String, values: Seq[Any], orderCol: String,
        fillRemaining: Boolean = false): DataFrame =
      TransformOps.addColumnIterable(df, name, values, orderCol, fillRemaining)
    def joinApply(f: Column, newColumnName: String): DataFrame = TransformOps.joinApply(df, f, newColumnName)
    def also(f: DataFrame => Unit): DataFrame = TransformOps.also(df, f)
    def processText(column: String, method: String, args: Seq[Any] = Nil): DataFrame =
      TextOps.processText(df, column, method, args)
    def concatenateColumns(columns: Seq[String], newColumnName: String, sep: String = "-",
        ignoreEmpty: Boolean = true): DataFrame =
      TextOps.concatenateColumns(df, columns, newColumnName, sep, ignoreEmpty)
    def deconcatenateColumn(column: String, sep: String, newColumnNames: Seq[String],
        preservePosition: Boolean = false, autoname: Option[String] = None,
        strict: Boolean = false): DataFrame =
      TextOps.deconcatenateColumn(df, column, sep, newColumnNames, preservePosition,
        autoname, strict)
    def expandColumn(column: String, sep: String = "|", concatDf: Boolean = true): DataFrame =
      TextOps.expandColumn(df, column, sep, concatDf)

    // §2.6 reshape
    def pivotLonger(index: Seq[String], namesTo: Seq[String] = Seq("variable"),
        valuesTo: String = "value", namesSep: Option[String] = None,
        namesPattern: Option[String] = None, columnNames: Seq[String] = Nil,
        dropna: Boolean = false, namesTransform: Map[String, String] = Map.empty): DataFrame =
      ReshapeOps.pivotLonger(df, index, namesTo, valuesTo, namesSep, namesPattern,
        columnNames, dropna, namesTransform)
    def pivotLongerMulti(index: Seq[String], namesTo: Seq[String], namesPatterns: Seq[String],
        dropna: Boolean = false): DataFrame =
      ReshapeOps.pivotLongerMulti(df, index, namesTo, namesPatterns, dropna)
    def pivotLongerValuesTo(index: Seq[String], namesTo: Seq[String], valuesTo: Seq[String],
        namesPatterns: Seq[String], columnNames: Seq[String] = Nil): DataFrame =
      ReshapeOps.pivotLongerValuesTo(df, index, namesTo, valuesTo, namesPatterns, columnNames)
    def pivotLongerDict(index: Seq[String], pattern: Seq[(String, String)]): DataFrame =
      ReshapeOps.pivotLongerDict(df, index, pattern)
    def pivotLongerNestedDict(index: Seq[String], pattern: Seq[(String, String, String)]): DataFrame =
      ReshapeOps.pivotLongerNestedDict(df, index, pattern)
    def pivotLongerNamedGroups(index: Seq[String], namesPattern: String,
        valuesTo: String = "value", columnNames: Seq[String] = Nil,
        dropna: Boolean = false, namesTransform: Map[String, String] = Map.empty): DataFrame =
      ReshapeOps.pivotLongerNamedGroups(df, index, namesPattern, valuesTo,
        columnNames, dropna, namesTransform)
    def pivotLongerSpec(index: Seq[String], spec: Seq[(String, String, Map[String, String])]): DataFrame =
      ReshapeOps.pivotLongerSpec(df, index, spec)
    def pivotWider(index: Seq[String], namesFrom: String, valuesFrom: String,
        agg: String = "first", namesPrefix: String = "", knownValues: Seq[String] = Nil,
        namesGlue: String = "", namesExpand: Boolean = false,
        indexExpand: Boolean = false): DataFrame =
      ReshapeOps.pivotWider(df, index, namesFrom, valuesFrom, agg, namesPrefix,
        knownValues, namesGlue, namesExpand, indexExpand)
    def pivotWiderMulti(index: Seq[String], namesFrom: String, valuesFrom: Seq[String],
        agg: String = "first", namesSep: String = "_", knownValues: Seq[String] = Nil,
        namesGlue: String = ""): DataFrame =
      ReshapeOps.pivotWiderMulti(df, index, namesFrom, valuesFrom, agg, namesSep,
        knownValues, namesGlue)
    def expand(columns: String*): DataFrame = ReshapeOps.expand(df, columns)
    def expandBy(by: Seq[String], columns: Seq[String]): DataFrame =
      ReshapeOps.expandBy(df, by, columns)
    def complete(columns: Seq[String], fillValue: Map[String, Any] = Map.empty,
        explicitOnlyNew: Boolean = false): DataFrame =
      ReshapeOps.complete(df, columns, fillValue, explicitOnlyNew)
    def expandMixed(groups: Seq[Seq[String]], literals: Seq[(String, Seq[Any])]): DataFrame =
      ReshapeOps.expandMixed(df, groups, literals)
    def expandNested(groups: Seq[Seq[String]]): DataFrame =
      ReshapeOps.expandNested(df, groups)
    def completeNested(groups: Seq[Seq[String]],
        fillValue: Map[String, Any] = Map.empty,
        explicitOnlyNew: Boolean = false,
        by: Seq[String] = Nil,
        literals: Seq[(String, Seq[Any])] = Nil): DataFrame =
      ReshapeOps.completeNested(df, groups, fillValue, explicitOnlyNew, by, literals)
    def completeRange(rangeCol: String, by: Seq[String] = Nil, step: Long = 1,
        fillValue: Map[String, Any] = Map.empty,
        explicitOnlyNew: Boolean = false): DataFrame =
      ReshapeOps.completeRange(df, rangeCol, by, step, fillValue, explicitOnlyNew)

    // §2.4 joins
    def conditionalJoin(right: DataFrame, conditions: Seq[operators.JoinOps.Cond],
        how: String = "inner", keep: String = "all", indicator: Boolean = false,
        indicatorName: String = "_merge", force: Boolean = false,
        dfColumns: Seq[String] = Seq("*"),
        rightColumns: Seq[String] = Seq("*")): DataFrame =
      JoinOps.conditionalJoin(df, right, conditions, how, keep, indicator,
        indicatorName, force, dfColumns, rightColumns)
    def getJoinIndices(right: DataFrame, leftId: Seq[String], rightId: Seq[String],
        conditions: Seq[operators.JoinOps.Cond], keep: String = "all",
        force: Boolean = false): DataFrame =
      JoinOps.getJoinIndices(df, right, leftId, rightId, conditions, keep, force)
    def rangeJoin(right: DataFrame, xCol: String, loCol: String, hiCol: String,
        bandWidth: Double, how: String = "inner", loInclusive: Boolean = true,
        hiInclusive: Boolean = true, dedupIntervals: String = "auto"): DataFrame =
      JoinOps.rangeJoin(df, right, xCol, loCol, hiCol, bandWidth, how, loInclusive,
        hiInclusive, dedupIntervals = dedupIntervals)
    def asofJoin(right: DataFrame, on: String, by: Seq[String] = Nil,
        direction: String = "backward", tolerance: Option[Double] = None,
        suffix: String = "_right", skewSafe: Boolean = false): DataFrame =
      JoinOps.asofJoin(df, right, on, by, direction, tolerance, suffix, skewSafe)
    def fuzzyJoin(right: DataFrame, leftCol: String, rightCol: String,
        maxDist: Int = 1): DataFrame =
      JoinOps.fuzzyJoin(df, right, leftCol, rightCol, maxDist)
    def fuzzySelfJoin(idCol: String, strCol: String, maxDist: Int = 1): DataFrame =
      JoinOps.fuzzySelfJoin(df, idCol, strCol, maxDist)

    // §2.12 timeseries
    def fillMissingTimestamps(tsCol: String, frequency: String,
        firstTimeStamp: Option[java.sql.Timestamp] = None,
        lastTimeStamp: Option[java.sql.Timestamp] = None): DataFrame =
      TimeseriesOps.fillMissingTimestamps(df, tsCol, frequency, firstTimeStamp, lastTimeStamp)
    def sortTimestampsMonotonically(tsCol: String, direction: String = "increasing",
        strict: Boolean = false, tiebreak: Seq[String] = Nil): DataFrame =
      TimeseriesOps.sortTimestampsMonotonically(df, tsCol, direction, strict, tiebreak)
    def sessionize(keyCol: String, tsCol: String, gapSeconds: Long): DataFrame =
      TimeseriesOps.sessionize(df, keyCol, tsCol, gapSeconds)
    def sessionStats(keyCol: String, tsCol: String, gapSeconds: Long): DataFrame =
      TimeseriesOps.sessionStats(df, keyCol, tsCol, gapSeconds)
    def funnel(keyCol: String, tsCol: String, typeCol: String,
        steps: Seq[String]): DataFrame =
      EventOps.funnel(df, keyCol, tsCol, typeCol, steps)
    def cohortRetention(keyCol: String, tsCol: String,
        period: String = "week"): DataFrame =
      EventOps.cohortRetention(df, keyCol, tsCol, period)
    def flagJumps(orderCol: String,
        default: TimeseriesOps.JumpCriteria = TimeseriesOps.JumpCriteria(),
        perColumn: Map[String, TimeseriesOps.JumpCriteria] = Map.empty,
        strict: Boolean = false): DataFrame =
      TimeseriesOps.flagJumps(df, orderCol, default, perColumn, strict)

    // §2.10 math (aggregate-normalized forms)
    def softmaxOf(column: String, dest: String): DataFrame =
      graft.functions.MathFunctions.softmax(df, column, dest)
    def zScoreOf(column: String, dest: String): DataFrame =
      graft.functions.MathFunctions.zScore(df, column, dest)
    def ecdfOf(column: String, dest: String): DataFrame =
      graft.functions.MathFunctions.ecdf(df, column, dest)
  }

  /** LLM-pipeline extension verbs (COVERAGE.md "LLM-pipeline extensions") —
    * same chaining ergonomics as the pyjanitor surface for the operators the
    * reference never had.
    */
  implicit class LlmOps(val df: DataFrame) extends AnyVal {
    import graft.llm.{Dedup, Sampling, Similarity, TextAnalysis}

    def dedupExact(idCol: String, textCol: String): DataFrame =
      Dedup.exactDedup(df, idCol, textCol)
    def minhashDupPairs(idCol: String, textCol: String, threshold: Double): DataFrame =
      Dedup.minhashDupPairs(df, idCol, textCol, threshold)
    def simhashOf(idCol: String, textCol: String): DataFrame =
      Dedup.simhash(df, idCol, textCol)
    def winnowFingerprints(idCol: String, textCol: String): DataFrame =
      Dedup.winnowFingerprints(df, idCol, textCol)
    def containmentPairs(idCol: String, textCol: String, threshold: Double): DataFrame =
      Dedup.containmentPairs(df, idCol, textCol, threshold)
    def dupClusters(idCol: String, pairs: DataFrame): DataFrame =
      Dedup.dupClusters(df, idCol, pairs)
    def dedupNear(idCol: String, textCol: String, threshold: Double): DataFrame =
      Dedup.dedupNear(df, idCol, textCol, threshold)
    def cosineTopK(corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
      Similarity.cosineTopK(df, corpus, idCol, vecCol, k)
    def textAnalysis(textCol: String): DataFrame = TextAnalysis.analyze(df, textCol)
    def chunkDocuments(idCol: String, textCol: String, chunkTokens: Int,
        stride: Int): DataFrame =
      TextAnalysis.chunkDocuments(df, idCol, textCol, chunkTokens, stride)
    def scrubPii(column: String,
        kinds: Seq[String] = TextAnalysis.piiPatterns.map(_._1)): DataFrame =
      df.withColumn(column, TextAnalysis.scrubPii(org.apache.spark.sql.functions.col(column), kinds))
    def hashSample(keyCol: String, fraction: Double, seed: Long = 42L): DataFrame =
      Sampling.hashSample(df, keyCol, fraction, seed)
    def hashSplit(keyCol: String,
        weights: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        destCol: String = "split", seed: Long = 42L): DataFrame =
      Sampling.hashSplit(df, keyCol, weights, destCol, seed)
    def packSequences(orderCol: String, tokenCol: String, seqLen: Int): DataFrame =
      Sampling.packSequences(df, orderCol, tokenCol, seqLen)
    def stratifiedHashSample(keyCol: String, strataCol: String,
        fractions: Map[String, Double], defaultFraction: Double = 0.0,
        seed: Long = 42L): DataFrame =
      Sampling.stratifiedHashSample(df, keyCol, strataCol, fractions, defaultFraction, seed)
    def mixDomains(keyCol: String, domainCol: String,
        weights: Seq[(String, Double)], targetRows: Long,
        copyCol: String = "copy", seed: Long = 42L): DataFrame =
      Sampling.mixDomains(df, keyCol, domainCol, weights, targetRows, copyCol, seed)
    def semDedup(idCol: String, vecCol: String, threshold: Double,
        nCells: Int = 16, kmeansIters: Int = 5): DataFrame =
      graft.llm.Similarity.semDedup(df, idCol, vecCol, threshold, nCells, kmeansIters)
    def dedupLines(idCol: String, textCol: String, minLineChars: Int = 10,
        sep: String = "\n"): DataFrame =
      Dedup.dedupLines(df, idCol, textCol, minLineChars, sep)
    def dedupSubstrings(idCol: String, textCol: String,
        minMatchTokens: Int = 20): DataFrame =
      Dedup.dedupSubstrings(df, idCol, textCol, minMatchTokens)
    def corpusReport(textCol: String, byCol: Option[String] = None): DataFrame =
      TextAnalysis.corpusReport(df, textCol, byCol)
    def heavyHitters(textCol: String, capacity: Int, k: Int,
        by: Seq[String] = Nil): DataFrame =
      TextAnalysis.heavyHitters(df, textCol, capacity, k, by)
    def corpusOverlapWith(other: DataFrame, idCol: String,
        textCol: String): DataFrame =
      Dedup.corpusOverlap(df, other, idCol, textCol)
    def knnGraph(idCol: String, vecCol: String, k: Int,
        method: String = "lsh"): DataFrame =
      graft.llm.Similarity.knnGraph(df, idCol, vecCol, k, method)
    def decontaminateAgainst(idCol: String, textCol: String,
        benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
        minShared: Int = 3, bloom: Boolean = false): DataFrame =
      if (bloom) Dedup.decontaminateBloom(df, idCol, textCol, benchmark,
        benchIdCol, benchTextCol, minShared)
      else Dedup.decontaminate(df, idCol, textCol, benchmark,
        benchIdCol, benchTextCol, minShared)
    def crossCorpusDupPairs(idCol: String, textCol: String, ref: DataFrame,
        refIdCol: String, refTextCol: String, threshold: Double): DataFrame =
      Dedup.crossCorpusDupPairs(df, idCol, textCol, ref, refIdCol, refTextCol, threshold)
    def bm25TopK(idCol: String, textCol: String, queryTerms: Seq[String],
        k: Int = 20): DataFrame =
      TextAnalysis.bm25TopK(df, idCol, textCol, queryTerms, k)
    def perplexityBuckets(idCol: String, textCol: String,
        nBuckets: Int = 3): DataFrame =
      TextAnalysis.perplexityBuckets(df, idCol, textCol, nBuckets)
    def bigramLogProb(idCol: String, textCol: String,
        lambda: Double = 0.75): DataFrame =
      TextAnalysis.bigramLogProb(df, idCol, textCol, lambda)
    def findCanaries(idCol: String, textCol: String,
        canaries: Seq[String]): DataFrame =
      TextAnalysis.findCanaries(df, idCol, textCol, canaries)
    def weightedHashSample(keyCol: String, weightCol: String, k: Int,
        seed: Long = 42L): DataFrame =
      Sampling.weightedHashSample(df, keyCol, weightCol, k, seed)
  }
}
