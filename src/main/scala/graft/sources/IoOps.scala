package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers (SURVEY §2.11; reference: janitor/io.py). Sinks come free with
  * `df.write.*`.
  */
object IoOps {

  /** Glob of CSVs → one DataFrame, optionally tagged with the source file
    * (reference: janitor/io.py:28 read_csvs — Spark's reader is natively
    * multi-file, so the concat mode is the default; the dict-of-frames mode
    * becomes the `source_file` column).
    */
  def readCsvs(spark: SparkSession, pathGlob: String, header: Boolean = true,
      schema: Option[String] = None, withSourceFile: Boolean = false): DataFrame = {
    // reference contracts (tests/io/test_read_csvs.py): an empty glob raises
    // (test_read_csvs_zero_csv_path), and files whose headers disagree raise
    // (test_read_csvs_two_unmatching_csv_files) — Spark alone would silently
    // read the odd file's rows under the first file's schema. One readLine
    // per matched file, driver-side; the same per-file touch the reference's
    // pd.read_csv loop pays, and it skips entirely when a schema is given.
    val hPath = new org.apache.hadoop.fs.Path(pathGlob)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a directory path expands to its data files, and hidden/_SUCCESS
    // entries are skipped — the same file set Spark's reader consumes
    def dataFile(p: org.apache.hadoop.fs.Path): Boolean =
      !p.getName.startsWith("_") && !p.getName.startsWith(".")
    val statuses = Option(fs.globStatus(hPath)).getOrElse(Array.empty)
      .flatMap(st => if (st.isDirectory) fs.listStatus(st.getPath) else Array(st))
      .filter(st => st.isFile && dataFile(st.getPath))
    require(statuses.nonEmpty, s"read_csvs: no files match $pathGlob")
    if (header && schema.isEmpty && statuses.length > 1) {
      val headers = statuses.map { st =>
        val in = fs.open(st.getPath)
        try {
          val br = new java.io.BufferedReader(new java.io.InputStreamReader(
            in, java.nio.charset.StandardCharsets.UTF_8))
          st.getPath.getName -> Option(br.readLine()).getOrElse("")
        } finally in.close()
      }
      val mismatched = headers.filter(_._2 != headers.head._2)
      require(mismatched.isEmpty,
        s"read_csvs: header mismatch across files — '${headers.head._1}' has " +
          s"'${headers.head._2}' but ${mismatched.map(_._1).mkString(", ")} differ")
    }
    var reader = spark.read.option("header", header.toString)
    reader = schema.map(reader.schema).getOrElse(reader.option("inferSchema", "true"))
    val df = reader.csv(pathGlob)
    if (withSourceFile) df.withColumn("source_file", input_file_name()) else df
  }

  /** Dict-of-frames mode of read_csvs (reference: janitor/io.py:28 with
    * separate_df=True returns `{filename: df}`): the glob is expanded
    * driver-side (file metadata only — no data read) and each file becomes
    * its own lazily-planned DataFrame keyed by its basename.
    */
  def readCsvsSeparate(spark: SparkSession, pathGlob: String,
      header: Boolean = true,
      schema: Option[String] = None): Map[String, DataFrame] = {
    val hPath = new org.apache.hadoop.fs.Path(pathGlob)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = Option(fs.globStatus(hPath)).getOrElse(Array.empty)
    require(statuses.nonEmpty, s"read_csvs: no files match $pathGlob")
    statuses.filter(_.isFile).map { st =>
      st.getPath.getName -> readCsvs(spark, st.getPath.toString, header, schema)
    }.toMap
  }

  /** Write a bucketed + sorted table — the co-location primitive for
    * repeated large-scale joins/aggregations on the same key: two tables
    * bucketed the same way join with NO exchange and NO sort (plan shows
    * SortMergeJoin directly over the scans; see BucketedJoinSpec's plan
    * assertion). At 100 TB, pre-bucketing the fact tables once turns every
    * subsequent keyed join/groupBy from a full shuffle into a local merge.
    * Bucketing requires the session catalog (`saveAsTable`), not a bare
    * parquet path — Spark's bucketing metadata lives in the metastore.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int, sortCols: Seq[String] = Nil,
      mode: String = "overwrite"): Unit = {
    require(bucketCols.nonEmpty, "write_bucketed: no bucket columns")
    val sorts = if (sortCols.nonEmpty) sortCols else bucketCols
    df.write.mode(mode)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorts.head, sorts.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Hive-style partitioned parquet write — the partition-PRUNING
    * primitive, complementing [[writeBucketed]]'s co-location: filters on
    * the partition columns (date, lang, source, …) never touch excluded
    * directories at all (plan shows `PartitionFilters`, scan reads only
    * matching files — PartitionedWriteSpec asserts both). At 100 TB,
    * partition on the columns queries slice by and bucket on the columns
    * they join by. Guard against over-partitioning: a column with millions
    * of distinct values produces millions of directories — keep partition
    * cardinality in the thousands and let bucketing/files handle the rest.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      mode: String = "overwrite"): Unit = {
    require(partitionCols.nonEmpty, "write_partitioned: no partition columns")
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)
  }

  /** Z-order (Morton) value over numeric columns — the multi-dimensional
    * locality key behind clustered data layouts: rows close in EVERY listed
    * dimension land close in the one-dimensional z order, so min/max
    * footer pruning works for filters on ANY subset of the dimensions
    * (a lexicographic sort only serves its leading column). Each column is
    * quantile-bucketed into 2^bits ranks via the supplied boundaries
    * (length 2^bits − 1, ascending — from [[zBoundaries]] or pinned), then
    * the rank bits are interleaved with plain integer arithmetic. Pure
    * codegen projection: the boundary table rides as one array literal per
    * column, the indicator-sum bucketizer and the shift/mask interleave
    * are exactly replicable in any SQL engine (the oracle gate does).
    */
  def zOrderValue(cols: Seq[org.apache.spark.sql.Column],
      boundaries: Seq[Array[Double]], bits: Int = 8): org.apache.spark.sql.Column = {
    require(cols.nonEmpty && cols.length <= 6, "z_order: 1..6 columns")
    require(bits >= 1 && bits <= 16, "z_order: bits in [1,16]")
    require(boundaries.length == cols.length,
      "z_order: one boundary array per column")
    boundaries.foreach(b => require(b.length == (1 << bits) - 1,
      s"z_order: need ${(1 << bits) - 1} boundaries per column"))
    val n = cols.length
    val ranks = cols.zip(boundaries).map { case (c, bs) =>
      // rank = #boundaries strictly below the value (nulls rank 0): an
      // O(2^bits) indicator sum — codegen'd, constant-reference HOF
      aggregate(typedLit(bs.toSeq),
        lit(0),
        (acc, b) => acc + when(c.cast("double") > b, 1).otherwise(0))
    }
    (0 until bits).flatMap { j =>
      (0 until n).map { i =>
        shiftleft(shiftright(ranks(i), j).bitwiseAND(lit(1)), j * n + i)
      }
    }.reduce[org.apache.spark.sql.Column](_ + _).cast("long")
  }

  /** Data-derived quantile boundaries for [[zOrderValue]]: 2^bits − 1
    * approxQuantile split points per column (one bounded driver action).
    */
  def zBoundaries(df: DataFrame, cols: Seq[String],
      bits: Int = 8): Seq[Array[Double]] = {
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    cols.map(c => df.stat.approxQuantile(c, probs, 1e-4))
  }

  /** Z-ordered parquet write: range-partition on the z-value (balanced
    * output files), sort within partitions by it, drop the helper column.
    * Filters on any clustered dimension then prune row groups via parquet
    * min/max — the OPTIMIZE ZORDER layout, expressed with stock Spark.
    */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
      bits: Int = 8, numFiles: Int = 0, mode: String = "overwrite"): Unit = {
    val bs = zBoundaries(df, cols, bits)
    val z = zOrderValue(cols.map(c => col(s"`$c`")), bs, bits)
    val withZ = df.withColumn("__z", z)
    val parts = if (numFiles > 0) numFiles
      else df.sparkSession.sparkContext.defaultParallelism
    withZ.repartitionByRange(parts, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(mode).parquet(path)
  }

  /** Run a shell command, parse stdout as CSV
    * (reference: janitor/io.py:96 read_commandline). The command runs
    * driver-side; its output is parallelized then parsed by the csv reader.
    */
  def readCommandline(spark: SparkSession, command: String, header: Boolean = true,
      schema: Option[String] = None): DataFrame = {
    import spark.implicits._
    import scala.sys.process._
    val out = Seq("/bin/sh", "-c", command).!!
    val lines = out.split("\n").toIndexedSeq.filter(_.nonEmpty)
    val ds = spark.createDataset(lines)
    var reader = spark.read.option("header", header.toString)
    reader = schema.map(reader.schema).getOrElse(reader.option("inferSchema", "true"))
    reader.csv(ds)
  }

  /** Named-table Excel reader (reference: janitor/io.py:159 xlsx_table).
    * Backed by the JDK-only OOXML parser in [[Xlsx]] — no POI required.
    * Header row comes from the table's `headerRowCount`; otherwise columns
    * are named C0..Cn like the reference. Column types are inferred from the
    * cells (long / double / boolean, else string).
    *
    * Workbooks are driver-sized artifacts (the reference reads them with
    * openpyxl on one machine); the DataFrame they become is what scales.
    */
  def xlsxTable(spark: SparkSession, path: String, table: String): DataFrame =
    xlsxTables(spark, path, Seq(table))(table)

  /** All (or the named subset of) tables in the workbook, keyed by table name
    * (io.py:159 returns a dict in multi-table mode).
    */
  def xlsxTables(spark: SparkSession, path: String,
      tables: Seq[String] = Nil): Map[String, DataFrame] = {
    val wb = Xlsx.parse(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    if (wb.tables.isEmpty)
      throw new IllegalArgumentException("xlsx_table: there are no tables in the Workbook.")
    val missing = tables.toSet.diff(wb.tables.map(_.name).toSet)
    if (missing.nonEmpty)
      throw new NoSuchElementException(
        s"xlsx_table: tables ${missing.mkString(", ")} do not exist in the Workbook.")
    val wanted = if (tables.isEmpty) wb.tables else wb.tables.filter(t => tables.contains(t.name))
    wanted.map { t =>
      val (c1, r1, c2, r2) = Xlsx.parseRef(t.ref)
      val inRange = wb.cells.filter(c => c.sheet == t.sheet &&
        c.column >= c1 && c.column <= c2 && c.row >= r1 && c.row <= r2)
      val byPos = inRange.map(c => (c.row, c.column) -> c).toMap
      // exactly one header row, like the reference (openpyxl hands pandas the
      // first row as names and everything after as data); workbooks with
      // headerRowCount > 1 keep rows 2..k as data rather than dropping them
      val (headerRow, dataRows) =
        if (t.headerRowCount > 0) (Some(r1), (r1 + 1) to r2)
        else (None, r1 to r2)
      val names = (c1 to c2).zipWithIndex.map { case (cc, i) =>
        headerRow.flatMap(hr => byPos.get((hr, cc)).flatMap(c => Option(c.value)))
          .getOrElse(s"C$i")
      }
      t.name -> cellsToDataFrame(spark, names, dataRows.map(rr =>
        (c1 to c2).map(cc => byPos.get((rr, cc)))))
    }.toMap
  }

  /** Infer a per-column Spark type from parsed cells and build a DataFrame.
    * Mirrors what openpyxl hands pandas: numbers (long when every value is
    * integral, else double), booleans, dates as ISO strings, else string.
    */
  private def cellsToDataFrame(spark: SparkSession, names: Seq[String],
      rows: Seq[Seq[Option[Xlsx.Cell]]]): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val nCols = names.length
    val colType: Seq[DataType] = (0 until nCols).map { i =>
      val vals = rows.flatMap(_(i)).filter(c => c.internalValue != null)
      if (vals.isEmpty) StringType
      else if (vals.forall(_.dataType == "b")) BooleanType
      else if (vals.forall(c => c.dataType == "n" && !c.value.contains('.') &&
        !c.value.toLowerCase.contains('e'))) LongType
      else if (vals.forall(_.dataType == "n")) DoubleType
      else StringType
    }
    val schema = StructType(names.zip(colType).map { case (n, t) =>
      StructField(n, t, nullable = true) })
    val data: Seq[Row] = rows.map { r =>
      Row.fromSeq((0 until nCols).map { i =>
        r(i).filter(_.internalValue != null).map { c =>
          colType(i) match {
            case LongType => c.internalValue.toDouble.toLong
            case DoubleType => c.internalValue.toDouble
            case BooleanType => c.internalValue == "1"
            case _ => c.value
          }
        }.orNull
      })
    }
    spark.createDataFrame(data.asJava, schema)
  }

  private val cellSchema = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("value", StringType), StructField("internal_value", StringType),
      StructField("coordinate", StringType), StructField("row", IntegerType, nullable = false),
      StructField("column", IntegerType, nullable = false),
      StructField("data_type", StringType), StructField("is_date", BooleanType, nullable = false),
      StructField("number_format", StringType), StructField("sheetname", StringType),
      // style attributes (openpyxl's fill/font/border structs, flattened to
      // the commonly-queried fields; null when the workbook has no styles)
      StructField("font_name", StringType), StructField("font_size", StringType),
      StructField("font_bold", BooleanType), StructField("font_italic", BooleanType),
      StructField("fill_pattern", StringType), StructField("fill_fg_color", StringType),
      StructField("border", StringType),
      // reference-parity structs (io.py:345 xlsx_cells fill/font/border
      // columns): field names follow openpyxl's attribute naming —
      // Font.name/size/bold/italic/color, PatternFill.patternType/fgColor,
      // Border.left/right/top/bottom (side style names)
      StructField("font", StructType(Seq(
        StructField("name", StringType), StructField("size", StringType),
        StructField("bold", BooleanType), StructField("italic", BooleanType),
        StructField("color", StringType)))),
      StructField("fill", StructType(Seq(
        StructField("patternType", StringType),
        StructField("fgColor", StringType)))),
      StructField("border_sides", StructType(Seq(
        StructField("left", StringType), StructField("right", StringType),
        StructField("top", StringType), StructField("bottom", StringType))))))
  }

  private def cellToRow(c: Xlsx.Cell, styles: Xlsx.Styles): org.apache.spark.sql.Row = {
    val font = styles.fontOf(c.styleIdx)
    val fill = styles.fillOf(c.styleIdx)
    val border = styles.borderOf(c.styleIdx)
    val sides = border.map { b =>
      val m = b.split(';').filter(_.nonEmpty)
        .map(_.split(":", 2)).collect { case Array(k, v) => k -> v }.toMap
      org.apache.spark.sql.Row(m.get("left").orNull, m.get("right").orNull,
        m.get("top").orNull, m.get("bottom").orNull)
    }
    org.apache.spark.sql.Row(c.value, c.internalValue, c.coordinate, c.row,
      c.column, c.dataType, c.isDate, c.numberFormat, c.sheet,
      font.map(_.name).orNull, font.map(_.size).orNull,
      font.map(f => Boolean.box(f.bold)).orNull,
      font.map(f => Boolean.box(f.italic)).orNull,
      fill.map(_.pattern).orNull, fill.map(_.fgColor).orNull,
      border.orNull,
      font.map(f => org.apache.spark.sql.Row(f.name, f.size, f.bold,
        f.italic, f.color)).orNull,
      fill.map(f => org.apache.spark.sql.Row(f.pattern, f.fgColor)).orNull,
      sides.orNull)
  }

  /** Cell-level Excel reader (reference: janitor/io.py:345 xlsx_cells): one
    * output row per cell with value / coordinate / typing columns. The
    * reference returns a dict keyed by sheet for multi-sheet reads; here
    * sheets are concatenated with a `sheetname` column (filter to split).
    * `startPoint`/`endPoint` bound the scan like the reference's kwargs.
    */
  def xlsxCells(spark: SparkSession, path: String,
      sheetnames: Seq[String] = Nil,
      startPoint: Option[String] = None, endPoint: Option[String] = None,
      includeBlankCells: Boolean = true): DataFrame = {
    import scala.jdk.CollectionConverters._
    require(startPoint.isEmpty == endPoint.isEmpty,
      "xlsx_cells: start_point and end_point must be provided together")
    val wb = Xlsx.parse(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    // the reference raises KeyError on wb[missing_sheet]; a silent empty
    // result would let sheet-name typos pass
    val unknown = sheetnames.toSet.diff(wb.sheetNames.toSet)
    if (unknown.nonEmpty)
      throw new NoSuchElementException(
        s"xlsx_cells: sheets ${unknown.mkString(", ")} do not exist in the Workbook " +
          s"(have: ${wb.sheetNames.mkString(", ")}).")
    val bySheet = if (sheetnames.isEmpty) wb.cells
      else wb.cells.filter(c => sheetnames.contains(c.sheet))
    val bounded = (startPoint, endPoint) match {
      case (Some(lo), Some(hi)) =>
        val (c1, r1) = Xlsx.parseCoord(lo, 1)
        val (c2, r2) = Xlsx.parseCoord(hi, Int.MaxValue)
        bySheet.filter(c => c.column >= c1 && c.column <= c2 && c.row >= r1 && c.row <= r2)
      case _ => bySheet
    }
    val kept = if (includeBlankCells) bounded else bounded.filter(_.internalValue != null)
    spark.createDataFrame(kept.map(cellToRow(_, wb.styles)).asJava, cellSchema)
  }

  /** Distributed xlsx_cells over a directory/glob of workbooks: Spark's
    * `binaryFile` source ships each file's bytes to an executor, where the
    * pure [[Xlsx.parse]] runs — one task per workbook, no driver bottleneck.
    * This is the 100 TB path for "a lake of small Excel drops": the parse is
    * embarrassingly parallel and the output is an ordinary DataFrame.
    */
  def xlsxCellsGlob(spark: SparkSession, pathGlob: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(cellSchema.add("source_file", org.apache.spark.sql.types.StringType))
    val files = spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content")
    files.flatMap { row =>
      val path = row.getString(0)
      val bytes = row.getAs[Array[Byte]](1)
      val wb = Xlsx.parse(bytes)
      wb.cells.map(c =>
        org.apache.spark.sql.Row.fromSeq(cellToRow(c, wb.styles).toSeq :+ path))
    }(enc)
  }
}
