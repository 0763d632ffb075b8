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
    var reader = spark.read.option("header", header.toString)
    reader = schema.map(reader.schema).getOrElse(reader.option("inferSchema", "true"))
    val df = reader.csv(pathGlob)
    if (withSourceFile) df.withColumn("source_file", input_file_name()) else df
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

  /** Excel readers (reference: janitor/io.py:159 xlsx_table, :345 xlsx_cells)
    * need a driver-side POI traversal; no POI jars ship in this container →
    * explicitly unsupported (SURVEY §7.4), with the intended implementation
    * documented here: POI sheet walk → Seq[Row] → spark.createDataFrame with
    * StructType attr columns.
    */
  def xlsxTable(path: String, table: String): Nothing =
    throw new UnsupportedOperationException(
      "xlsx_table: Apache POI not available in this environment (SURVEY §7.4)")

  def xlsxCells(path: String): Nothing =
    throw new UnsupportedOperationException(
      "xlsx_cells: Apache POI not available in this environment (SURVEY §7.4)")
}
