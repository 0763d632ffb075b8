package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Finance / ML / domain verbs (SURVEY §2.13). Network-backed reference
  * functions become static-lookup-table joins (no runtime network); RDKit
  * chemistry is out of correctness scope (SURVEY §7.4).
  */
object DomainOps {

  /** Split into (features, target) frames
    * (reference: janitor/ml.py:16 get_features_targets).
    */
  def getFeaturesTargets(df: DataFrame, targetColumns: Seq[String]): (DataFrame, DataFrame) = {
    val features = df.columns.filterNot(targetColumns.contains(_))
    (df.select(features.map(n => col(s"`$n`")).toIndexedSeq: _*),
      df.select(targetColumns.map(n => col(s"`$n`")): _*))
  }

  /** Linear unit conversions (reference: janitor/engineering.py:22
    * convert_units via pint). value_to = value_from * factor + offset.
    * Factors are exact published constants (SI definitions).
    */
  val unitFactors: Map[(String, String), (Double, Double)] = {
    val linear = Map(
      ("m", "ft") -> 3.28083989501312336d, // 1/0.3048 exactly-defined
      ("ft", "m") -> 0.3048d,
      ("km", "mi") -> (1.0d / 1.609344d),
      ("mi", "km") -> 1.609344d,
      ("kg", "lb") -> (1.0d / 0.45359237d),
      ("lb", "kg") -> 0.45359237d,
      ("g", "kg") -> 0.001d,
      ("kg", "g") -> 1000.0d,
      ("cm", "m") -> 0.01d,
      ("m", "cm") -> 100.0d)
    linear.map { case (k, f) => k -> (f, 0.0d) } ++ Map(
      ("C", "F") -> (1.8d, 32.0d),
      ("F", "C") -> (1.0d / 1.8d, -32.0d / 1.8d))
  }

  private lazy val knownUnits: Set[String] =
    unitFactors.keys.flatMap { case (a, b) => Seq(a, b) }.toSet

  def convertUnits(df: DataFrame, column: String, from: String, to: String,
      dest: Option[String] = None): DataFrame = {
    // same-unit conversion is the identity (reference
    // test_no_conversion_equal) — but only for KNOWN units: the pint-backed
    // reference raises UndefinedUnitError for garbage even when from == to
    val (factor, offset) =
      if (from == to && knownUnits.contains(from)) (1.0d, 0.0d)
      else unitFactors.getOrElse((from, to),
        throw new IllegalArgumentException(s"convert_units: no conversion $from -> $to"))
    df.withColumn(dest.getOrElse(column), col(s"`$column`") * factor + offset)
  }

  /** Static CPI index snapshot (stand-in for the reference's World Bank
    * FP.CPI.TOTL API call — janitor/finance.py:566-624 inflate_currency;
    * runtime network is out of scope, SURVEY §2.13). Synthetic but fixed
    * values; the semantics under test is the ratio join, not the data.
    */
  val cpiTable: Map[(String, Int), Double] = {
    val base = Map("USA" -> 100.0d, "DEU" -> 98.0d, "FRA" -> 97.5d)
    (for {
      (country, b) <- base.toSeq
      year <- 2000 to 2023
    } yield (country, year) -> (b * math.pow(1.021d, (year - 2000).toDouble))).toMap
  }

  def inflateCurrency(df: DataFrame, column: String, country: String,
      fromYear: Int, toYear: Int): DataFrame = {
    val factor = cpiTable((country, toYear)) / cpiTable((country, fromYear))
    df.withColumn(column, col(s"`$column`") * factor)
  }

  /** The factor as a SQL-embeddable literal (Double.toString round-trips). */
  def inflationFactor(country: String, fromYear: Int, toYear: Int): Double =
    cpiTable((country, toYear)) / cpiTable((country, fromYear))

  /** Deprecated network API in the reference (janitor/finance.py:407) —
    * kept as a raising stub for surface parity.
    */
  def convertCurrency(): Nothing =
    throw new UnsupportedOperationException(
      "convert_currency is deprecated in the reference (live exchangeratesapi call); " +
        "join a static rate table instead")

  /** Static ticker lookup (reference: janitor/finance.py:697,728 —
    * convert_stock/get_symbol web API → fixed table + broadcast join).
    */
  val tickerTable: Seq[(String, String)] = Seq(
    "AAPL" -> "Apple Inc.", "MSFT" -> "Microsoft Corporation",
    "GOOG" -> "Alphabet Inc.", "AMZN" -> "Amazon.com, Inc.")

  def getSymbol(spark: SparkSession, df: DataFrame, tickerCol: String): DataFrame = {
    import spark.implicits._
    val lookup = tickerTable.toDF("ticker", "company")
    df.join(broadcast(lookup), df(tickerCol) === lookup("ticker"), "left")
      .drop("ticker")
  }

  /** Case-insensitive ticker → company lookup (reference:
    * janitor/finance.py:697 convert_stock — upper-cases the symbol, then
    * the same static-table resolution as get_symbol; the reference's live
    * web call becomes a broadcast join).
    */
  def convertStock(spark: SparkSession, df: DataFrame, tickerCol: String): DataFrame = {
    import spark.implicits._
    val lookup = tickerTable.toDF("ticker", "company")
    df.join(broadcast(lookup), upper(df(tickerCol)) === lookup("ticker"), "left")
      .drop("ticker")
  }

  /** Map an id column to sequences from a FASTA file
    * (reference: janitor/biology.py:22 join_fasta). FASTA parse is
    * driver-side (file-sized metadata), the join is a broadcast.
    */
  def joinFasta(spark: SparkSession, df: DataFrame, idCol: String,
      fastaPath: String, dest: String): DataFrame = {
    import spark.implicits._
    val lines = scala.io.Source.fromFile(fastaPath).getLines().toSeq
    val entries = scala.collection.mutable.ListBuffer[(String, String)]()
    var id: Option[String] = None
    val seq = new StringBuilder
    lines.foreach { line =>
      if (line.startsWith(">")) {
        id.foreach(i => entries += i -> seq.toString)
        id = Some(line.drop(1).takeWhile(!_.isWhitespace))
        seq.clear()
      } else seq ++= line.trim
    }
    id.foreach(i => entries += i -> seq.toString)
    val lookup = entries.toSeq.toDF("__fasta_id", dest)
    df.join(broadcast(lookup), df(idCol) === lookup("__fasta_id"), "left")
      .drop("__fasta_id")
  }
}
