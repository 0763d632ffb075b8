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

  /** Supported currency whitelist (reference: janitor/finance.py:16-50
    * currency_set) with the reference's ValueError contract
    * (finance.py:321-327).
    */
  val currencySet: Set[String] = Set(
    "AUD", "BGN", "BRL", "CAD", "CHF", "CNY", "CZK", "DKK", "EUR", "GBP",
    "HKD", "HRK", "HUF", "IDR", "ILS", "INR", "ISK", "JPY", "KRW", "MXN",
    "MYR", "NOK", "NZD", "PHP", "PLN", "RON", "RUB", "SEK", "SGD", "THB",
    "TRY", "USD", "ZAR")

  def checkCurrency(currency: String): Unit =
    if (!currencySet.contains(currency))
      throw new IllegalArgumentException(
        s"currency $currency not in supported currency set, $currencySet")

  /** The World Bank country whitelist (reference: janitor/finance.py:52-316
    * wb_country_dict) — full name -> ISO-3166 alpha-3 abbreviation; public
    * World Bank indicator-API metadata. `checkWbCountry` accepts either form
    * (finance.py:330-338).
    */
  val wbCountryDict: Map[String, String] = Map(
    "Aruba" -> "ABW",
    "Afghanistan" -> "AFG",
    "Angola" -> "AGO",
    "Albania" -> "ALB",
    "Andorra" -> "AND",
    "Arab World" -> "ARB",
    "United Arab Emirates" -> "ARE",
    "Argentina" -> "ARG",
    "Armenia" -> "ARM",
    "American Samoa" -> "ASM",
    "Antigua and Barbuda" -> "ATG",
    "Australia" -> "AUS",
    "Austria" -> "AUT",
    "Azerbaijan" -> "AZE",
    "Burundi" -> "BDI",
    "Belgium" -> "BEL",
    "Benin" -> "BEN",
    "Burkina Faso" -> "BFA",
    "Bangladesh" -> "BGD",
    "Bulgaria" -> "BGR",
    "Bahrain" -> "BHR",
    "Bahamas, The" -> "BHS",
    "Bosnia and Herzegovina" -> "BIH",
    "Belarus" -> "BLR",
    "Belize" -> "BLZ",
    "Bermuda" -> "BMU",
    "Bolivia" -> "BOL",
    "Brazil" -> "BRA",
    "Barbados" -> "BRB",
    "Brunei Darussalam" -> "BRN",
    "Bhutan" -> "BTN",
    "Botswana" -> "BWA",
    "Central African Republic" -> "CAF",
    "Canada" -> "CAN",
    "Central Europe and the Baltics" -> "CEB",
    "Switzerland" -> "CHE",
    "Channel Islands" -> "CHI",
    "Chile" -> "CHL",
    "China" -> "CHN",
    "Cote d'Ivoire" -> "CIV",
    "Cameroon" -> "CMR",
    "Congo, Dem. Rep." -> "COD",
    "Congo, Rep." -> "COG",
    "Colombia" -> "COL",
    "Comoros" -> "COM",
    "Cabo Verde" -> "CPV",
    "Costa Rica" -> "CRI",
    "Caribbean small states" -> "CSS",
    "Cuba" -> "CUB",
    "Curacao" -> "CUW",
    "Cayman Islands" -> "CYM",
    "Cyprus" -> "CYP",
    "Czech Republic" -> "CZE",
    "Germany" -> "DEU",
    "Djibouti" -> "DJI",
    "Dominica" -> "DMA",
    "Denmark" -> "DNK",
    "Dominican Republic" -> "DOM",
    "Algeria" -> "DZA",
    "East Asia & Pacific (excluding high income)" -> "EAP",
    "Early-demographic dividend" -> "EAR",
    "East Asia & Pacific" -> "EAS",
    "Europe & Central Asia (excluding high income)" -> "ECA",
    "Europe & Central Asia" -> "ECS",
    "Ecuador" -> "ECU",
    "Egypt, Arab Rep." -> "EGY",
    "Euro area" -> "EMU",
    "Eritrea" -> "ERI",
    "Spain" -> "ESP",
    "Estonia" -> "EST",
    "Ethiopia" -> "ETH",
    "European Union" -> "EUU",
    "Fragile and conflict affected situations" -> "FCS",
    "Finland" -> "FIN",
    "Fiji" -> "FJI",
    "France" -> "FRA",
    "Faroe Islands" -> "FRO",
    "Micronesia, Fed. Sts." -> "FSM",
    "Gabon" -> "GAB",
    "United Kingdom" -> "GBR",
    "Georgia" -> "GEO",
    "Ghana" -> "GHA",
    "Gibraltar" -> "GIB",
    "Guinea" -> "GIN",
    "Gambia, The" -> "GMB",
    "Guinea-Bissau" -> "GNB",
    "Equatorial Guinea" -> "GNQ",
    "Greece" -> "GRC",
    "Grenada" -> "GRD",
    "Greenland" -> "GRL",
    "Guatemala" -> "GTM",
    "Guam" -> "GUM",
    "Guyana" -> "GUY",
    "High income" -> "HIC",
    "Hong Kong SAR, China" -> "HKG",
    "Honduras" -> "HND",
    "Heavily indebted poor countries (HIPC)" -> "HPC",
    "Croatia" -> "HRV",
    "Haiti" -> "HTI",
    "Hungary" -> "HUN",
    "IBRD only" -> "IBD",
    "IDA & IBRD total" -> "IBT",
    "IDA total" -> "IDA",
    "IDA blend" -> "IDB",
    "Indonesia" -> "IDN",
    "IDA only" -> "IDX",
    "Isle of Man" -> "IMN",
    "India" -> "IND",
    "Not classified" -> "INX",
    "Ireland" -> "IRL",
    "Iran, Islamic Rep." -> "IRN",
    "Iraq" -> "IRQ",
    "Iceland" -> "ISL",
    "Israel" -> "ISR",
    "Italy" -> "ITA",
    "Jamaica" -> "JAM",
    "Jordan" -> "JOR",
    "Japan" -> "JPN",
    "Kazakhstan" -> "KAZ",
    "Kenya" -> "KEN",
    "Kyrgyz Republic" -> "KGZ",
    "Cambodia" -> "KHM",
    "Kiribati" -> "KIR",
    "St. Kitts and Nevis" -> "KNA",
    "Korea, Rep." -> "KOR",
    "Kuwait" -> "KWT",
    "Latin America & Caribbean (excluding high income)" -> "LAC",
    "Lao PDR" -> "LAO",
    "Lebanon" -> "LBN",
    "Liberia" -> "LBR",
    "Libya" -> "LBY",
    "St. Lucia" -> "LCA",
    "Latin America & Caribbean" -> "LCN",
    "Least developed countries: UN classification" -> "LDC",
    "Low income" -> "LIC",
    "Liechtenstein" -> "LIE",
    "Sri Lanka" -> "LKA",
    "Lower middle income" -> "LMC",
    "Low & middle income" -> "LMY",
    "Lesotho" -> "LSO",
    "Late-demographic dividend" -> "LTE",
    "Lithuania" -> "LTU",
    "Luxembourg" -> "LUX",
    "Latvia" -> "LVA",
    "Macao SAR, China" -> "MAC",
    "St. Martin (French part)" -> "MAF",
    "Morocco" -> "MAR",
    "Monaco" -> "MCO",
    "Moldova" -> "MDA",
    "Madagascar" -> "MDG",
    "Maldives" -> "MDV",
    "Middle East & North Africa" -> "MEA",
    "Mexico" -> "MEX",
    "Marshall Islands" -> "MHL",
    "Middle income" -> "MIC",
    "North Macedonia" -> "MKD",
    "Mali" -> "MLI",
    "Malta" -> "MLT",
    "Myanmar" -> "MMR",
    "Middle East & North Africa (excluding high income)" -> "MNA",
    "Montenegro" -> "MNE",
    "Mongolia" -> "MNG",
    "Northern Mariana Islands" -> "MNP",
    "Mozambique" -> "MOZ",
    "Mauritania" -> "MRT",
    "Mauritius" -> "MUS",
    "Malawi" -> "MWI",
    "Malaysia" -> "MYS",
    "North America" -> "NAC",
    "Namibia" -> "NAM",
    "New Caledonia" -> "NCL",
    "Niger" -> "NER",
    "Nigeria" -> "NGA",
    "Nicaragua" -> "NIC",
    "Netherlands" -> "NLD",
    "Norway" -> "NOR",
    "Nepal" -> "NPL",
    "Nauru" -> "NRU",
    "New Zealand" -> "NZL",
    "OECD members" -> "OED",
    "Oman" -> "OMN",
    "Other small states" -> "OSS",
    "Pakistan" -> "PAK",
    "Panama" -> "PAN",
    "Peru" -> "PER",
    "Philippines" -> "PHL",
    "Palau" -> "PLW",
    "Papua New Guinea" -> "PNG",
    "Poland" -> "POL",
    "Pre-demographic dividend" -> "PRE",
    "Puerto Rico" -> "PRI",
    "Korea, Dem. People's Rep." -> "PRK",
    "Portugal" -> "PRT",
    "Paraguay" -> "PRY",
    "West Bank and Gaza" -> "PSE",
    "Pacific island small states" -> "PSS",
    "Post-demographic dividend" -> "PST",
    "French Polynesia" -> "PYF",
    "Qatar" -> "QAT",
    "Romania" -> "ROU",
    "Russian Federation" -> "RUS",
    "Rwanda" -> "RWA",
    "South Asia" -> "SAS",
    "Saudi Arabia" -> "SAU",
    "Sudan" -> "SDN",
    "Senegal" -> "SEN",
    "Singapore" -> "SGP",
    "Solomon Islands" -> "SLB",
    "Sierra Leone" -> "SLE",
    "El Salvador" -> "SLV",
    "San Marino" -> "SMR",
    "Somalia" -> "SOM",
    "Serbia" -> "SRB",
    "Sub-Saharan Africa (excluding high income)" -> "SSA",
    "South Sudan" -> "SSD",
    "Sub-Saharan Africa" -> "SSF",
    "Small states" -> "SST",
    "Sao Tome and Principe" -> "STP",
    "Suriname" -> "SUR",
    "Slovak Republic" -> "SVK",
    "Slovenia" -> "SVN",
    "Sweden" -> "SWE",
    "Eswatini" -> "SWZ",
    "Sint Maarten (Dutch part)" -> "SXM",
    "Seychelles" -> "SYC",
    "Syrian Arab Republic" -> "SYR",
    "Turks and Caicos Islands" -> "TCA",
    "Chad" -> "TCD",
    "East Asia & Pacific (IDA & IBRD countries)" -> "TEA",
    "Europe & Central Asia (IDA & IBRD countries)" -> "TEC",
    "Togo" -> "TGO",
    "Thailand" -> "THA",
    "Tajikistan" -> "TJK",
    "Turkmenistan" -> "TKM",
    "Latin America & the Caribbean (IDA & IBRD countries)" -> "TLA",
    "Timor-Leste" -> "TLS",
    "Middle East & North Africa (IDA & IBRD countries)" -> "TMN",
    "Tonga" -> "TON",
    "South Asia (IDA & IBRD)" -> "TSA",
    "Sub-Saharan Africa (IDA & IBRD countries)" -> "TSS",
    "Trinidad and Tobago" -> "TTO",
    "Tunisia" -> "TUN",
    "Turkey" -> "TUR",
    "Tuvalu" -> "TUV",
    "Tanzania" -> "TZA",
    "Uganda" -> "UGA",
    "Ukraine" -> "UKR",
    "Upper middle income" -> "UMC",
    "Uruguay" -> "URY",
    "United States" -> "USA",
    "Uzbekistan" -> "UZB",
    "St. Vincent and the Grenadines" -> "VCT",
    "Venezuela, RB" -> "VEN",
    "British Virgin Islands" -> "VGB",
    "Virgin Islands (U.S.)" -> "VIR",
    "Vietnam" -> "VNM",
    "Vanuatu" -> "VUT",
    "World" -> "WLD",
    "Samoa" -> "WSM",
    "Kosovo" -> "XKX",
    "Yemen, Rep." -> "YEM",
    "South Africa" -> "ZAF",
    "Zambia" -> "ZMB",
    "Zimbabwe" -> "ZWE")

  private lazy val wbAbbrevs: Set[String] = wbCountryDict.values.toSet

  /** Accepts a full name or an abbreviation, raising the reference's
    * ValueError otherwise (finance.py:330-338); returns the abbreviation.
    */
  def checkWbCountry(country: String): String =
    wbCountryDict.getOrElse(country,
      if (wbAbbrevs.contains(country)) country
      else throw new IllegalArgumentException(
        s"country $country not in supported World Bank country dict"))

  /** (reference: janitor/finance.py:341-344) */
  def checkWbYears(year: Int): Unit =
    if (year < 1960) throw new IllegalArgumentException(
      "year value must be 1960 or later")

  /** Static CPI index snapshot (stand-in for the reference's World Bank
    * FP.CPI.TOTL API call — janitor/finance.py:539-621 _inflate_currency;
    * runtime network is out of scope, SURVEY §2.13). Synthetic but fixed
    * values covering every whitelisted country over the WB year range, with
    * a deterministic per-country base; the semantics under test is the
    * ratio + error contract, not the data. Per-country series-start years
    * model the real API's partial coverage (finance.py:596-612 raises when
    * a requested year has no datapoint) — GHA's CPI series starts 1964.
    */
  val cpiSeriesStart: Map[String, Int] = Map("GHA" -> 1964)

  val cpiTable: Map[(String, Int), Double] = {
    val pinned = Map("USA" -> 100.0d, "DEU" -> 98.0d, "FRA" -> 97.5d)
    (for {
      abbr <- wbAbbrevs.toSeq
      base = pinned.getOrElse(abbr,
        80.0d + (abbr.map(_.toInt).sum % 40)) // deterministic synthetic base
      year <- cpiSeriesStart.getOrElse(abbr, 1960) to 2023
    } yield (abbr, year) -> (base * math.pow(1.021d, (year - 2000).toDouble))).toMap
  }

  private def cpiAt(abbr: String, year: Int): Double =
    cpiTable.getOrElse((abbr, year), throw new IllegalArgumentException(
      s"The WB Indicator API does not have inflation data for $year for $abbr."))

  /** (reference: janitor/finance.py:624-694 inflate_currency). Validates
    * the country against the World Bank whitelist (full name or
    * abbreviation), both years against the 1960 floor, and each year
    * against the country's series coverage — the reference's three
    * ValueError families. `makeNewColumn` appends `column_toYear` instead
    * of updating in place (finance.py:684-690).
    */
  def inflateCurrency(df: DataFrame, column: String, country: String,
      fromYear: Int, toYear: Int, makeNewColumn: Boolean = false): DataFrame = {
    val factor = inflationFactor(country, fromYear, toYear)
    val dest = if (makeNewColumn) s"${column}_$toYear" else column
    df.withColumn(dest, col(s"`$column`") * factor)
  }

  /** The factor as a SQL-embeddable literal (Double.toString round-trips). */
  def inflationFactor(country: String, fromYear: Int, toYear: Int): Double = {
    val abbr = checkWbCountry(country)
    checkWbYears(fromYear); checkWbYears(toYear)
    cpiAt(abbr, toYear) / cpiAt(abbr, fromYear)
  }

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
