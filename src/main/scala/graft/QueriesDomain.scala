package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.syntax._
import graft.Tables._
import graft.operators.DomainOps
import graft.sources.IoOps
import graft.functions.{MathFunctions, expressions => gx}

/** Remaining SURVEY §2 coverage: row promotion, value-mode clean_names,
  * IO readers, domain modules, and the custom-expression math functions.
  */
object QueriesDomain {
  private type Q = (SparkSession, String) => DataFrame

  private def tmpDir(): String = {
    // absolute: the driver may launch Verify/Bench from outside the repo,
    // and scratch files must stay inside it
    val d = new java.io.File("/root/repo/target/tmp")
    d.mkdirs()
    d.getAbsolutePath
  }

  /** Deterministic xlsx gate input: nation rows (ordered by key) as a named
    * table. 25 driver-side rows — workbooks are driver-sized artifacts.
    */
  private def writeNationXlsx(s: SparkSession, d: String): String = {
    val p = s"${tmpDir()}/nation_gate.xlsx"
    val rows = nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey").collect()
      .map(r => Seq[Any](r.getInt(0).toLong, r.getString(1), r.getInt(2).toLong)).toSeq
    graft.sources.Xlsx.Writer.write(p,
      Seq(Seq[Any]("n_nationkey", "n_name", "n_regionkey")) ++ rows,
      tableName = Some("tNation"))
    p
  }

  val entries: Map[String, Q] = Map(
    "row_to_names" -> ((s, d) => nation(s, d)
      .select("n_name", "n_regionkey")
      .rowToNames("n_name", Seq(0), removeRows = true)),
    "row_to_names_slice" -> ((s, d) => nation(s, d)
      .select("n_name", "n_regionkey")
      .rowToNamesSlice("n_name", 0, 2, removeRows = true)),
    "explode_index" -> ((s, d) => events(s, d)
      .select(col("event_id"), col("value").as("m_v"), col("user_id").as("m_u"))
      .explodeIndex("_")
      .collapseLevels("_")),
    "clean_names_values" -> ((s, d) => events(s, d)
      .select(col("event_id"), concat(lit("Typ E-"), col("event_type")).as("etype"))
      .cleanNamesValues(Seq("etype"))),
    "get_features_targets" -> ((s, d) => {
      val (features, _) = DomainOps.getFeaturesTargets(
        lineitem(s, d).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"),
        targetColumns = Seq("l_returnflag"))
      features
    }),
    "convert_units" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .transform(df => DomainOps.convertUnits(df, "l_quantity", "kg", "lb", Some("qty_lb")))),
    "inflate_currency" -> ((s, d) => DomainOps.inflateCurrency(
      orders(s, d).select("o_orderkey", "o_totalprice"),
      "o_totalprice", "USA", 2010, 2020)),
    // full-name resolution through wb_country_dict + make_new_column
    // (finance.py:330-338,684-690)
    "inflate_currency_name" -> ((s, d) => DomainOps.inflateCurrency(
      orders(s, d).select("o_orderkey", "o_totalprice"),
      "o_totalprice", "Germany", 2005, 2015, makeNewColumn = true)),
    "get_symbol" -> ((s, d) => DomainOps.getSymbol(s,
      customer(s, d).select(col("c_custkey"),
        element_at(array(lit("AAPL"), lit("MSFT"), lit("GOOG"), lit("AMZN")),
          (col("c_custkey") % 4 + 1).cast("int")).as("tick")),
      "tick")),
    // lower-case ticks: convert_stock's distinguishing behavior vs
    // get_symbol is the case-insensitive resolution (finance.py:697 upper())
    "convert_stock" -> ((s, d) => DomainOps.convertStock(s,
      customer(s, d).select(col("c_custkey"),
        element_at(array(lit("aapl"), lit("msft"), lit("goog"), lit("amzn")),
          (col("c_custkey") % 4 + 1).cast("int")).as("tick")),
      "tick")),
    "join_fasta" -> ((s, d) => {
      val path = s"${tmpDir()}/demo.fasta"
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
        ">seq0 demo\nACGT\nACGT\n>seq1\nTTTT\n>seq2\nGGCC\n")
      DomainOps.joinFasta(s,
        customer(s, d).select(col("c_custkey"),
          concat(lit("seq"), col("c_custkey") % 3).as("sid")),
        "sid", path, "sequence")
    }),
    "read_csvs" -> ((s, d) => {
      val out = s"${tmpDir()}/read_csvs_demo"
      lineitem(s, d).select("l_orderkey", "l_linenumber", "l_returnflag")
        .filter(col("l_orderkey") < 100)
        .write.mode("overwrite").option("header", "true").csv(out)
      IoOps.readCsvs(s, out,
        schema = Some("l_orderkey BIGINT, l_linenumber INT, l_returnflag STRING"))
    }),
    "read_commandline" -> ((s, d) => IoOps.readCommandline(s,
      "printf 'a,b\\n1,x\\n2,y\\n'", schema = Some("a INT, b STRING"))),
    // z-order with PINNED boundaries (multiples of 3 / 4000) so the
    // bucketize + bit-interleave math is exactly replicated in DuckDB; the
    // data-derived approxQuantile path is spec-gated (balance + locality)
    "zorder_value" -> ((s, d) => {
      val qb = Array.tabulate(15)(i => (i + 1) * 3.0)
      val pb = Array.tabulate(15)(i => (i + 1) * 4000.0)
      lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        IoOps.zOrderValue(Seq(col("l_quantity"), col("l_extendedprice")),
          Seq(qb, pb), bits = 4).as("z"))
    }),
    "xlsx_table" -> ((s, d) => {
      IoOps.xlsxTable(s, writeNationXlsx(s, d), "tNation")
    }),
    "xlsx_cells" -> ((s, d) => {
      IoOps.xlsxCells(s, writeNationXlsx(s, d))
        .select("coordinate", "row", "column", "data_type", "value")
    }),
    // start_point/end_point kwargs (reference io.py xlsx_cells bounds): the
    // B2:C10 sub-rectangle of the nation sheet, value+coordinate pinned
    "xlsx_cells_bounded" -> ((s, d) => {
      IoOps.xlsxCells(s, writeNationXlsx(s, d),
          startPoint = Some("B2"), endPoint = Some("C10"))
        .select("coordinate", "row", "column", "data_type", "value")
    }),
    // style parity (reference io.py:345 fill/font/border columns): a styled
    // header row — Arial 14 bold red on solid yellow, thin/medium box — is
    // written through the self-built writer and read back through the
    // openpyxl-named structs (font.name/size/bold/color, fill.patternType/
    // fgColor, border sides); every attribute is pinned per cell
    "xlsx_cells_style" -> ((s, d) => {
      val p = s"${tmpDir()}/nation_styled.xlsx"
      val rows = nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey").collect()
        .map(r => Seq[Any](r.getInt(0).toLong, r.getString(1), r.getInt(2).toLong)).toSeq
      graft.sources.Xlsx.Writer.write(p,
        Seq(Seq[Any]("n_nationkey", "n_name", "n_regionkey")) ++ rows,
        styledHeader = true)
      IoOps.xlsxCells(s, p).select(col("coordinate"), col("value"),
        col("font.name").as("font_name"), col("font.size").as("font_size"),
        col("font.bold").as("font_bold"), col("font.color").as("font_color"),
        col("fill.patternType").as("pattern_type"),
        col("fill.fgColor").as("fg_color"),
        col("border_sides.left").as("border_left"),
        col("border_sides.top").as("border_top"))
    }),
    // dict-of-frames mode of read_csvs (separate_df=True): each file keyed
    // by basename; the gate re-unions the map with its key as a column
    "read_csvs_separate" -> ((s, d) => {
      val dir = s"${tmpDir()}/read_csvs_sep"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      val rows = nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey").collect()
      def csvOf(keep: Int => Boolean) =
        "n_nationkey,n_name,n_regionkey\n" + rows.filter(r => keep(r.getInt(2)))
          .map(r => s"${r.getInt(0)},${r.getString(1)},${r.getInt(2)}")
          .mkString("", "\n", "\n")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/low.csv"), csvOf(_ < 2))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/high.csv"), csvOf(_ >= 2))
      IoOps.readCsvsSeparate(s, s"$dir/*.csv",
          schema = Some("n_nationkey INT, n_name STRING, n_regionkey INT"))
        .toSeq.sortBy(_._1)
        .map { case (name, df) => df.withColumn("src", lit(name)) }
        .reduce(_ unionByName _)
    }),
    "math_log" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .addColumn("v", round(MathFunctions.log_(col("l_extendedprice")) * 1e6).cast("long"))
      .removeColumns("l_extendedprice")),
    "math_exp" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_discount")
      .addColumn("v", round(MathFunctions.exp_(col("l_discount")) * 1e10).cast("long"))),
    "math_normal_cdf" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_discount")
      .addColumn("v", round(gx.normal_cdf(col("l_discount") * 10 - 0.5) * 1e6).cast("long"))),
    "math_probit" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_discount")
      .addColumn("v", round(gx.probit(col("l_discount") + 0.01d) * 1e6).cast("long"))),
    "data_description" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .dataDescription()),
    // per-ROW invariants of the seeded noise (VERDICT r11 #8): clip bounds
    // hold deterministically; |jit − qty| ≤ |z| (clip moves toward qty) and
    // P(|z| > 6.5) ≈ 8e-11, so the 6.5 bound over 60k rows only trips on a
    // real bug. This makes the main row hash-comparable; the distributional
    // mean test lives in jitter_gate.
    "jitter" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .jitter("l_quantity", "qty_jit", scale = 1.0d, clip = Some((0d, 60d)))
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity") * 100).cast("long").as("qty_cents"),
        (col("qty_jit") >= 0d && col("qty_jit") <= 60d).as("in_clip"),
        (abs(col("qty_jit") - col("l_quantity")) <= 6.5d).as("noise_bounded"))),
    // seeded randn can't be replayed in DuckDB; pin the properties instead,
    // like the ANN recall gates: row count, clip bounds, unbiased noise
    // (|mean shift| over 60k N(0,1) draws is ~0.004 — the 0.05 bound only
    // trips on a real bug, not on seed variance)
    "jitter_gate" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .jitter("l_quantity", "qty_jit", scale = 1.0d, clip = Some((0d, 60d)))
      .agg(count(lit(1)).as("n"),
        (min(col("qty_jit")) >= 0d).as("clip_lo"),
        (max(col("qty_jit")) <= 60d).as("clip_hi"),
        (abs(avg(col("qty_jit") - col("l_quantity"))) < 0.05d).as("unbiased")))
  )

  val oracles: Map[String, String] = Map(
    "row_to_names" ->
      """SELECT n_name AS "NATION_0", n_regionkey AS "0" FROM nation WHERE n_nationkey <> 0""",
    "row_to_names_slice" ->
      """SELECT n_name AS "NATION_0_NATION_1", n_regionkey AS "0_1" FROM nation
        |WHERE n_name NOT IN ('NATION_0', 'NATION_1')""".stripMargin,
    "explode_index" ->
      """SELECT event_id, value AS m_v, user_id AS m_u FROM events""",
    "clean_names_values" ->
      """SELECT event_id, 'typ_e_' || event_type AS etype FROM events""",
    "get_features_targets" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem""",
    "convert_units" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |l_quantity * (1.0 / 0.45359237) + 0.0 AS qty_lb FROM lineitem""".stripMargin,
    "inflate_currency" ->
      s"""SELECT o_orderkey, o_totalprice * ${DomainOps.inflationFactor("USA", 2010, 2020)} AS o_totalprice FROM orders""",
    "inflate_currency_name" ->
      s"""SELECT o_orderkey, o_totalprice,
         |o_totalprice * ${DomainOps.inflationFactor("Germany", 2005, 2015)} AS o_totalprice_2015 FROM orders""".stripMargin,
    "get_symbol" ->
      """SELECT c_custkey,
        |CASE c_custkey % 4 WHEN 0 THEN 'AAPL' WHEN 1 THEN 'MSFT' WHEN 2 THEN 'GOOG' ELSE 'AMZN' END AS tick,
        |CASE c_custkey % 4 WHEN 0 THEN 'Apple Inc.' WHEN 1 THEN 'Microsoft Corporation'
        |  WHEN 2 THEN 'Alphabet Inc.' ELSE 'Amazon.com, Inc.' END AS company
        |FROM customer""".stripMargin,
    "convert_stock" ->
      """SELECT c_custkey,
        |CASE c_custkey % 4 WHEN 0 THEN 'aapl' WHEN 1 THEN 'msft' WHEN 2 THEN 'goog' ELSE 'amzn' END AS tick,
        |CASE c_custkey % 4 WHEN 0 THEN 'Apple Inc.' WHEN 1 THEN 'Microsoft Corporation'
        |  WHEN 2 THEN 'Alphabet Inc.' ELSE 'Amazon.com, Inc.' END AS company
        |FROM customer""".stripMargin,
    "join_fasta" ->
      """SELECT c_custkey, 'seq' || (c_custkey % 3) AS sid,
        |CASE c_custkey % 3 WHEN 0 THEN 'ACGTACGT' WHEN 1 THEN 'TTTT' ELSE 'GGCC' END AS sequence
        |FROM customer""".stripMargin,
    "read_csvs" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem WHERE l_orderkey < 100""",
    "read_commandline" ->
      """SELECT * FROM (VALUES (1, 'x'), (2, 'y')) t(a, b)""",
    "zorder_value" ->
      """WITH b AS (
        |  SELECT list_transform(generate_series(1, 15), i -> i * 3.0) AS qb,
        |         list_transform(generate_series(1, 15), i -> i * 4000.0) AS pb),
        |r AS (SELECT l_orderkey, l_linenumber,
        |  list_sum(list_transform(qb, x ->
        |    CASE WHEN CAST(l_quantity AS DOUBLE) > x THEN 1 ELSE 0 END)) AS rq,
        |  list_sum(list_transform(pb, x ->
        |    CASE WHEN CAST(l_extendedprice AS DOUBLE) > x THEN 1 ELSE 0 END)) AS rp
        |  FROM lineitem, b)
        |SELECT l_orderkey, l_linenumber, CAST(
        |  ((rq >> 0) & 1) * 1  + ((rp >> 0) & 1) * 2 +
        |  ((rq >> 1) & 1) * 4  + ((rp >> 1) & 1) * 8 +
        |  ((rq >> 2) & 1) * 16 + ((rp >> 2) & 1) * 32 +
        |  ((rq >> 3) & 1) * 64 + ((rp >> 3) & 1) * 128 AS BIGINT) AS z
        |FROM r""".stripMargin,
    "xlsx_table" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation""",
    "xlsx_cells" ->
      """SELECT 'A1' AS coordinate, 1 AS row, 1 AS column, 's' AS data_type, 'n_nationkey' AS value
        |UNION ALL SELECT 'B1', 1, 2, 's', 'n_name'
        |UNION ALL SELECT 'C1', 1, 3, 's', 'n_regionkey'
        |UNION ALL SELECT 'A' || CAST(n_nationkey + 2 AS VARCHAR), n_nationkey + 2, 1, 'n',
        |  CAST(n_nationkey AS VARCHAR) FROM nation
        |UNION ALL SELECT 'B' || CAST(n_nationkey + 2 AS VARCHAR), n_nationkey + 2, 2, 's',
        |  n_name FROM nation
        |UNION ALL SELECT 'C' || CAST(n_nationkey + 2 AS VARCHAR), n_nationkey + 2, 3, 'n',
        |  CAST(n_regionkey AS VARCHAR) FROM nation""".stripMargin,
    "xlsx_cells_bounded" ->
      """SELECT 'B' || CAST(n_nationkey + 2 AS VARCHAR) AS coordinate,
        |  n_nationkey + 2 AS row, 2 AS column, 's' AS data_type,
        |  n_name AS value FROM nation WHERE n_nationkey + 2 BETWEEN 2 AND 10
        |UNION ALL
        |SELECT 'C' || CAST(n_nationkey + 2 AS VARCHAR), n_nationkey + 2, 3, 'n',
        |  CAST(n_regionkey AS VARCHAR) FROM nation
        |WHERE n_nationkey + 2 BETWEEN 2 AND 10""".stripMargin,
    // pinned replica of the styled-header fixture: row 1 carries xf 1
    // (Arial 14 bold FFFF0000 on solid FFFFFF00, left thin / top medium),
    // data rows carry xf 0 (Calibri 11, no fill, no border → NULL sides)
    "xlsx_cells_style" ->
      """WITH hdr AS (SELECT * FROM (VALUES
        |    ('A1', 'n_nationkey'), ('B1', 'n_name'), ('C1', 'n_regionkey'))
        |  t(coordinate, value)),
        |h AS (SELECT coordinate, value, 'Arial' AS font_name, '14' AS font_size,
        |    TRUE AS font_bold, 'FFFF0000' AS font_color, 'solid' AS pattern_type,
        |    'FFFFFF00' AS fg_color, 'thin' AS border_left, 'medium' AS border_top
        |  FROM hdr),
        |d AS (
        |  SELECT 'A' || CAST(n_nationkey + 2 AS VARCHAR) AS coordinate,
        |    CAST(n_nationkey AS VARCHAR) AS value FROM nation
        |  UNION ALL SELECT 'B' || CAST(n_nationkey + 2 AS VARCHAR), n_name FROM nation
        |  UNION ALL SELECT 'C' || CAST(n_nationkey + 2 AS VARCHAR),
        |    CAST(n_regionkey AS VARCHAR) FROM nation),
        |dd AS (SELECT coordinate, value, 'Calibri' AS font_name, '11' AS font_size,
        |    FALSE AS font_bold, '' AS font_color, 'none' AS pattern_type,
        |    '' AS fg_color, CAST(NULL AS VARCHAR) AS border_left,
        |    CAST(NULL AS VARCHAR) AS border_top
        |  FROM d)
        |SELECT * FROM h UNION ALL SELECT * FROM dd""".stripMargin,
    "read_csvs_separate" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        |  CASE WHEN n_regionkey < 2 THEN 'low.csv' ELSE 'high.csv' END AS src
        |FROM nation""".stripMargin,
    "data_description" ->
      """SELECT 'l_orderkey' AS column_name, 'bigint' AS dtype, count(l_orderkey) AS count,
        |  count(*) - count(l_orderkey) AS null_count, CAST(NULL AS VARCHAR) AS description FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', 'double', count(l_quantity), count(*) - count(l_quantity), NULL FROM lineitem
        |UNION ALL
        |SELECT 'l_returnflag', 'string', count(l_returnflag), count(*) - count(l_returnflag), NULL FROM lineitem""".stripMargin,
    "math_log" ->
      """SELECT l_orderkey, l_linenumber,
        |CAST(round(ln(l_extendedprice) * 1e6) AS BIGINT) AS v FROM lineitem""".stripMargin,
    "math_exp" ->
      """SELECT l_orderkey, l_linenumber, l_discount,
        |CAST(round(exp(l_discount) * 1e10) AS BIGINT) AS v FROM lineitem""".stripMargin,
    // the engine's normal_cdf is the Abramowitz–Stegun 7.1.26 erf polynomial
    // (expressions.scala): replicating the identical double arithmetic in
    // SQL makes the query hash-comparable at the 6-dp float policy — no
    // erf() needed in DuckDB
    "math_normal_cdf" ->
      """SELECT l_orderkey, l_linenumber, l_discount,
        |CAST(round(0.5*(1.0 + (CASE WHEN u >= 0 THEN 1.0 ELSE -1.0 END) *
        |  (1.0 - (((((1.061405429*t - 1.453152027)*t) + 1.421413741)*t - 0.284496736)*t + 0.254829592)*t*exp(-u*u))) * 1e6) AS BIGINT) AS v
        |FROM (SELECT l_orderkey, l_linenumber, l_discount,
        |        (l_discount*10 - 0.5)/sqrt(2.0) AS u,
        |        1.0/(1.0 + 0.3275911*abs((l_discount*10 - 0.5)/sqrt(2.0))) AS t
        |      FROM lineitem)""".stripMargin,
    // Acklam's inverse-normal-CDF polynomial, same constants and operation
    // order as expressions.normPpf (query inputs stay in (0, 0.97575] so
    // the low/central branches cover them)
    "math_probit" ->
      """SELECT l_orderkey, l_linenumber, l_discount,
        |CAST(round((CASE WHEN p < 0.02425 THEN
        |  (((((-7.784894002430293e-03*q2+-3.223964580411365e-01)*q2+-2.400758277161838e+00)*q2+-2.549732539343734e+00)*q2+4.374664141464968e+00)*q2+2.938163982698783e+00)
        |  / ((((7.784695709041462e-03*q2+3.224671290700398e-01)*q2+2.445134137142996e+00)*q2+3.754408661907416e+00)*q2+1)
        |ELSE
        |  (((((-3.969683028665376e+01*r+2.209460984245205e+02)*r+-2.759285104469687e+02)*r+1.383577518672690e+02)*r+-3.066479806614716e+01)*r+2.506628277459239e+00)*q
        |  / (((((-5.447609879822406e+01*r+1.615858368580409e+02)*r+-1.556989798598866e+02)*r+6.680131188771972e+01)*r+-1.328068155288572e+01)*r+1)
        |END) * 1e6) AS BIGINT) AS v
        |FROM (SELECT l_orderkey, l_linenumber, l_discount, p, p-0.5 AS q,
        |        (p-0.5)*(p-0.5) AS r,
        |        CASE WHEN p < 0.02425 THEN sqrt(-2*ln(p)) ELSE 0 END AS q2
        |      FROM (SELECT l_orderkey, l_linenumber, l_discount,
        |              l_discount + 0.01 AS p FROM lineitem))""".stripMargin,
    "jitter_gate" ->
      """SELECT count(*) AS n, TRUE AS clip_lo, TRUE AS clip_hi, TRUE AS unbiased
        |FROM lineitem""".stripMargin,
    "jitter" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(round(l_quantity * 100) AS BIGINT) AS qty_cents,
        |  TRUE AS in_clip, TRUE AS noise_bounded
        |FROM lineitem""".stripMargin
  )
}
