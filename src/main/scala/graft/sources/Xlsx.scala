package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable

/** Pure JVM xlsx (OOXML SpreadsheetML) reader — no Apache POI required.
  *
  * An .xlsx file is a zip of XML parts; everything needed for the reference's
  * two readers (janitor/io.py:159 `xlsx_table`, io.py:345 `xlsx_cells`) is
  * reachable with `java.util.zip` + the JDK's StAX parser:
  *
  *   - `xl/workbook.xml`            sheet names + relationship ids
  *   - `xl/_rels/workbook.xml.rels` rId -> worksheet part
  *   - `xl/sharedStrings.xml`       shared-string table (`t="s"` cells)
  *   - `xl/styles.xml`              cellXfs -> numFmtId -> format code
  *   - `xl/worksheets/sheetN.xml`   rows and cells
  *   - `xl/worksheets/_rels/...`    worksheet -> table parts
  *   - `xl/tables/tableN.xml`       named table name/ref/headerRowCount
  *
  * The parser is a pure function `Array[Byte] => Workbook`, so it runs
  * equally on the driver (single file) or inside executors over Spark's
  * `binaryFile` source (a directory of workbooks at scale) — see
  * [[IoOps.xlsxCellsGlob]].
  */
object Xlsx {

  /** One parsed cell. `internalValue` is the raw stored string (shared-string
    * index already resolved); `value` is the display value openpyxl would
    * give: booleans as TRUE/FALSE, date-formatted serials as ISO timestamps,
    * integral numbers without a trailing `.0`.
    */
  final case class Cell(sheet: String, coordinate: String, row: Int, column: Int,
      dataType: String, isDate: Boolean, numberFormat: String,
      value: String, internalValue: String, styleIdx: Int = -1)

  /** Style attributes resolved per cellXf (reference: janitor/io.py:345 —
    * openpyxl's fill/font/border structs; scoped to the commonly-queried
    * attributes rather than the full openpyxl object graph).
    */
  final case class FontDef(name: String, size: String, bold: Boolean,
      italic: Boolean, color: String)
  final case class FillDef(pattern: String, fgColor: String)
  /** cellXf → (numFmtId, fontId, fillId, borderId). */
  final case class XfDef(numFmtId: Int, fontId: Int, fillId: Int, borderId: Int)
  final case class Styles(numFmtById: Map[Int, String], xfs: IndexedSeq[XfDef],
      fonts: IndexedSeq[FontDef], fills: IndexedSeq[FillDef],
      borders: IndexedSeq[String]) {
    def fontOf(styleIdx: Int): Option[FontDef] =
      xfs.lift(styleIdx).flatMap(xf => fonts.lift(xf.fontId))
    def fillOf(styleIdx: Int): Option[FillDef] =
      xfs.lift(styleIdx).flatMap(xf => fills.lift(xf.fillId))
    def borderOf(styleIdx: Int): Option[String] =
      xfs.lift(styleIdx).flatMap(xf => borders.lift(xf.borderId))
  }
  object Styles { val empty = Styles(Map.empty, IndexedSeq.empty,
    IndexedSeq.empty, IndexedSeq.empty, IndexedSeq.empty) }

  /** A named Excel table (`xl/tables/tableN.xml`). `ref` like "A1:C6". */
  final case class TableDef(name: String, sheet: String, ref: String,
      headerRowCount: Int)

  final case class Workbook(sheetNames: Seq[String], cells: Seq[Cell],
      tables: Seq[TableDef], styles: Styles = Styles.empty)

  // ---------------------------------------------------------------- parsing

  def parse(bytes: Array[Byte]): Workbook = {
    val parts = readZip(bytes)
    val shared = parts.get("xl/sharedStrings.xml").map(parseSharedStrings)
      .getOrElse(IndexedSeq.empty)
    val styles = parts.get("xl/styles.xml").map(parseStyles)
      .getOrElse(Styles.empty)
    val rels = parts.get("xl/_rels/workbook.xml.rels").map(parseRels)
      .getOrElse(Map.empty)
    val sheets = parts.get("xl/workbook.xml").map(parseWorkbook)
      .getOrElse(Seq.empty)

    val cells = mutable.ArrayBuffer.empty[Cell]
    val tables = mutable.ArrayBuffer.empty[TableDef]
    for ((sheetName, rId) <- sheets) {
      val target = rels.getOrElse(rId, "")
      val partName = resolvePart("xl/", target)
      for (sheetXml <- parts.get(partName)) {
        cells ++= parseSheet(sheetXml, sheetName, shared, styles)
        // table parts hang off the worksheet's own rels
        val relPart = {
          val i = partName.lastIndexOf('/')
          partName.substring(0, i + 1) + "_rels/" + partName.substring(i + 1) + ".rels"
        }
        for (relXml <- parts.get(relPart); (_, tgt) <- parseRels(relXml)
            if tgt.contains("tables/")) {
          val tablePart = resolvePart(partName.substring(0, partName.lastIndexOf('/') + 1), tgt)
          for (tXml <- parts.get(tablePart))
            tables += parseTable(tXml, sheetName)
        }
      }
    }
    Workbook(sheets.map(_._1), cells.toSeq, tables.toSeq, styles)
  }

  private def readZip(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out += e.getName -> zin.readAllBytes()
      e = zin.getNextEntry
    }
    zin.close()
    out.result()
  }

  /** Resolve a relationship target ("worksheets/sheet1.xml", "../tables/t.xml")
    * against the part directory it is relative to.
    */
  private def resolvePart(baseDir: String, target: String): String = {
    var dir = baseDir
    var t = target
    while (t.startsWith("../")) {
      t = t.substring(3)
      dir = dir.dropRight(1).substring(0, math.max(dir.dropRight(1).lastIndexOf('/') + 1, 0))
    }
    if (t.startsWith("/")) t.substring(1) else dir + t
  }

  private def newReader(xml: Array[Byte]): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_NAMESPACE_AWARE, java.lang.Boolean.TRUE)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    f.createXMLStreamReader(new ByteArrayInputStream(xml))
  }

  private def attr(r: XMLStreamReader, name: String): Option[String] = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == name) return Some(r.getAttributeValue(i))
      i += 1
    }
    None
  }

  /** workbook.xml -> (sheetName, rId) in file order. */
  private def parseWorkbook(xml: Array[Byte]): Seq[(String, String)] = {
    val r = newReader(xml)
    val out = mutable.ArrayBuffer.empty[(String, String)]
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet")
        for (n <- attr(r, "name"); id <- attr(r, "id")) out += n -> id
    }
    r.close(); out.toSeq
  }

  /** *.rels -> rId -> Target. */
  private def parseRels(xml: Array[Byte]): Map[String, String] = {
    val r = newReader(xml)
    val out = Map.newBuilder[String, String]
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship")
        for (id <- attr(r, "Id"); t <- attr(r, "Target")) out += id -> t
    }
    r.close(); out.result()
  }

  /** sharedStrings.xml -> indexed strings; rich-text runs concatenated. */
  private def parseSharedStrings(xml: Array[Byte]): IndexedSeq[String] = {
    val r = newReader(xml)
    val out = mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    var inSi = false
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; cur.setLength(0)
            case "t" if inSi => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inT =>
          cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => inSi = false; out += cur.toString
            case _ =>
          }
        case _ =>
      }
    }
    r.close(); out.toIndexedSeq
  }

  /** Builtin number formats that matter for display + date detection
    * (ECMA-376 §18.8.30; same table openpyxl ships as BUILTIN_FORMATS).
    */
  private val builtinFormats: Map[Int, String] = Map(
    0 -> "General", 1 -> "0", 2 -> "0.00", 3 -> "#,##0", 4 -> "#,##0.00",
    9 -> "0%", 10 -> "0.00%", 11 -> "0.00E+00", 12 -> "# ?/?", 13 -> "# ??/??",
    14 -> "mm-dd-yy", 15 -> "d-mmm-yy", 16 -> "d-mmm", 17 -> "mmm-yy",
    18 -> "h:mm AM/PM", 19 -> "h:mm:ss AM/PM", 20 -> "h:mm", 21 -> "h:mm:ss",
    22 -> "m/d/yy h:mm", 37 -> "#,##0 ;(#,##0)", 38 -> "#,##0 ;[Red](#,##0)",
    39 -> "#,##0.00;(#,##0.00)", 40 -> "#,##0.00;[Red](#,##0.00)",
    45 -> "mm:ss", 46 -> "[h]:mm:ss", 47 -> "mmss.0", 48 -> "##0.0E+0",
    49 -> "@")

  /** styles.xml -> [[Styles]]: custom number formats, cellXfs (numFmt /
    * font / fill / border ids), and the font/fill/border tables themselves.
    * Container flags matter: dxfs and cellStyleXfs also contain
    * font/fill/border/xf elements that must NOT land in the main tables.
    */
  private def parseStyles(xml: Array[Byte]): Styles = {
    val r = newReader(xml)
    val custom = Map.newBuilder[Int, String]
    val xfs = mutable.ArrayBuffer.empty[XfDef]
    val fonts = mutable.ArrayBuffer.empty[FontDef]
    val fills = mutable.ArrayBuffer.empty[FillDef]
    val borders = mutable.ArrayBuffer.empty[String]
    var inCellXfs = false; var inFonts = false; var inFills = false
    var inBorders = false
    // accumulators for the element currently being parsed
    var fName = ""; var fSize = ""; var fBold = false; var fItalic = false
    var fColor = ""
    var fillPattern = ""; var fillFg = ""; var inPatternFill = false
    val borderSides = mutable.ArrayBuffer.empty[String]
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "numFmt" =>
              for (id <- attr(r, "numFmtId"); code <- attr(r, "formatCode"))
                custom += id.toInt -> code
            case "cellXfs" => inCellXfs = true
            case "fonts" => inFonts = true
            case "fills" => inFills = true
            case "borders" => inBorders = true
            case "xf" if inCellXfs =>
              xfs += XfDef(
                attr(r, "numFmtId").map(_.toInt).getOrElse(0),
                attr(r, "fontId").map(_.toInt).getOrElse(0),
                attr(r, "fillId").map(_.toInt).getOrElse(0),
                attr(r, "borderId").map(_.toInt).getOrElse(0))
            case "font" if inFonts =>
              fName = ""; fSize = ""; fBold = false; fItalic = false; fColor = ""
            case "name" if inFonts => fName = attr(r, "val").getOrElse("")
            case "sz" if inFonts => fSize = attr(r, "val").getOrElse("")
            case "b" if inFonts => fBold = !attr(r, "val").contains("0")
            case "i" if inFonts => fItalic = !attr(r, "val").contains("0")
            case "color" if inFonts && !inFills =>
              fColor = attr(r, "rgb").orElse(attr(r, "theme").map("theme:" + _))
                .getOrElse("")
            case "fill" if inFills => fillPattern = ""; fillFg = ""
            case "patternFill" if inFills =>
              inPatternFill = true
              fillPattern = attr(r, "patternType").getOrElse("")
            case "fgColor" if inPatternFill =>
              fillFg = attr(r, "rgb").orElse(attr(r, "theme").map("theme:" + _))
                .orElse(attr(r, "indexed").map("indexed:" + _)).getOrElse("")
            case "border" if inBorders => borderSides.clear()
            case side @ ("left" | "right" | "top" | "bottom" | "diagonal")
                if inBorders =>
              attr(r, "style").foreach(s => borderSides += s"$side:$s")
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "cellXfs" => inCellXfs = false
            case "fonts" => inFonts = false
            case "fills" => inFills = false
            case "borders" => inBorders = false
            case "font" if inFonts =>
              fonts += FontDef(fName, fSize, fBold, fItalic, fColor)
            case "patternFill" => inPatternFill = false
            case "fill" if inFills => fills += FillDef(fillPattern, fillFg)
            case "border" if inBorders => borders += borderSides.mkString(";")
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    Styles(custom.result(), xfs.toIndexedSeq, fonts.toIndexedSeq,
      fills.toIndexedSeq, borders.toIndexedSeq)
  }

  /** Date detection mirrors openpyxl `is_date_format`: a format containing
    * y/m/d/h/s date tokens outside string literals/brackets is a date format.
    */
  private[graft] def isDateFormat(code: String): Boolean = {
    if (code == "General" || code == "@") return false
    val noLiterals = code.replaceAll("\"[^\"]*\"", "").replaceAll("\\[[^\\]]*\\]", "")
      .replaceAll("\\\\.", "")
    noLiterals.exists(c => "ymdhsYMDHS".indexOf(c) >= 0)
  }

  /** Excel serial day -> ISO timestamp (1900 date system, with Excel's
    * deliberate 1900-02-29 leap-year bug: serials >= 60 are one day ahead).
    */
  private[graft] def serialToIso(serial: Double): String = {
    val adjusted = if (serial >= 60) serial - 1 else serial
    val epoch = java.time.LocalDate.of(1899, 12, 31)
    var days = math.floor(adjusted).toLong
    val frac = adjusted - days
    var secs = math.round(frac * 86400d)
    // a fraction like .9999999 rounds to a full day: roll the date, not the
    // clock (otherwise we'd print "<day+1> 00:00:00" as a timestamp instead
    // of a bare date)
    if (secs == 86400) { days += 1; secs = 0 }
    val dt = epoch.plusDays(days).atStartOfDay().plusSeconds(secs)
    if (secs == 0) dt.toLocalDate.toString else dt.toString.replace('T', ' ')
  }

  private def formatNumeric(raw: String): String = {
    val d = raw.toDouble
    if (d == math.floor(d) && !d.isInfinite && math.abs(d) < 1e15) {
      val l = d.toLong
      l.toString
    } else raw
  }

  private def parseSheet(xml: Array[Byte], sheetName: String,
      shared: IndexedSeq[String], styles: Styles): Seq[Cell] = {
    val r = newReader(xml)
    val out = mutable.ArrayBuffer.empty[Cell]
    var coord = ""
    var cellType = "n"
    var styleIdx = -1
    var inV = false
    var inIsT = false
    val v = new java.lang.StringBuilder
    var sawValue = false
    var rowNum = 0

    def flush(): Unit = {
      val (cIdx, rIdx) = parseCoord(coord, rowNum)
      val numFmtId = styles.xfs.lift(styleIdx).map(_.numFmtId).getOrElse(0)
      val numFmt = styles.numFmtById.getOrElse(numFmtId,
        builtinFormats.getOrElse(numFmtId, "General"))
      val raw = v.toString
      val (dataType, isDate, display, internal) =
        if (!sawValue) ("n", false, null, null) // blank cell
        else cellType match {
          case "s" =>
            val s = shared.lift(raw.trim.toInt).getOrElse("")
            ("s", false, s, s)
          case "str" | "inlineStr" => ("s", false, raw, raw)
          case "b" =>
            val b = raw.trim == "1"
            ("b", false, if (b) "TRUE" else "FALSE", raw.trim)
          case "e" => ("e", false, raw, raw)
          case "d" => ("d", true, raw, raw)
          case _ => // "n"
            val dated = isDateFormat(numFmt)
            if (dated) ("d", true, serialToIso(raw.trim.toDouble), raw.trim)
            else ("n", false, formatNumeric(raw.trim), raw.trim)
        }
      out += Cell(sheetName, coord, rIdx, cIdx, dataType, isDate, numFmt,
        display, internal, styleIdx)
    }

    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => rowNum = attr(r, "r").map(_.toInt).getOrElse(rowNum + 1)
            case "c" =>
              coord = attr(r, "r").getOrElse("")
              cellType = attr(r, "t").getOrElse("n")
              // no s attribute = cellXf 0, the workbook default style
              styleIdx = attr(r, "s").map(_.toInt).getOrElse(0)
              v.setLength(0); sawValue = false
            case "v" => inV = true; sawValue = true
            case "t" if cellType == "inlineStr" => inIsT = true; sawValue = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inV || inIsT =>
          v.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "t" if inIsT => inIsT = false
            case "c" => flush()
            case _ =>
          }
        case _ =>
      }
    }
    r.close(); out.toSeq
  }

  private def parseTable(xml: Array[Byte], sheetName: String): TableDef = {
    val r = newReader(xml)
    var name = ""; var ref = ""; var hdr = 1
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "table") {
        name = attr(r, "displayName").orElse(attr(r, "name")).getOrElse("")
        ref = attr(r, "ref").getOrElse("")
        hdr = attr(r, "headerRowCount").map(_.toInt).getOrElse(1)
      }
    }
    r.close(); TableDef(name, sheetName, ref, hdr)
  }

  /** "BC23" -> (column=55, row=23). Falls back to the row element's counter
    * when the coordinate attribute is absent (some writers omit it).
    */
  private[graft] def parseCoord(coord: String, fallbackRow: Int): (Int, Int) = {
    if (coord.isEmpty) return (0, fallbackRow)
    var i = 0
    var c = 0
    while (i < coord.length && coord.charAt(i).isLetter) {
      c = c * 26 + (coord.charAt(i).toUpper - 'A' + 1); i += 1
    }
    val row = if (i < coord.length) coord.substring(i).toInt else fallbackRow
    (c, row)
  }

  private[graft] def colLetters(c: Int): String = {
    var n = c
    val sb = new StringBuilder
    while (n > 0) {
      val rem = (n - 1) % 26
      sb.insert(0, ('A' + rem).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  /** "A1:C6" -> (colLo, rowLo, colHi, rowHi). Single-cell tables may carry a
    * colon-less ref ("A1"), which some writers emit: lo == hi.
    */
  private[graft] def parseRef(ref: String): (Int, Int, Int, Int) = {
    val (lo, hi) = ref.split(":", 2) match {
      case Array(only)  => (only, only)
      case Array(a, b)  => (a, b)
    }
    val (c1, r1) = parseCoord(lo, 1)
    val (c2, r2) = parseCoord(hi, 1)
    (c1, r1, c2, r2)
  }

  // ---------------------------------------------------------------- writing

  /** Minimal xlsx writer — enough OOXML for round-tripping tests and gate
    * inputs (inline strings, ISO-less numerics, one optional named table per
    * sheet). Not part of the reference surface; used by specs and the gate.
    */
  private[graft] object Writer {
    /** rows: header row first if `tableName` is set. Values may be
      * String / Long / Int / Double / Boolean / null.
      */
    def write(path: String, rows: Seq[Seq[Any]], sheetName: String = "Sheet1",
        tableName: Option[String] = None, headerRowCount: Int = 1,
        styledHeader: Boolean = false): Unit = {
      val bytes = toBytes(rows, sheetName, tableName, headerRowCount, styledHeader)
      java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
    }

    /** styles.xml emitted when `styledHeader` is set: xf 0 = workbook default
      * (Calibri 11, no fill, no border), xf 1 = the header style (Arial 14
      * bold on solid yellow with a thin/medium box border) — the fixture the
      * style-parity gate pins value-for-value.
      */
    private val headerStylesXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        """<fonts count="2">""" +
        """<font><sz val="11"/><name val="Calibri"/></font>""" +
        """<font><b/><sz val="14"/><color rgb="FFFF0000"/><name val="Arial"/></font>""" +
        """</fonts>""" +
        """<fills count="3"><fill><patternFill patternType="none"/></fill>""" +
        """<fill><patternFill patternType="gray125"/></fill>""" +
        """<fill><patternFill patternType="solid"><fgColor rgb="FFFFFF00"/></patternFill></fill></fills>""" +
        """<borders count="2"><border><left/><right/><top/><bottom/><diagonal/></border>""" +
        """<border><left style="thin"/><right style="thin"/><top style="medium"/><bottom/><diagonal/></border></borders>""" +
        """<cellXfs count="2">""" +
        """<xf numFmtId="0" fontId="0" fillId="0" borderId="0"/>""" +
        """<xf numFmtId="0" fontId="1" fillId="2" borderId="1"/>""" +
        """</cellXfs></styleSheet>"""

    def toBytes(rows: Seq[Seq[Any]], sheetName: String,
        tableName: Option[String], headerRowCount: Int = 1,
        styledHeader: Boolean = false): Array[Byte] = {
      val nCols = rows.map(_.length).maxOption.getOrElse(0)
      val ref = s"A1:${colLetters(math.max(nCols, 1))}${math.max(rows.length, 1)}"

      val sheetSb = new StringBuilder
      sheetSb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
      sheetSb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheetData>"""
      rows.zipWithIndex.foreach { case (cells, ri) =>
        sheetSb ++= s"""<row r="${ri + 1}">"""
        val sAttr = if (styledHeader && ri < headerRowCount) """ s="1"""" else ""
        cells.zipWithIndex.foreach { case (cell, ci) =>
          val coord = s"${colLetters(ci + 1)}${ri + 1}"
          cell match {
            case null => ()
            case b: Boolean =>
              sheetSb ++= s"""<c r="$coord"$sAttr t="b"><v>${if (b) 1 else 0}</v></c>"""
            case n @ (_: Long | _: Int | _: Double | _: Float | _: Short | _: Byte) =>
              sheetSb ++= s"""<c r="$coord"$sAttr><v>$n</v></c>"""
            case s =>
              sheetSb ++= s"""<c r="$coord"$sAttr t="inlineStr"><is><t>${escape(s.toString)}</t></is></c>"""
          }
        }
        sheetSb ++= "</row>"
      }
      sheetSb ++= "</sheetData>"
      if (tableName.isDefined)
        sheetSb ++= """<tableParts count="1"><tablePart r:id="rId1"/></tableParts>"""
      sheetSb ++= "</worksheet>"

      val parts = mutable.LinkedHashMap[String, String](
        "[Content_Types].xml" ->
          (s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
            """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
            """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
            """<Default Extension="xml" ContentType="application/xml"/>""" +
            """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
            """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
            (if (tableName.isDefined)
              """<Override PartName="/xl/tables/table1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.table+xml"/>"""
            else "") +
            (if (styledHeader)
              """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>"""
            else "") +
            "</Types>"),
        "_rels/.rels" ->
          ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
            """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
            """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
            "</Relationships>"),
        "xl/workbook.xml" ->
          ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
            """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
            s"""<sheets><sheet name="${escape(sheetName)}" sheetId="1" r:id="rId1"/></sheets>""" +
            "</workbook>"),
        "xl/_rels/workbook.xml.rels" ->
          ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
            """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
            """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
            // conformant consumers locate the stylesheet via this rel, not
            // by the hardcoded part name our own parser uses
            (if (styledHeader)
              """<Relationship Id="rId100" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>"""
            else "") +
            "</Relationships>"),
        "xl/worksheets/sheet1.xml" -> sheetSb.toString)

      if (styledHeader) parts += "xl/styles.xml" -> headerStylesXml

      tableName.foreach { tn =>
        parts += "xl/worksheets/_rels/sheet1.xml.rels" ->
          ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
            """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
            """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/table" Target="../tables/table1.xml"/>""" +
            "</Relationships>")
        parts += "xl/tables/table1.xml" ->
          ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
            s"""<table xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" id="1" name="${escape(tn)}" displayName="${escape(tn)}" ref="$ref" headerRowCount="$headerRowCount">""" +
            s"""<tableColumns count="$nCols">""" +
            // OOXML requires tableColumn names to match the header cell text
            // AND be unique within the table (duplicate names make Excel
            // repair/reject the file) — de-duplicate with a numeric suffix
            // like openpyxl; fall back to c<i> when the header row is
            // short/absent
            {
              val seen = mutable.HashSet[String]()
              (1 to nCols).map { i =>
                val hdr = rows.headOption.flatMap(_.lift(i - 1)).flatMap(Option(_))
                  .map(_.toString).filter(_.nonEmpty).getOrElse(s"c$i")
                val name = Iterator.from(1)
                  .map(k => if (k == 1) hdr else s"$hdr$k")
                  .find(seen.add)
                  .get
                s"""<tableColumn id="$i" name="${escape(name)}"/>"""
              }.mkString
            } +
            "</tableColumns></table>")
      }

      val bos = new ByteArrayOutputStream()
      val zos = new ZipOutputStream(bos)
      parts.foreach { case (name, content) =>
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes("UTF-8"))
        zos.closeEntry()
      }
      zos.close()
      bos.toByteArray
    }

    private def escape(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
  }
}
