package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** NATIVE xlsx reader/writer — ref file_connector.py:109-128 (the
  * reference reads/writes Excel via pandas/openpyxl; this build is
  * zero-egress, so the com.crealytics:spark-excel datasource cannot be
  * resolved and the format is implemented directly: an .xlsx is a zip
  * of small XML parts).
  *
  * Fidelity — the surface pandas.read_excel actually exercises:
  *  - any sheet by NAME (workbook.xml + its rels resolve the part;
  *    default = first sheet in workbook order), [[sheetNames]] lists;
  *  - shared / inline / plain string, numeric, and boolean cells;
  *  - DATE/TIME cells: numeric serials whose style resolves (via
  *    xl/styles.xml cellXfs → numFmtId, builtin or custom format
  *    code) to a date format are decoded to ISO strings — date-only
  *    serials to "yyyy-MM-dd", the rest to "yyyy-MM-dd HH:mm:ss"
  *    (second precision, the xlsx double's realistic resolution);
  *  - FORMULA cells read their cached `<v>` result — exactly
  *    pandas/openpyxl `data_only=True` semantics (a formula's text is
  *    never evaluated; Excel itself persists the last computed value).
  * NOT covered: styling/merged-cell geometry, and re-evaluating
  * formulas — for live formula engines use a spreadsheet, not an ETL.
  *
  * Scale design: the READ is distributed — `binaryFile` lists the
  * input (a directory of .xlsx shards or a single file), each file is
  * parsed ON AN EXECUTOR (StAX streaming, no DOM), one task per file;
  * only a single file's header is sniffed on the driver (the same
  * bounded role as CSV schema inference). The WRITE is driver-side by
  * the format's own nature: xlsx hard-caps a worksheet at 1,048,576
  * rows, so the bounded collect is enforced, not assumed — anything
  * bigger belongs in parquet, not a spreadsheet.
  */
object Excel {

  private val RowCap = 1048575 // xlsx worksheet limit minus header row

  // ---- zip + xml plumbing (pure JVM, runs on executors) ----

  private def entries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
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

  /** "BC7" -> 54 (0-based column index from an A1-style cell ref). */
  private def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  /** 0-based column index -> "A".."Z","AA".. */
  private def colName(idx: Int): String = {
    var i = idx + 1; val sb = new StringBuilder
    while (i > 0) { val r = (i - 1) % 26; sb.insert(0, ('A' + r).toChar); i = (i - 1) / 26 }
    sb.toString
  }

  private def newReader(xml: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    // untrusted spreadsheet input: no DTDs, no external entities
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(xml))
  }

  private def sharedStrings(z: Map[String, Array[Byte]]): IndexedSeq[String] =
    z.get("xl/sharedStrings.xml").map { xml =>
      val r = newReader(xml)
      val out = IndexedSeq.newBuilder[String]
      var cur: StringBuilder = null
      var inT = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "si" => cur = new StringBuilder
            case "t"  => inT = true
            case _    => ()
          }
          case XMLStreamConstants.CHARACTERS if inT && cur != null =>
            cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "t"  => inT = false
            case "si" => out += cur.toString; cur = null
            case _    => ()
          }
          case _ => ()
        }
      }
      r.close(); out.result()
    }.getOrElse(IndexedSeq.empty)

  // ---- workbook structure: ordered (sheet name, worksheet part) ----

  /** Sheets in WORKBOOK order with their resolved zip part names.
    * Falls back to the bare sheetN.xml listing (named by part) for
    * fragment workbooks without xl/workbook.xml.
    */
  private def sheetParts(z: Map[String, Array[Byte]]): Seq[(String, String)] = {
    val viaWorkbook = for {
      wb <- z.get("xl/workbook.xml")
      rels <- z.get("xl/_rels/workbook.xml.rels")
    } yield {
      val ridToTarget = {
        val r = newReader(rels)
        val m = Map.newBuilder[String, String]
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT &&
              r.getLocalName == "Relationship") {
            val id = r.getAttributeValue(null, "Id")
            val t = r.getAttributeValue(null, "Target")
            if (id != null && t != null)
              m += id -> (if (t.startsWith("/")) t.stripPrefix("/") else s"xl/$t")
          }
        }
        r.close(); m.result()
      }
      val r = newReader(wb)
      val out = Seq.newBuilder[(String, String)]
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          val name = r.getAttributeValue(null, "name")
          // the r:id attribute is namespaced; match by local name
          val rid = (0 until r.getAttributeCount)
            .find(i => r.getAttributeLocalName(i) == "id")
            .map(r.getAttributeValue)
          rid.flatMap(ridToTarget.get).foreach(p => out += ((name, p)))
        }
      }
      r.close(); out.result()
    }
    viaWorkbook.filter(_.nonEmpty).getOrElse {
      z.keys.filter(_.matches("xl/worksheets/sheet\\d+\\.xml"))
        .toSeq.sortBy(n => (n.length, n)).map(p => p -> p)
    }
  }

  /** Sheet names of the lexically-first workbook under `path`, in
    * workbook order (pandas.ExcelFile.sheet_names parity).
    */
  def sheetNames(spark: SparkSession, path: String): Seq[String] =
    sheetParts(entries(firstFile(spark, path))).map(_._1)

  // ---- styles: which style indices are date/time formats ----

  // builtin date/time numFmtIds (ECMA-376 §18.8.30): locale dates,
  // times, and the CJK era/date blocks
  private val builtinDateFmts: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet
  // of those, the ones carrying a time-of-day component (32-35 and
  // 55-58 are the CJK locale TIME blocks; 27-31/50-54 are era dates)
  private val builtinTimeFmts: Set[Int] =
    ((18 to 22) ++ (32 to 35) ++ (45 to 47) ++ (55 to 58)).toSet

  /** Format-code tokens OUTSIDE quoted literals, [bracket] sections,
    * and backslash escapes ("0.00" has none; [Red]yyyy\-mm has ymm).
    */
  private def fmtTokens(code: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < code.length) {
      code.charAt(i) match {
        case '"' => i += 1; while (i < code.length && code.charAt(i) != '"') i += 1; i += 1
        case '[' => while (i < code.length && code.charAt(i) != ']') i += 1; i += 1
        case '\\' => i += 2
        case c => sb.append(c); i += 1
      }
    }
    sb.toString.toLowerCase
  }

  /** A custom format code is a date format when it contains a
    * y/m/d/h/s token outside literals. */
  private[graft] def isDateFormatCode(code: String): Boolean =
    fmtTokens(code).exists("ymdhs".contains(_))

  /** ...and it carries a TIME component when h or s appear — decides
    * datetime vs date-only rendering, so one styled column cannot mix
    * the two string shapes (an integral serial under a datetime format
    * still renders midnight explicitly). */
  private[graft] def hasTimeComponent(code: String): Boolean =
    fmtTokens(code).exists("hs".contains(_))

  /** Style (cellXfs) indices whose number format is a date format,
    * mapped to whether the format carries a time component. */
  private def dateStyles(z: Map[String, Array[Byte]]): Map[Int, Boolean] =
    z.get("xl/styles.xml").map { xml =>
      val r = newReader(xml)
      val customDate = scala.collection.mutable.Map[Int, Boolean]()
      val xfFmts = ArrayBuffer[Int]()
      var inCellXfs = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "numFmt" =>
              val id = Option(r.getAttributeValue(null, "numFmtId")).map(_.toInt)
              val code = Option(r.getAttributeValue(null, "formatCode"))
              if (id.nonEmpty && code.exists(isDateFormatCode))
                customDate += id.get -> code.exists(hasTimeComponent)
            case "cellXfs" => inCellXfs = true
            case "xf" if inCellXfs =>
              xfFmts += Option(r.getAttributeValue(null, "numFmtId"))
                .map(_.toInt).getOrElse(0)
            case _ => ()
          }
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
            inCellXfs = false
          case _ => ()
        }
      }
      r.close()
      xfFmts.zipWithIndex.collect {
        case (fmt, i) if builtinDateFmts(fmt) || customDate.contains(fmt) =>
          i -> (builtinTimeFmts(fmt) || customDate.getOrElse(fmt, false))
      }.toMap
    }.getOrElse(Map.empty)

  // ---- date serials (1900 system, base 1899-12-30 like openpyxl) ----

  private val serialBase = java.time.LocalDate.of(1899, 12, 30)

  /** Excel serial → ISO string at second precision (a day is 86400 s;
    * the serial's double mantissa cannot carry reliable sub-second
    * anyway). `withTime` follows the cell's FORMAT, not the value, so
    * a datetime-styled column renders midnights as explicit
    * "... 00:00:00" and never mixes string shapes.
    */
  private[graft] def serialToString(serial: Double, withTime: Boolean): String = {
    val days = math.floor(serial).toLong
    val secs = math.round((serial - days) * 86400.0)
    val d = serialBase.plusDays(days + secs / 86400)
    val rem = secs % 86400
    if (!withTime && rem == 0L && serial == days.toDouble) d.toString
    else java.time.LocalDateTime.of(d, java.time.LocalTime.ofSecondOfDay(rem))
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
  }

  private def toSerial(ldt: java.time.LocalDateTime): Double =
    java.time.temporal.ChronoUnit.DAYS.between(serialBase, ldt.toLocalDate).toDouble +
      ldt.toLocalTime.toSecondOfDay.toDouble / 86400.0

  // ---- read ----

  /** Raw cell grid of one worksheet: one Array[String] per row (null =
    * missing cell), shared strings resolved, booleans normalized to
    * true/false, date-styled serials decoded to ISO strings, formula
    * cells yielding their cached value. Streaming StAX — memory is one
    * row, not the sheet. `sheet` = name; None = first in workbook
    * order.
    */
  private[graft] def rawRows(bytes: Array[Byte],
                             sheet: Option[String] = None): Vector[Array[String]] = {
    val z = entries(bytes)
    val parts = sheetParts(z)
    require(parts.nonEmpty, "not an xlsx workbook: no worksheet parts")
    val part = sheet match {
      case None => parts.head._2
      case Some(s) => parts.find(_._1 == s).map(_._2).getOrElse(
        throw new IllegalArgumentException(
          s"no sheet named '$s'; workbook has: ${parts.map(_._1).mkString(", ")}"))
    }
    val sst = sharedStrings(z)
    val dateXfs = dateStyles(z)
    val r = newReader(z.getOrElse(part,
      throw new IllegalArgumentException(s"workbook part missing: $part")))
    val rows = Vector.newBuilder[Array[String]]
    var cells: ArrayBuffer[(Int, String)] = null
    var cellCol = -1
    var cellType = "n"
    var cellStyle = -1
    var text: StringBuilder = null
    var capture = false
    var seq = 0
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => cells = ArrayBuffer.empty; seq = 0
          case "c" if cells != null =>
            val ref = r.getAttributeValue(null, "r")
            cellCol = if (ref != null) colIndex(ref) else seq
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
            cellStyle = Option(r.getAttributeValue(null, "s"))
              .flatMap(_.toIntOption).getOrElse(-1)
            text = new StringBuilder
          // `<f>` (the formula text) is deliberately NOT captured —
          // only the cached `<v>` result is read, like data_only=True
          case "v" | "t" if text != null => capture = true
          case _ => ()
        }
        case XMLStreamConstants.CHARACTERS if capture => text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" | "t" => capture = false
          case "c" if cells != null =>
            val raw = if (text == null) "" else text.toString
            val v = cellType match {
              case "s" if raw.trim.nonEmpty => sst(raw.trim.toInt)
              case "b"                      => if (raw.trim == "1") "true" else "false"
              case "n" | "" if dateXfs.contains(cellStyle) && raw.trim.nonEmpty =>
                raw.trim.toDoubleOption
                  .map(serialToString(_, dateXfs(cellStyle))).getOrElse(raw)
              case _                        => raw
            }
            if (raw.nonEmpty || cellType == "inlineStr" || cellType == "str")
              cells += cellCol -> v
            seq = cellCol + 1
            text = null
          case "row" if cells != null =>
            val width = if (cells.isEmpty) 0 else cells.map(_._1).max + 1
            val arr = new Array[String](width)
            cells.foreach { case (i, v) => if (i >= 0) arr(i) = v }
            rows += arr
            cells = null
          case _ => ()
        }
        case _ => ()
      }
    }
    r.close()
    rows.result()
  }

  private def firstFile(spark: SparkSession, path: String): Array[Byte] =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx").load(path)
      .orderBy(col("path")).limit(1)
      .select(col("content")).as(Encoders.BINARY).collect()
      .headOption.getOrElse(throw new IllegalArgumentException(
        s"no .xlsx files under $path"))

  /** Read a .xlsx file or a directory of them into a DataFrame.
    * Without `schema`, every column is STRING named by the header row;
    * with it, columns are cast by position-matched name (date cells
    * decode to ISO strings, so TimestampType/DateType casts work).
    * `sheet` picks a worksheet by name (default first). One Spark task
    * per file; the header is sniffed from the lexically-first file
    * only (all shards must share a layout, as with CSV).
    */
  def read(spark: SparkSession, path: String,
           schema: Option[StructType] = None,
           header: Boolean = true,
           sheet: Option[String] = None): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx").load(path)
      .select(col("path"), col("content"))
    val sniff = rawRows(firstFile(spark, path), sheet)
    require(sniff.nonEmpty, "empty worksheet: cannot derive columns")
    val names: Seq[String] = schema.map(_.fieldNames.toSeq).getOrElse {
      if (header)
        sniff.head.zipWithIndex.map { case (n, i) => if (n == null || n.isEmpty) s"_c$i" else n }.toSeq
      else sniff.head.indices.map(i => s"_c$i")
    }
    val width = names.length
    val stringSchema = StructType(names.map(StructField(_, StringType, nullable = true)))
    val raw = files.select(col("content")).as(Encoders.BINARY)
      .flatMap { bytes =>
        val rs = rawRows(bytes, sheet)
        val data = if (header) rs.drop(1) else rs
        data.iterator.map { arr =>
          Row.fromSeq((0 until width).map(i => if (i < arr.length) arr(i) else null))
        }
      }(Encoders.row(stringSchema))
    schema.fold(raw.toDF()) { st =>
      raw.select(st.fields.toSeq.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    }
  }

  // ---- write ----

  private def xmlEscape(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    // \r must be entity-escaped too: XML parsers normalize bare CR/CRLF
    // to LF in element content, which would corrupt a roundtrip
    case '\r' => "&#13;"
    case c if c < ' ' && c != '\t' && c != '\n' => f"_x${c.toInt}%04X_"
    case c => c.toString
  }

  // cellXfs written by writeSheets: 0 = default, 1 = datetime
  // (numFmtId 22, "m/d/yy h:mm"), 2 = date (numFmtId 14, "mm-dd-yy")
  private val stylesXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      |<fonts count="1"><font/></fonts>
      |<fills count="1"><fill><patternFill patternType="none"/></fill></fills>
      |<borders count="1"><border/></borders>
      |<cellStyleXfs count="1"><xf/></cellStyleXfs>
      |<cellXfs count="3"><xf numFmtId="0"/>
      |<xf numFmtId="22" applyNumberFormat="1"/>
      |<xf numFmtId="14" applyNumberFormat="1"/></cellXfs>
      |</styleSheet>""".stripMargin

  private def sheetXml(df: DataFrame): String = {
    // timestamps collect as instants (java.sql.Timestamp or, under the
    // java8 datetime API, java.time.Instant); the cell must carry the
    // SESSION-zone wall clock, which only coincides with
    // Timestamp.toLocalDateTime's JVM-default-zone reading when the
    // two zones agree — resolve via the session zone explicitly
    // resolve like Spark itself does: bare ZoneId.of rejects short ids
    // ("PST") and unpadded offsets ("GMT+8:00") that are perfectly
    // valid spark.sql.session.timeZone values
    val sessionZone = org.apache.spark.sql.catalyst.util.DateTimeUtils
      .getZoneId(df.sparkSession.conf.get("spark.sql.session.timeZone"))
    val rows = df.collect()
    require(rows.length <= RowCap,
      s"xlsx caps a worksheet at $RowCap data rows; got ${rows.length} — " +
        "export parquet/csv instead")
    val fields = df.schema.fields
    sealed trait Kind
    object KNum extends Kind; object KBool extends Kind
    object KTs extends Kind; object KDate extends Kind; object KStr extends Kind
    val kinds: Array[Kind] = fields.map(_.dataType match {
      case _: NumericType                    => KNum
      case BooleanType                       => KBool
      case TimestampType | TimestampNTZType  => KTs
      case DateType                          => KDate
      case _                                 => KStr
    })
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n")
    sb.append("<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
    def cellRef(r: Int, c: Int) = colName(c) + (r + 1)
    def inlineCell(r: Int, c: Int, s: String): Unit =
      sb.append(s"""<c r="${cellRef(r, c)}" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(s)}</t></is></c>""")
    sb.append("<row r=\"1\">")
    fields.zipWithIndex.foreach { case (f, i) => inlineCell(0, i, f.name) }
    sb.append("</row>")
    rows.zipWithIndex.foreach { case (row, ri) =>
      sb.append(s"""<row r="${ri + 2}">""")
      fields.indices.foreach { i =>
        if (!row.isNullAt(i)) kinds(i) match {
          case KNum =>
            sb.append(s"""<c r="${cellRef(ri + 1, i)}"><v>${row.get(i)}</v></c>""")
          case KBool =>
            sb.append(s"""<c r="${cellRef(ri + 1, i)}" t="b"><v>${if (row.getBoolean(i)) 1 else 0}</v></c>""")
          case KTs =>
            // wall-clock fields, not an instant: the cell must show the
            // same clock digits the session renders
            val ldt = row.get(i) match {
              case t: java.sql.Timestamp      => t.toInstant.atZone(sessionZone).toLocalDateTime
              case t: java.time.Instant       => t.atZone(sessionZone).toLocalDateTime
              case t: java.time.LocalDateTime => t // NTZ: already a wall clock
              case other => throw new IllegalArgumentException(
                s"unsupported timestamp value ${other.getClass.getName}")
            }
            sb.append(s"""<c r="${cellRef(ri + 1, i)}" s="1"><v>${toSerial(ldt)}</v></c>""")
          case KDate =>
            val ld = row.get(i) match {
              case d: java.sql.Date      => d.toLocalDate
              case d: java.time.LocalDate => d
              case other                 => java.time.LocalDate.parse(String.valueOf(other))
            }
            val days = java.time.temporal.ChronoUnit.DAYS.between(serialBase, ld)
            sb.append(s"""<c r="${cellRef(ri + 1, i)}" s="2"><v>$days</v></c>""")
          case KStr => inlineCell(ri + 1, i, String.valueOf(row.get(i)))
        }
      }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")
    sb.toString
  }

  /** Write one DataFrame as a single-sheet .xlsx workbook at `file`. */
  def write(df: DataFrame, file: String): Unit =
    writeSheets(Seq("Sheet1" -> df), file)

  /** Write a MULTI-SHEET workbook — one worksheet per (name, frame) in
    * order (pandas ExcelWriter parity, file_connector.py:118's
    * sheet_name branch). Header row + typed cells: numbers/bools
    * native, timestamps/dates as serials with date styles (so Excel —
    * and this reader — shows them as dates), everything else inline
    * strings. Each sheet independently enforces the row cap.
    */
  def writeSheets(sheets: Seq[(String, DataFrame)], file: String): Unit = {
    require(sheets.nonEmpty, "need at least one (name, DataFrame) sheet")
    require(sheets.map(_._1).distinct.size == sheets.size,
      "sheet names must be unique")
    val n = sheets.size
    val contentTypes = {
      val overrides = (1 to n).map(i =>
        s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
        .mkString("\n")
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
         |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
         |<Default Extension="xml" ContentType="application/xml"/>
         |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
         |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
         |$overrides
         |</Types>""".stripMargin
    }
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin
    val workbook = {
      val entries = sheets.zipWithIndex.map { case ((name, _), i) =>
        s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets>$entries</sheets>
         |</workbook>""".stripMargin
    }
    val wbRels = {
      val rels = (1 to n).map(i =>
        s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
        .mkString("\n")
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |$rels
         |<Relationship Id="rId${n + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
         |</Relationships>""".stripMargin
    }

    val f = new java.io.File(file)
    Option(f.getParentFile).foreach(_.mkdirs())
    val zout = new ZipOutputStream(new java.io.FileOutputStream(f))
    def put(name: String, content: String): Unit = {
      zout.putNextEntry(new ZipEntry(name))
      zout.write(content.getBytes("UTF-8"))
      zout.closeEntry()
    }
    try {
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", workbook)
      put("xl/_rels/workbook.xml.rels", wbRels)
      put("xl/styles.xml", stylesXml)
      sheets.zipWithIndex.foreach { case ((_, df), i) =>
        put(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(df))
      }
    } finally zout.close()
  }
}
