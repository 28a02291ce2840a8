package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Minimal NATIVE xlsx reader/writer — ref file_connector.py:109-128
  * (the reference reads/writes Excel via pandas/openpyxl; this build is
  * zero-egress, so the com.crealytics:spark-excel datasource cannot be
  * resolved and the format is implemented directly: an .xlsx is a zip
  * of small XML parts).
  *
  * Scope — data-interchange sheets, which is what a metadata-ETL uses
  * Excel for: first worksheet, header row, shared/inline/numeric/bool
  * cells. NOT covered: date serial numbers + number formats, formulas,
  * styling, multiple sheets — for full-fidelity spreadsheets add the
  * external spark-excel datasource on a cluster with egress.
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

  /** Raw cell grid of the first worksheet: one Array[String] per row
    * (null = missing cell), shared strings resolved, booleans
    * normalized to true/false. Streaming StAX — memory is one row, not
    * the sheet.
    */
  private[graft] def rawRows(bytes: Array[Byte]): Vector[Array[String]] = {
    val z = entries(bytes)
    val sheet = z.keys.filter(_.matches("xl/worksheets/sheet\\d+\\.xml"))
      .toSeq.sortBy(n => (n.length, n)).headOption
      .getOrElse(throw new IllegalArgumentException(
        "not an xlsx workbook: no xl/worksheets/sheet*.xml part"))
    val sst = sharedStrings(z)
    val r = newReader(z(sheet))
    val rows = Vector.newBuilder[Array[String]]
    var cells: ArrayBuffer[(Int, String)] = null
    var cellCol = -1
    var cellType = "n"
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
            text = new StringBuilder
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

  // ---- read ----

  /** Read a .xlsx file or a directory of them into a DataFrame.
    * Without `schema`, every column is STRING named by the header row;
    * with it, columns are cast by position-matched name. One Spark
    * task per file; the header is sniffed from the lexically-first
    * file only (all shards must share a layout, as with CSV).
    */
  def read(spark: SparkSession, path: String,
           schema: Option[StructType] = None,
           header: Boolean = true): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx").load(path)
      .select(col("path"), col("content"))
    val firstBytes = files.orderBy(col("path")).limit(1)
      .select(col("content")).as(Encoders.BINARY).collect()
      .headOption.getOrElse(throw new IllegalArgumentException(
        s"no .xlsx files under $path"))
    val sniff = rawRows(firstBytes)
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
        val rs = rawRows(bytes)
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

  /** Write `df` as a single .xlsx workbook at `file` (header row +
    * inline-string/number cells). Enforces the format's 1,048,575
    * data-row cap — the collect is bounded by the file format itself,
    * which is why a driver-side write is correct here; bigger data is
    * not a spreadsheet.
    */
  def write(df: DataFrame, file: String): Unit = {
    val rows = df.collect()
    require(rows.length <= RowCap,
      s"xlsx caps a worksheet at $RowCap data rows; got ${rows.length} — " +
        "export parquet/csv instead")
    val fields = df.schema.fields
    val numeric = fields.map(_.dataType match {
      case _: NumericType => true
      case _              => false
    })
    val bool = fields.map(_.dataType == BooleanType)
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
        if (!row.isNullAt(i)) {
          if (numeric(i))
            sb.append(s"""<c r="${cellRef(ri + 1, i)}"><v>${row.get(i)}</v></c>""")
          else if (bool(i))
            sb.append(s"""<c r="${cellRef(ri + 1, i)}" t="b"><v>${if (row.getBoolean(i)) 1 else 0}</v></c>""")
          else inlineCell(ri + 1, i, String.valueOf(row.get(i)))
        }
      }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")

    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin

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
      put("xl/worksheets/sheet1.xml", sb.toString)
    } finally zout.close()
  }
}
