package graft.sources

import java.io.InputStream
import java.util.zip.ZipFile

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Native xlsx (SpreadsheetML) snapshot reader — closes the reference's
  * one remaining format gap (`weather_data_fetcher.py:365-372` reads
  * `all_locations.xlsx`; earlier rounds substituted CSV as "format is
  * incidental"). An .xlsx is a zip of XML parts; this reads the two
  * parts a data snapshot needs — `xl/sharedStrings.xml` and
  * `xl/worksheets/sheet1.xml` — with JDK-only primitives
  * (`java.util.zip` + StAX), no new dependencies.
  *
  * Semantics match the reference's pandas `read_excel(dtype=str)`
  * discipline: EVERY cell surfaces as a string (schema casts happen
  * afterwards, by name), so leading-zero PSGC codes survive exactly as
  * they do in the text cells of the real workbook. Missing cells are
  * null. Shared strings (including rich-text runs), inline strings,
  * formula-string and numeric/boolean cells are all handled.
  *
  * Scale note: a dimension snapshot (146 rows in the reference) is a
  * DRIVER-side read by design — same as the reference; fact-scale data
  * arrives as parquet, never xlsx.
  */
object Xlsx {

  private def secureFactory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    f
  }

  /** `xl/sharedStrings.xml`: one entry per `<si>`, rich-text `<t>` runs
    * concatenated.
    */
  private def parseSharedStrings(in: InputStream): Vector[String] = {
    val r = secureFactory.createXMLStreamReader(in)
    val out = Vector.newBuilder[String]
    var cur: StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "si" => cur = new StringBuilder
          case "t" => inT = true
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (inT && cur != null) cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "t" => inT = false
          case "si" => out += cur.toString; cur = null
          case _ =>
        }
        case _ =>
      }
    }
    r.close()
    out.result()
  }

  /** "BC12" → 0-based column index 54; empty ref → -1 (caller falls back
    * to position order, which the spec is allowed to omit).
    */
  private def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    if (letters.isEmpty) -1
    else letters.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1
  }

  /** `xl/worksheets/sheet1.xml` → rows of (0-based column → string). */
  private def parseSheet(in: InputStream, shared: Vector[String]): Vector[Map[Int, String]] = {
    val r = secureFactory.createXMLStreamReader(in)
    val rows = Vector.newBuilder[Map[Int, String]]
    var row: scala.collection.mutable.Map[Int, String] = null
    var nextPos = 0              // fallback when a cell carries no r= ref
    var cellCol = -1
    var cellType = ""
    var text: StringBuilder = null
    var capture = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => row = scala.collection.mutable.Map.empty; nextPos = 0
          case "c" if row != null =>
            val ref = Option(r.getAttributeValue(null, "r")).getOrElse("")
            val byRef = colIndex(ref)
            cellCol = if (byRef >= 0) byRef else nextPos
            nextPos = cellCol + 1
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
            text = null
          case "v" | "t" if row != null && cellCol >= 0 =>
            capture = true; if (text == null) text = new StringBuilder
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (capture) text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" | "t" => capture = false
          case "c" if row != null && cellCol >= 0 =>
            if (text != null) {
              val raw = text.toString
              val value = cellType match {
                case "s" =>
                  // An empty <v/> in a shared-string cell has no index
                  // to look up — treat as a missing cell, not a crash.
                  val idx = raw.trim
                  if (idx.isEmpty) null
                  else {
                    val i = idx.toInt
                    require(i >= 0 && i < shared.length,
                      s"shared-string index $i out of range (${shared.length} entries)")
                    shared(i)
                  }
                case _ => raw // inlineStr/str/n/b all surface verbatim
              }
              if (value != null) row.update(cellCol, value)
            }
            cellCol = -1
          case "row" => rows += row.toMap; row = null
          case _ =>
        }
        case _ =>
      }
    }
    r.close()
    rows.result()
  }

  /** Read sheet1: (header row, data rows aligned to the header width). */
  def readSheet(path: String): (Seq[String], Seq[Seq[Option[String]]]) = {
    val zip = new ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip.getInputStream(e)))
        .getOrElse(Vector.empty)
      val sheetEntry = Option(zip.getEntry("xl/worksheets/sheet1.xml"))
        .getOrElse(throw new IllegalArgumentException(s"$path: no xl/worksheets/sheet1.xml"))
      val rows = parseSheet(zip.getInputStream(sheetEntry), shared)
      require(rows.nonEmpty, s"$path: empty sheet")
      val width = rows.iterator.flatMap(_.keys).maxOption
        .getOrElse(throw new IllegalArgumentException(
          s"$path: sheet has rows but no cells (all <row/> empty)")) + 1
      val header = (0 until width).map(i => rows.head.getOrElse(i, s"_c$i"))
      val data = rows.tail.map(m => (0 until width).map(m.get))
      (header, data)
    } finally zip.close()
  }

  /** 0-based column index → A1-style letters: 0 → "A", 25 → "Z",
    * 26 → "AA".
    */
  private def colLetters(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) {
      val rem = (n - 1) % 26
      sb.insert(0, ('A' + rem).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  private def escXml(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Write sheet1 as a minimal SpreadsheetML workbook — the write half
    * of the reference's Excel round-trip (`weather_data_fetcher.py:365,
    * :426` `to_excel`). Every cell is an INLINE string
    * (`t="inlineStr"`, `xml:space="preserve"`): no sharedStrings part
    * to build, leading-zero PSGC codes and significant whitespace
    * survive byte-exactly, and [[readSheet]] reads its own output back
    * verbatim (round-trip pinned in XlsxSpec). `None` cells are
    * omitted — they read back as missing, same as a real workbook's
    * empty cells. Driver-side by design, same dim-scale guard as the
    * read side (the reference snapshot is 146 rows; facts are parquet).
    */
  def writeSheet(path: String, header: Seq[String], rows: Seq[Seq[Option[String]]]): Unit = {
    require(header.nonEmpty, "xlsx sheet needs at least a header row")
    val zip = new java.util.zip.ZipOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(path)))
    def part(name: String, body: String): Unit = {
      zip.putNextEntry(new java.util.zip.ZipEntry(name))
      zip.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    def rowXml(r: Int, cells: Seq[Option[String]]): String = {
      val cs = cells.iterator.zipWithIndex.collect { case (Some(v), i) =>
        s"""<c r="${colLetters(i)}${r + 1}" t="inlineStr">""" +
          s"""<is><t xml:space="preserve">${escXml(v)}</t></is></c>"""
      }
      cs.mkString(s"""<row r="${r + 1}">""", "", "</row>")
    }
    try {
      part("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        """</Types>""")
      part("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>""")
      part("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>""" +
        """</workbook>""")
      part("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
        """</Relationships>""")
      val body = new StringBuilder
      body.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      body.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      body.append(rowXml(0, header.map(Some(_))))
      rows.iterator.zipWithIndex.foreach { case (cells, i) =>
        body.append(rowXml(i + 1, cells))
      }
      body.append("""</sheetData></worksheet>""")
      part("xl/worksheets/sheet1.xml", body.toString)
    } finally zip.close()
  }

  /** Sheet1 as a DataFrame in `schema`'s column order and types: cells
    * load as strings (leading zeros intact) and cast by NAME, exactly
    * like [[TableStore.importSnapshotCsv]]'s schema-first discipline.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val (header, data) = readSheet(path)
    val missing = schema.fieldNames.filterNot(header.contains)
    require(missing.isEmpty, s"$path: header ${header.mkString(",")} lacks ${missing.mkString(",")}")
    val raw = StructType(header.map(h => StructField(h, StringType, nullable = true)))
    val rows = data.map(r => Row.fromSeq(r.map(_.orNull)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), raw)
      .select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
  }
}
