package graft.sinks

import java.io.{BufferedOutputStream, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Human-facing presentation sinks (SURVEY §2.2 K1/K2): a multi-sheet
  * Excel workbook and an Excel-compatible BOM-prefixed CSV export,
  * mirroring the reference's export stage
  * (`/root/reference/bangumi_data_ingestion.py:479-524`).
  *
  * The xlsx writer is pure JDK — an .xlsx file is a zip of OOXML parts, so
  * `java.util.zip` plus hand-built XML covers the reference's
  * `pd.ExcelWriter(engine="openpyxl")` surface without new dependencies.
  *
  * Scale posture: a workbook is a bounded, driver-side artifact by nature
  * (Excel caps a sheet at 1,048,576 rows). Rows stream through
  * `toLocalIterator` (one partition in memory at a time) straight into the
  * zip stream, and the writer REFUSES — loudly, no silent truncation — any
  * sheet that exceeds the cap. The per-column width pass is the distributed
  * A4 max-length aggregate (one job per sheet), not a driver scan.
  */
object Workbook {

  /** Excel's hard per-sheet row limit, minus the header row. */
  val MaxDataRows: Int = 1048575

  /** Excel's per-cell character limit; longer strings are truncated (the
    * same bound openpyxl enforces). */
  val MaxCellChars: Int = 32767

  private val SheetNs = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
  private val RelNs = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

  /** Excel's 1900-system day-serial anchor (1899-12-30 absorbs the
    * deliberate off-by-two of the Lotus leap-year bug; openpyxl uses the
    * same convention, so serials agree for all dates from 1900-03-01 on). */
  private val ExcelEpoch = java.time.LocalDate.of(1899, 12, 30)

  /** cellXfs indices in styles.xml (0 = default). */
  private val DateTimeStyle = 1
  private val DateStyle = 2

  /** Reference width rule (`bangumi_data_ingestion.py:508-516`):
    * min(max(longest value, header) + 2, 50). */
  def columnWidths(df: DataFrame): Seq[Double] = {
    // one distributed pass: max(length(cast(col as string))) per column
    val row = df.select(df.columns.toIndexedSeq.map(c =>
      max(length(col(c).cast("string"))).as(c)): _*).head()
    df.columns.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      val maxLen = if (row.isNullAt(i)) 0 else row.getInt(i)
      math.min(math.max(maxLen, c.length) + 2, 50).toDouble
    }
  }

  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      // XML 1.0 forbids most control chars; strip rather than emit
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ()
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Excel sheet-name rules: no []:*?/\ and at most 31 chars. */
  def sanitizeSheetName(name: String): String = {
    val cleaned = name.map(c => if ("[]:*?/\\".contains(c)) '_' else c).take(31)
    if (cleaned.trim.isEmpty) "Sheet" else cleaned
  }

  private def colLetter(i: Int): String = {
    var n = i
    val sb = new StringBuilder
    while (n >= 0) { sb.insert(0, ('A' + n % 26).toChar); n = n / 26 - 1 }
    sb.toString
  }

  /** One cell's XML, or "" for null (blank cells are simply omitted). */
  private def cellXml(ref: String, dt: DataType, v: Any): String = {
    if (v == null) return ""
    dt match {
      case _: NumericType =>
        val d = v.toString
        // NaN/Inf have no xlsx numeric form; fall back to inline text
        if (d == "NaN" || d.endsWith("Infinity"))
          s"""<c r="$ref" t="inlineStr"><is><t>${esc(d)}</t></is></c>"""
        else s"""<c r="$ref"><v>$d</v></c>"""
      case BooleanType =>
        s"""<c r="$ref" t="b"><v>${if (v.asInstanceOf[Boolean]) 1 else 0}</v></c>"""
      case TimestampType =>
        // real Excel datetime cell: serial number + the datetime style
        // (openpyxl parity — bangumi_data_ingestion.py:479-516 writes
        // typed datetime cells, not strings)
        val ldt = v.asInstanceOf[java.sql.Timestamp].toLocalDateTime
        val days = java.time.temporal.ChronoUnit.DAYS
          .between(ExcelEpoch, ldt.toLocalDate)
        val serial = days + ldt.toLocalTime.toNanoOfDay / 86400.0e9
        s"""<c r="$ref" s="$DateTimeStyle"><v>$serial</v></c>"""
      case DateType =>
        val days = java.time.temporal.ChronoUnit.DAYS
          .between(ExcelEpoch, v.asInstanceOf[java.sql.Date].toLocalDate)
        s"""<c r="$ref" s="$DateStyle"><v>$days</v></c>"""
      case _ =>
        val s = v.toString
        val t = if (s.length > MaxCellChars) s.take(MaxCellChars) else s
        // xml:space preserves leading/trailing whitespace like openpyxl
        s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(t)}</t></is></c>"""
    }
  }

  /** Write `sheets` as one .xlsx at local `path` (a presentation artifact,
    * like the reference's single output workbook). Sheet order and names
    * are preserved (after Excel-rule sanitization + de-duplication).
    *
    * @throws IllegalArgumentException if any sheet exceeds [[MaxDataRows]]
    *         — split or aggregate instead of silently truncating.
    */
  def writeXlsx(sheets: Seq[(String, DataFrame)], path: String): Unit = {
    require(sheets.nonEmpty, "writeXlsx: no sheets")
    val seen = scala.collection.mutable.Set.empty[String]
    val named = sheets.map { case (n, df) =>
      val base = sanitizeSheetName(n)
      var cand = base
      var i = 1
      while (!seen.add(cand.toLowerCase)) { i += 1; cand = s"${base.take(28)}_$i" }
      (cand, df)
    }
    val zip = new ZipOutputStream(
      new BufferedOutputStream(new FileOutputStream(path)), StandardCharsets.UTF_8)
    def part(name: String)(body: OutputStreamWriter => Unit): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      val w = new OutputStreamWriter(zip, StandardCharsets.UTF_8)
      w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      w.write("\n")
      body(w)
      w.flush()
      zip.closeEntry()
    }
    try {
      part("[Content_Types].xml") { w =>
        w.write("""<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""")
        w.write("""<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""")
        w.write("""<Default Extension="xml" ContentType="application/xml"/>""")
        w.write("""<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""")
        named.indices.foreach { i =>
          w.write(s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
        }
        w.write("""<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""")
        w.write("</Types>")
      }
      part("_rels/.rels") { w =>
        w.write("""<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""")
        w.write(s"""<Relationship Id="rId1" Type="$RelNs/officeDocument" Target="xl/workbook.xml"/>""")
        w.write("</Relationships>")
      }
      part("xl/workbook.xml") { w =>
        w.write(s"""<workbook xmlns="$SheetNs" xmlns:r="$RelNs"><sheets>""")
        named.zipWithIndex.foreach { case ((n, _), i) =>
          w.write(s"""<sheet name="${esc(n)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>""")
        }
        w.write("</sheets></workbook>")
      }
      part("xl/_rels/workbook.xml.rels") { w =>
        w.write("""<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""")
        named.indices.foreach { i =>
          w.write(s"""<Relationship Id="rId${i + 1}" Type="$RelNs/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""")
        }
        w.write(s"""<Relationship Id="rId${named.size + 1}" Type="$RelNs/styles" Target="styles.xml"/>""")
        w.write("</Relationships>")
      }
      part("xl/styles.xml") { w =>
        w.write(s"""<styleSheet xmlns="$SheetNs">""")
        // custom numFmts >= 164, the same default codes openpyxl registers
        // for datetime/date cells
        w.write("""<numFmts count="2"><numFmt numFmtId="164" formatCode="yyyy-mm-dd h:mm:ss"/><numFmt numFmtId="165" formatCode="yyyy-mm-dd"/></numFmts>""")
        w.write("""<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>""")
        w.write("""<fills count="2"><fill><patternFill patternType="none"/></fill><fill><patternFill patternType="gray125"/></fill></fills>""")
        w.write("""<borders count="1"><border/></borders>""")
        w.write("""<cellStyleXfs count="1"><xf/></cellStyleXfs>""")
        // xf 1 = datetime (DateTimeStyle), xf 2 = date (DateStyle)
        w.write("""<cellXfs count="3"><xf/><xf numFmtId="164" applyNumberFormat="1"/><xf numFmtId="165" applyNumberFormat="1"/></cellXfs>""")
        w.write("</styleSheet>")
      }
      named.zipWithIndex.foreach { case ((_, df), si) =>
        val schema = df.schema
        val widths = columnWidths(df)
        part(s"xl/worksheets/sheet${si + 1}.xml") { w =>
          w.write(s"""<worksheet xmlns="$SheetNs"><cols>""")
          widths.zipWithIndex.foreach { case (wd, i) =>
            w.write(s"""<col min="${i + 1}" max="${i + 1}" width="$wd" customWidth="1"/>""")
          }
          w.write("</cols><sheetData>")
          w.write("""<row r="1">""")
          schema.fieldNames.zipWithIndex.foreach { case (c, i) =>
            w.write(s"""<c r="${colLetter(i)}1" t="inlineStr"><is><t>${esc(c)}</t></is></c>""")
          }
          w.write("</row>")
          // limit(cap+1) bounds the pulled data; the +1 row, if present,
          // proves overflow and turns into a hard error
          val it = df.limit(MaxDataRows + 1).toLocalIterator()
          var r = 1
          while (it.hasNext) {
            val row = it.next()
            r += 1
            if (r - 1 > MaxDataRows)
              throw new IllegalArgumentException(
                s"sheet ${si + 1} exceeds Excel's $MaxDataRows data rows; split it")
            w.write(s"""<row r="$r">""")
            schema.fields.zipWithIndex.foreach { case (f, i) =>
              if (!row.isNullAt(i))
                w.write(cellXml(s"${colLetter(i)}$r", f.dataType, row.get(i)))
            }
            w.write("</row>")
          }
          w.write("</sheetData></worksheet>")
        }
      }
    } finally zip.close()
  }

  /** K2 Excel-compat CSV: Spark's distributed CSV write, then each part
    * file gets the `utf-8-sig` byte-order mark the reference emits
    * (`bangumi_data_ingestion.py:522-524`) so Excel auto-detects UTF-8.
    * The BOM pass streams through Hadoop's FileSystem — scheme-agnostic
    * and never holds a file in memory.
    */
  def writeCsvBom(df: DataFrame, dir: String, header: Boolean = true): Unit = {
    df.write.option("header", header.toString).mode("overwrite").csv(dir)
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(conf)
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte)
    fs.listStatus(path).filter(_.getPath.getName.startsWith("part-"))
      .foreach { st =>
        val src = st.getPath
        val tmp = new org.apache.hadoop.fs.Path(
          src.getParent, s".${src.getName}.bom")
        val in = fs.open(src)
        val out = fs.create(tmp, true)
        try {
          out.write(bom)
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, conf, false)
        } finally { in.close(); out.close() }
        fs.delete(src, false)
        fs.rename(tmp, src)
      }
  }
}
