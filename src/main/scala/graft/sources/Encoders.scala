package graft.sources

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructType}

import graft.operators.Extraction

/** Output encoders with the reference's exact formatting semantics
  * (`/root/reference/scrape/encoders.go`):
  *
  *  - JSON: array of objects (`[{...},{...}]`) — begin/delimiter/finalize
  *    protocol (`encoders.go:141-172`); JSONL: one object per line.
  *  - CSV: header from fieldNames; quote `"` -> `""`; wrap a cell in
  *    quotes iff it contains `,` or a newline — a quote alone is doubled
  *    but NOT wrapped, exactly like `formatFieldValue`
  *    (`encoders.go:265-303`); ARRAY values joined with `;`.
  *  - XML: `<?xml version="1.0" encoding="UTF-8"?><root>` then each
  *    record's fields emitted directly under root (no per-record wrapper),
  *    array values `;`-joined inside ONE element, the five predefined
  *    entities escaped (`encoders.go:334-382`). One deliberate deviation:
  *    fields emit in schema order — the reference ranges over a Go map,
  *    whose order is randomized per run, and a deterministic engine must
  *    not reproduce nondeterminism.
  *  - nested details (`encoders.go:207-241`): a column whose name contains
  *    "details" with `array<struct>` type rehydrates as object-if-1 /
  *    array-if-N in JSON, and as recursively nested elements in XML.
  *  - optional gzip (`.gz`) like the reference's compressor
  *    (`encoders.go:51-56`).
  *
  * The single-value unwrap rule (array of 1 -> scalar) is applied here, at
  * encode time, per SURVEY.md §1.2 — engine-internal schema stays fixed
  * `array<string>`.
  *
  * Scale note: encode is a SINK-side parity path for golden outputs; rows
  * stream through `toLocalIterator` (one partition in memory at a time),
  * ordered by the caller's sort. Bulk data stays in parquet via ClipTable.
  */
object DfkEncoders {

  private def isDetails(row: Row, i: Int): Boolean =
    row.schema(i).name.contains("details") &&
      (row.schema(i).dataType match {
        case ArrayType(_: StructType, _) => true
        case _ => false
      })

  /** JSON-string encode per column: arrays unwrap if single; `_details`
    * array<struct> columns follow the reference's object-if-1/array-if-N
    * rehydration rule (`encoders.go:233-238`). */
  private def jsonValue(row: Row, i: Int): Option[String] = {
    if (row.isNullAt(i)) return None
    if (isDetails(row, i)) {
      val ds = row.getSeq[Row](i)
      return if (ds.isEmpty) None
      else if (ds.size == 1) Some(rowToJson(ds.head))
      else Some(ds.map(rowToJson).mkString("[", ",", "]"))
    }
    row.schema(i).dataType match {
      case ArrayType(StringType, _) =>
        val xs = row.getSeq[String](i)
        if (xs.isEmpty) None
        else if (xs.size == 1) Some(q(xs.head))
        else Some(xs.map(q).mkString("[", ",", "]"))
      case StringType => Some(q(row.getString(i)))
      case _ => Some(String.valueOf(row.get(i)))
    }
  }

  private def q(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  private def rowToJson(row: Row): String =
    row.schema.fieldNames.zipWithIndex.flatMap { case (name, i) =>
      jsonValue(row, i).map(v => s"${q(name)}:$v")
    }.mkString("{", ",", "}")

  /** CSV cell per the reference: `"`->`""`; wrap iff the (escaped) value
    * contains `,` or a newline — a quote alone stays UNWRAPPED, exactly
    * like `formatFieldValue` (`encoders.go:265-281`); arrays joined with
    * `;` BEFORE quoting. */
  def csvCell(s: String): String = {
    val escaped = s.replace("\"", "\"\"")
    if (escaped.contains(',') || escaped.contains('\n'))
      "\"" + escaped + "\""
    else escaped
  }

  private def csvValue(row: Row, i: Int): String = {
    if (row.isNullAt(i)) return ""
    // the reference's formatFieldValue has no map case -> details render
    // as an empty cell in CSV (encoders.go:265-303)
    if (isDetails(row, i)) return ""
    row.schema(i).dataType match {
      case ArrayType(StringType, _) => csvCell(row.getSeq[String](i).mkString(";"))
      case StringType => csvCell(row.getString(i))
      case _ => csvCell(String.valueOf(row.get(i)))
    }
  }

  /** XML entity escaping (the five predefined entities). */
  def xmlEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '\'' => sb.append("&apos;")
      case '"' => sb.append("&quot;")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** One `<field>value</field>` element per column: array values joined
    * with `;` INSIDE the single element (`encoders.go:355-366`); details
    * columns nest their struct fields recursively (`encoders.go:338-352`). */
  private def xmlField(row: Row, i: Int): String = {
    val name = row.schema(i).name
    if (row.isNullAt(i)) return s"<$name></$name>"
    val body =
      if (isDetails(row, i))
        row.getSeq[Row](i).map(xmlRecord).mkString
      else row.schema(i).dataType match {
        case ArrayType(StringType, _) =>
          row.getSeq[String](i).map(xmlEscape).mkString(";")
        case StringType => xmlEscape(row.getString(i))
        case _ => xmlEscape(String.valueOf(row.get(i)))
      }
    s"<$name>$body</$name>"
  }

  private def xmlRecord(row: Row): String =
    row.schema.indices.map(i => xmlField(row, i)).mkString

  private def writer(path: String, gzip: Boolean): BufferedWriter = {
    Files.createDirectories(Paths.get(path).getParent)
    val os = Files.newOutputStream(Paths.get(path))
    val stream = if (gzip) new GZIPOutputStream(os) else os
    new BufferedWriter(new OutputStreamWriter(stream, StandardCharsets.UTF_8))
  }

  /** Minimal SpreadsheetML writer — XLSX is a zip of XML parts, so the
    * reference's XLSX encoder (`encoders.go:396-456`: one sheet named
    * "sheet", header row, every data cell the CSV-formatted string) needs
    * no spreadsheet library. Faithfully reproduces the reference's quirk
    * of writing `formatFieldValue`'s output — INCLUDING its trailing
    * comma — into each cell (`encoders.go:427-431`). Inline strings keep
    * the file single-pass/streamable. */
  private def encodeXlsx(df: DataFrame, path: String): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    val zip = new java.util.zip.ZipOutputStream(Files.newOutputStream(Paths.get(path)))
    def entry(name: String, content: String): Unit = {
      zip.putNextEntry(new java.util.zip.ZipEntry(name))
      zip.write(content.getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    try {
      entry("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
          """</Types>""")
      entry("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          """</Relationships>""")
      entry("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
          """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
          """<sheets><sheet name="sheet" sheetId="1" r:id="rId1"/></sheets></workbook>""")
      entry("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
          """</Relationships>""")
      zip.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
      def write(s: String): Unit = zip.write(s.getBytes(StandardCharsets.UTF_8))
      write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      def rowXml(cells: Seq[String]): String =
        "<row>" + cells.map(c =>
          s"""<c t="inlineStr"><is><t>${xmlEscape(c)}</t></is></c>""").mkString + "</row>"
      write(rowXml(df.schema.fieldNames.toSeq))
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        write(rowXml(df.schema.indices.map(i => csvValue(row, i) + ",")))
      }
      write("</sheetData></worksheet>")
      zip.closeEntry()
    } finally zip.close()
  }

  /** Encode `df` (already ordered by the caller) to `path`. Format in
    * {"json", "jsonl", "csv", "xml", "xlsx"}; `.gz` appended when gzip
    * (xlsx is already a zip — gzip rejected). */
  def encode(df: DataFrame, path: String, format: String, gzip: Boolean = false): String = {
    if (format == "xlsx") {
      require(!gzip, "xlsx is already zip-compressed")
      encodeXlsx(df, path)
      return path
    }
    val out = if (gzip) path + ".gz" else path
    val w = writer(out, gzip)
    try {
      val it = df.toLocalIterator()
      format match {
        case "json" =>
          w.write("[")
          var first = true
          while (it.hasNext) {
            if (!first) w.write(",")
            w.write(rowToJson(it.next())); first = false
          }
          w.write("]")
        case "jsonl" =>
          while (it.hasNext) { w.write(rowToJson(it.next())); w.write("\n") }
        case "csv" =>
          w.write(df.schema.fieldNames.mkString(",")); w.write("\n")
          while (it.hasNext) {
            val row = it.next()
            w.write(df.schema.indices.map(i => csvValue(row, i)).mkString(","))
            w.write("\n")
          }
        case "xml" =>
          w.write("<?xml version=\"1.0\" encoding=\"UTF-8\"?><root>")
          while (it.hasNext) w.write(xmlRecord(it.next()))
          w.write("</root>")
        case other => throw new IllegalArgumentException(s"unknown format: $other")
      }
    } finally w.close()
    out
  }
}
