package graft.sources

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.operators.Extraction

/** Output encoders with the reference's exact formatting semantics
  * (`/root/reference/scrape/encoders.go`):
  *
  *  - JSON: array of objects (`[{...},{...}]`) — begin/delimiter/finalize
  *    protocol (`encoders.go:141-172`); JSONL: one object per line.
  *  - CSV: header from fieldNames; quote `"` -> `""`; wrap a cell in
  *    quotes iff it contains `,`, `"` or a newline; ARRAY values joined
  *    with `;` (`encoders.go:265-328`).
  *  - XML: `<root><row><Field_attr>...</Field_attr>...</row></root>` with
  *    the five predefined entities escaped (`encoders.go:330-382`).
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

  /** JSON-string encode per column: arrays unwrap if single. */
  private def jsonValue(row: Row, i: Int): Option[String] = {
    if (row.isNullAt(i)) return None
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

  /** CSV cell per the reference: `"`->`""`; wrap iff `,`/`"`/newline;
    * arrays joined with `;` BEFORE quoting. */
  def csvCell(s: String): String = {
    val escaped = s.replace("\"", "\"\"")
    if (escaped.contains(',') || escaped.contains('\n') || escaped.contains('"'))
      "\"" + escaped + "\""
    else escaped
  }

  private def csvValue(row: Row, i: Int): String = {
    if (row.isNullAt(i)) return ""
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

  private def xmlValue(row: Row, i: Int): Seq[String] = {
    if (row.isNullAt(i)) return Nil
    row.schema(i).dataType match {
      case ArrayType(StringType, _) => row.getSeq[String](i).map(xmlEscape)
      case StringType => Seq(xmlEscape(row.getString(i)))
      case _ => Seq(xmlEscape(String.valueOf(row.get(i))))
    }
  }

  private def writer(path: String, gzip: Boolean): BufferedWriter = {
    Files.createDirectories(Paths.get(path).getParent)
    val os = Files.newOutputStream(Paths.get(path))
    val stream = if (gzip) new GZIPOutputStream(os) else os
    new BufferedWriter(new OutputStreamWriter(stream, StandardCharsets.UTF_8))
  }

  /** Encode `df` (already ordered by the caller) to `path`. Format in
    * {"json", "jsonl", "csv", "xml"}; `.gz` appended when gzip. */
  def encode(df: DataFrame, path: String, format: String, gzip: Boolean = false): String = {
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
          w.write("<root>")
          while (it.hasNext) {
            val row = it.next()
            w.write("<row>")
            row.schema.fieldNames.zipWithIndex.foreach { case (name, i) =>
              xmlValue(row, i).foreach(v => w.write(s"<$name>$v</$name>"))
            }
            w.write("</row>")
          }
          w.write("</root>")
        case other => throw new IllegalArgumentException(s"unknown format: $other")
      }
    } finally w.close()
    out
  }
}
