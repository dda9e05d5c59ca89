package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.DfkFilters

/** The reference's declarative query spec, re-expressed.
  *
  * `Payload`/`Field`/`Filter` (`/root/reference/scrape/structure.go:13-76`)
  * become plan-time case classes compiled to Catalyst `Column`s — the query
  * is validated once (analysis phase, like `checkPayload`,
  * `/root/reference/scrape/scrape.go:187-207`) and turns into a pure
  * DataFrame transform; Catalyst then optimizes it for free.
  *
  * Selector model: the transcript markup is flat `<tag attr="...">text</tag>`
  * (Persons.transcript). A selector is a tag name; attrs follow the
  * reference's attr model (`scrape/scrape.go:33-73`):
  *   - `text`      : element inner text (nested tags stripped)
  *   - `outerHtml` : the whole matched element
  *   - any other   : that attribute's value (e.g. `href`)
  *
  * The 0/1/N rule (`scrape/scrape.go:75-82`): a field matching N nodes is
  * an array; the engine keeps a FIXED `array<string>` schema and applies
  * the reference's unwrap-if-single rule only at encode time
  * (`encodeUnwrap`) — SURVEY.md §1.2.
  */
final case class FieldSpec(
    name: String,
    selector: String,
    attrs: Seq[String],
    filters: Seq[(String, String)] = Nil)

final case class ExtractionSpec(name: String, fields: Seq[FieldSpec]) {
  /** `{field}_{attr}` output column list — `Payload.fieldNames` parity
    * (`/root/reference/scrape/scrape.go:157-172`). */
  def fieldNames: Seq[String] =
    fields.flatMap(f => f.attrs.map(a => s"${f.name}_$a"))

  /** Fail-fast validation, `checkPayload` parity. */
  def validate(): this.type = {
    require(fields.nonEmpty, s"payload $name: at least one field required")
    fields.foreach { f =>
      require(f.name.nonEmpty && f.selector.nonEmpty,
        s"payload $name: field name and selector required")
      require(f.attrs.nonEmpty, s"field ${f.name}: at least one attr required")
      f.filters.foreach { case (n, p) =>
        if (!DfkFilters.Names.contains(n))
          throw new IllegalArgumentException(s"unknown filter: $n")
        if (n == "regex") DfkFilters.normalizeRegex(p)
      }
    }
    this
  }
}

object Extraction {

  private def quote(s: String) = java.util.regex.Pattern.quote(s)

  /** Parse a compact SQL-facing spec string into an [[ExtractionSpec]] —
    * the payload the reference takes as JSON, expressible inside a SQL
    * literal for the `clip_extract` table function:
    *
    *   "Name:name:text+href; Phones:phone:text:trim+lowercase"
    *
    * `;` separates fields; each field is `name:selector:attr[+attr...]`
    * with an optional 4th `filter[=arg][+filter...]` segment (filter names
    * are the reference's — trim/lowercase/uppercase/capitalize/regex;
    * `regex=...` takes the pattern as its arg). Because regex patterns
    * freely contain `+`, `:` and `=`, a `regex=` filter consumes the REST
    * of its segment verbatim (so it must be the last filter of a field),
    * and the field split keeps everything after the third `:` intact.
    * Validation is the same fail-fast `checkPayload` path as the
    * programmatic API. */
  def parseSpec(s: String): ExtractionSpec = {
    def parseFilters(seg: String): Seq[(String, String)] = {
      // -1 limit: a trailing '+' (e.g. the quantifier in "regex=[0-9]+")
      // must survive as an empty trailing part, not be silently dropped
      val parts = seg.split("\\+", -1)
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var i = 0
      while (i < parts.length) {
        val p = parts(i).trim
        if (p.startsWith("regex=")) {
          out += (("regex",
            (p.stripPrefix("regex=") +: parts.drop(i + 1)).mkString("+")))
          i = parts.length
        } else {
          if (p.nonEmpty) out += (p.split("=", 2) match {
            case Array(n) => (n, "")
            case Array(n, a) => (n, a)
          })
          i += 1
        }
      }
      out.toSeq
    }
    val fields = s.split(";").toSeq.map(_.trim).filter(_.nonEmpty).map { f =>
      // limit 4: colons INSIDE a regex pattern stay in the filter segment
      val parts = f.split(":", 4)
      require(parts.length == 3 || parts.length == 4,
        s"field spec '$f' must be name:selector:attr[+attr...][:filter[=arg][+...]]")
      val filters = if (parts.length == 4) parseFilters(parts(3)) else Nil
      FieldSpec(parts(0).trim, parts(1).trim,
        parts(2).split("\\+").toSeq.map(_.trim).filter(_.nonEmpty), filters)
    }
    ExtractionSpec("sql", fields).validate()
  }

  /** All outer elements for `tag` inside a block, as array<string>. */
  def elements(block: Column, tag: String): Column =
    regexp_extract_all(block,
      lit(s"(?s)(<${quote(tag)}(?:\\s[^>]*)?>.*?</${quote(tag)}>)"), lit(1))

  /** Compile one (field, attr) to a Column over a `block` string column.
    * Always `array<string>` (fixed schema; 0 matches -> empty array). */
  def attrColumn(block: Column, f: FieldSpec, attr: String): Column = {
    val raw: Column = attr match {
      case "text" =>
        transform(elements(block, f.selector),
          e => regexp_replace(e, "<[^>]*>", ""))
      case "outerHtml" | "outerhtml" =>
        elements(block, f.selector)
      case other => // attribute value, e.g. href
        regexp_extract_all(block,
          lit(s"<${quote(f.selector)}\\s[^>]*?${quote(other)}=\"([^\"]*)\""), lit(1))
    }
    val filtered =
      if (f.filters.isEmpty) raw
      else transform(raw, e => DfkFilters.chain(f.filters)(e))
    filtered.as(s"${f.name}_$attr")
  }

  /** The `divide` analog (`/root/reference/scrape/scrape.go:447-517`):
    * one transcript -> N repeating blocks. Our markup's repeating unit is
    * `<card>…</card>`; a transcript with no cards is itself one block
    * (common-ancestor fallback). Dropping block-less rows reproduces D2. */
  def divide(df: DataFrame, transcriptCol: String = "transcript"): DataFrame = {
    val blocks = regexp_extract_all(col(transcriptCol),
      lit("(?s)(<card(?:\\s[^>]*)?>.*?</card>)"), lit(1))
    df.withColumn("block",
        explode(when(size(blocks) > 0, blocks)
          .otherwise(array(col(transcriptCol)))))
  }

  /** Apply a full spec: divide + project every `{field}_{attr}` column.
    * Blocks where ALL fields are empty are dropped (D2 semantics,
    * `scrape/scrape.go:541-547`).
    *
    * `fused = true` (default) extracts every field in ONE pass over each
    * block via the ExtractCardFields expression; `fused = false` keeps the
    * composed regex plan (one traversal per field-attr) — the two are
    * parity-tested against each other in FusedExtractSpec. */
  def apply(spec: ExtractionSpec, fused: Boolean = true)(df: DataFrame): DataFrame = {
    spec.validate()
    val divided = divide(df)
    val out =
      if (!fused) {
        val cols = for (f <- spec.fields; a <- f.attrs)
          yield attrColumn(col("block"), f, a)
        divided.select((df.columns.map(col).toSeq :+ col("block")) ++ cols: _*)
      } else {
        val ex = graft.functions.GraftFunctions.toColumn(
          ExtractCardFields(graft.functions.GraftFunctions.toExpr(col("block")), spec.fields))
        // explode(array(...)) is a generator barrier: project collapsing
        // cannot duplicate the (single-pass) extraction per output column.
        val once = divided.select(
          (df.columns.map(col).toSeq :+ col("block")) :+
            explode(array(ex)).as("_ex"): _*)
        val cols = for (f <- spec.fields; a <- f.attrs) yield {
          val n = s"${f.name}_$a"
          val raw = col("_ex").getField(n)
          val filtered =
            if (f.filters.isEmpty) raw
            else transform(raw, e => DfkFilters.chain(f.filters)(e))
          filtered.as(n)
        }
        once.select((df.columns.map(col).toSeq :+ col("block")) ++ cols: _*)
      }
    val anyMatch = spec.fieldNames.map(n => size(col(n)) > 0).reduce(_ || _)
    out.filter(anyMatch).drop("block")
  }

  /** Encode-time unwrap rule: array of size 1 -> scalar string; size 0 ->
    * null; else `;`-joined (CSV parity, `scrape/encoders.go:277-299`). */
  def encodeUnwrap(c: Column): Column =
    when(size(c) === 0, lit(null: String))
      .when(size(c) === 1, c.getItem(0))
      .otherwise(array_join(c, ";"))
}
