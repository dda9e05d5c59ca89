package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing — the redaction pass a training-data pipeline runs
  * before text ever reaches a model. Pure built-in regexp expressions
  * (codegen'd, no UDF), so the scan stays one whole-stage-codegen pass
  * and the exact same semantics are statable in the DuckDB oracle (t11).
  *
  * The patterns deliberately live in the Java/RE2 COMMON dialect (no
  * backreferences, no lookaround, no \b): Spark executes them with
  * java.util.regex, the oracle with RE2 — a construct outside the shared
  * subset would make the two engines disagree on the same row.
  */
object Scrub {

  /** Email addresses (the common-dialect classic). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International-format phone numbers: +<digits> with spaces/dashes,
    * at least 8 chars total, ending in a digit (so trailing prose
    * punctuation is never swallowed). Anchored on '+' to keep organic
    * numerals (years, counts) out of scope. */
  val PhonePattern = "\\+[0-9][0-9 -]{6,}[0-9]"

  /** Replace every email/phone match in `textCol` with redaction tokens,
    * and count what was redacted: returns the input columns plus
    * `n_emails`, `n_phones` (int) and `clean_text`. Emails are scrubbed
    * FIRST and the patterns can overlap ('+' is legal in an email
    * local-part, so "user+15551234567@example.com" contains a phone-shaped
    * span inside the email match) — n_phones is therefore counted on the
    * EMAIL-SCRUBBED text, so the counts always agree with what
    * `clean_text` actually replaced (ADVICE r5). */
  def scrubPii(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val emailScrubbed = regexp_replace(t, EmailPattern, "<EMAIL>")
    df.withColumn("n_emails", regexp_count(t, lit(EmailPattern)).cast("int"))
      .withColumn("n_phones",
        regexp_count(emailScrubbed, lit(PhonePattern)).cast("int"))
      .withColumn("clean_text",
        regexp_replace(emailScrubbed, PhonePattern, "<PHONE>"))
  }

  /** Column form of the scrubbed text alone. */
  def scrubbed(textCol: Column): Column =
    regexp_replace(regexp_replace(textCol, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Distinct word n-grams of a text column (whitespace tokens, lowered
    * and trimmed — the d2/t2 tokenization, so the DuckDB oracle states
    * the identical gram set). Texts shorter than `n` tokens yield none
    * (guarded: Spark's sequence(a, b) with a > b DESCENDS, not errors). */
  def wordNgrams(textCol: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val toks = split(trim(lower(textCol)), "\\s+")
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>")))
  }

  /** BENCHMARK DECONTAMINATION — the pre-training hygiene pass that flags
    * corpus documents sharing long n-gram spans with an evaluation set
    * (the GPT-3/PaLM appendix methodology: 8-gram collisions == likely
    * test-set leakage; a contaminated doc inflates downstream evals).
    * Returns (idCol, n_overlap) for every document with at least one
    * distinct n-gram also present in `benchmark` — the drop/quarantine
    * list with its evidence count.
    *
    * 100 TB shape: the corpus pays ONE scan + one distinct-gram explode;
    * the benchmark's gram set is BROADCAST (eval suites are tiny against
    * any training corpus), so the only shuffle is the (id, gram) rows
    * that actually MATCH — contamination-rate-sized, never corpus-sized.
    * Everything is built-in expressions (codegen'd split/slice), no UDF,
    * and the whole operation is exactly statable in SQL (the t16 oracle
    * computes the same gram sets and counts — no planted classes needed,
    * organic overlaps included identically on both sides). */
  def decontaminate(docs: DataFrame, benchmark: DataFrame,
                    textCol: String, idCol: String, n: Int = 8): DataFrame = {
    val bmGrams = benchmark
      .select(explode(wordNgrams(col(textCol), n)).as("g"))
      .distinct()
    docs.select(col(idCol), explode(wordNgrams(col(textCol), n)).as("g"))
      .join(broadcast(bmGrams), Seq("g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap")) // grams are distinct per doc
  }
}
