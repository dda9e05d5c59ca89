package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.fixtures.Persons
import graft.queries.ClipQueries

/** Parity: the single-pass fused extraction must equal the composed-regex
  * plan on every fixture transcript (plain + enriched + multi-card +
  * adversarial markup), including filters. */
class FusedExtractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val spec = ClipQueries.cardsSpec
  private val filteredSpec = ExtractionSpec("f", Seq(
    FieldSpec("Names", "name", Seq("text", "href"), Seq(("uppercase", ""))),
    FieldSpec("Digits", "phone", Seq("text"), Seq(("regex", "\\d{4}")))))

  private def both(spec: ExtractionSpec, rows: Seq[(Int, String)]) = {
    val df = rows.toDF("id", "transcript")
    val a = Extraction(spec, fused = true)(df).orderBy("id")
      .collect().map(_.toSeq).toSeq
    val b = Extraction(spec, fused = false)(df).orderBy("id")
      .collect().map(_.toSeq).toSeq
    (a, b)
  }

  test("fused == regex plan on all 100 person transcripts") {
    val rows = Persons.all.map(p => (p.idx, Persons.transcript(p)))
    val (a, b) = both(spec, rows)
    assert(a.nonEmpty && a == b)
  }

  test("fused == regex plan on enriched transcripts (nested details)") {
    val detailSpec = ExtractionSpec("d", Seq(
      FieldSpec("Title", "title", Seq("text")),
      FieldSpec("Counter", "counter", Seq("text")),   // appears twice (card + details)
      FieldSpec("Name", "name", Seq("text", "href"))))
    val rows = Persons.all.take(30).map(p => (p.idx, Persons.enrichedTranscript(p)))
    val (a, b) = both(detailSpec, rows)
    assert(a.nonEmpty && a == b)
  }

  test("fused == regex plan with filters and multi-card blocks") {
    val two = Persons.transcript(Persons.all(0)) + Persons.transcript(Persons.all(5))
    val rows = Seq((0, two), (1, Persons.transcript(Persons.all(10))))
    val (a, b) = both(filteredSpec, rows)
    assert(a.nonEmpty && a == b)
  }

  test("fused == regex plan on adversarial markup") {
    val rows = Seq(
      (0, "<card><name>no attrs</name><phone></phone></card>"),
      (1, "<card><name href=\"x\">a<b>c</b>d</name></card>"), // nested tag in text
      (2, "<card><unmatched></card>"),
      (3, "<card><name href=\"\">empty attr</name><name>second</name></card>"),
      (4, "<card><phone>1</phone><phone>2</phone><phone>3</phone></card>"))
    val (a, b) = both(spec, rows)
    assert(a == b)
  }

  test("extract_attr SQL function matches the spec-compiled extraction") {
    graft.functions.GraftFunctions.register(spark)
    Persons.all.take(10).map(p => (p.idx, Persons.transcript(p)))
      .toDF("id", "transcript").createOrReplaceTempView("tv")
    val rows = spark.sql(
      """SELECT id, extract_attr(transcript, 'phone', 'text') AS phones,
        |       extract_attr(transcript, 'name', 'href')[0] AS href
        |FROM tv ORDER BY id""".stripMargin).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getSeq[String](1) == Persons.all(i).phones)
      assert(r.getString(2) == s"/person/${i + 1}")
    }
  }

  test("scan collects values in document order") {
    val got = FusedExtract.scan(
      "<phone>A</phone><x/><phone>B</phone><phone>C</phone>",
      Seq(("phone", Seq("text"))))
    assert(got(0).toSeq == Seq("A", "B", "C"))
  }
}
