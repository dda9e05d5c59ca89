package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.fixtures.Persons

class ExtractionSpecTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cardsSpec = ExtractionSpec("cards", Seq(
    FieldSpec("Name", "name", Seq("text", "href")),
    FieldSpec("Phones", "phone", Seq("text")),
    FieldSpec("Email", "email", Seq("text")),
    FieldSpec("Country", "country", Seq("text"))))

  test("fieldNames matches {field}_{attr} convention") {
    assert(cardsSpec.fieldNames ==
      Seq("Name_text", "Name_href", "Phones_text", "Email_text", "Country_text"))
  }

  test("extracts every person field from its transcript, bit-for-bit") {
    val df = Persons.all.map(p => (p.idx, Persons.transcript(p)))
      .toDF("person_idx", "transcript")
    val out = Extraction(cardsSpec)(df).orderBy("person_idx").collect()
    assert(out.length == Persons.N)
    out.zip(Persons.all).foreach { case (row, p) =>
      assert(row.getSeq[String](row.fieldIndex("Name_text")) == Seq(p.name))
      assert(row.getSeq[String](row.fieldIndex("Name_href")) == Seq(s"/person/${p.counter}"))
      assert(row.getSeq[String](row.fieldIndex("Phones_text")) == p.phones)
      assert(row.getSeq[String](row.fieldIndex("Email_text")) == Seq(p.email))
      assert(row.getSeq[String](row.fieldIndex("Country_text")) == Seq(p.country))
    }
  }

  test("0/1/N rule: every 5th person has two phones; unwrap at encode time") {
    val df = Persons.all.map(p => (p.idx, Persons.transcript(p)))
      .toDF("person_idx", "transcript")
    val out = Extraction(cardsSpec)(df)
      .select($"person_idx", Extraction.encodeUnwrap($"Phones_text").as("phones"))
      .orderBy("person_idx").as[(Int, String)].collect()
    out.foreach { case (i, phones) =>
      val p = Persons.all(i)
      val want = if (p.phones.size == 1) p.phones.head else p.phones.mkString(";")
      assert(phones == want, s"person $i")
      if (i % 5 == 0) assert(phones.contains(";"))
    }
  }

  test("divide explodes multi-card transcripts into blocks (D1)") {
    val two = Persons.transcript(Persons.all(0)) + Persons.transcript(Persons.all(1))
    val df = Seq((1, two), (2, Persons.transcript(Persons.all(2)))).toDF("id", "transcript")
    val out = Extraction(cardsSpec)(df)
    assert(out.count() == 3)
    assert(out.filter($"id" === 1).count() == 2)
  }

  test("blocks with no extracted fields are dropped (D2)") {
    val df = Seq((1, "<card><unrelated>x</unrelated></card>"),
      (2, Persons.transcript(Persons.all(3)))).toDF("id", "transcript")
    assert(Extraction(cardsSpec)(df).select("id").as[Int].collect().toSeq == Seq(2))
  }

  test("filters apply per array element") {
    val spec = ExtractionSpec("f", Seq(
      FieldSpec("Digits", "phone", Seq("text"), Seq(("regex", "\\d{4}")))))
    val df = Seq((0, Persons.transcript(Persons.all(0)))).toDF("i", "transcript")
    val got = Extraction(spec)(df).select($"Digits_text").as[Seq[String]].head()
    val want = Persons.all(0).phones.map(DfkFilters_regexLast4)
    assert(got == want)
  }

  private def DfkFilters_regexLast4(phone: String): String =
    graft.functions.DfkFilters.applyScala("regex", "\\d{4}", phone)

  test("details fields appear only in enriched transcripts (J1 precursor)") {
    val detailSpec = ExtractionSpec("d", Seq(
      FieldSpec("Title", "title", Seq("text")),
      FieldSpec("Name", "name", Seq("text"))))
    val p = Persons.all(10)
    val df = Seq((1, Persons.transcript(p)), (2, Persons.enrichedTranscript(p)))
      .toDF("id", "transcript")
    val out = Extraction(detailSpec)(df).orderBy("id")
      .select(size($"Title_text")).as[Int].collect()
    assert(out.toSeq == Seq(0, 1))
  }
}
