package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.fixtures.{ClipGen, Persons}
import graft.operators.{Extraction, ExtractionSpec, FieldSpec}
import graft.sources.DfkEncoders

/** The reference's golden-file test pattern (scrape_test.go byte-compares
  * whole encoded outputs): full pipeline — clip table -> divide -> extract
  * -> order -> encode — against a golden string BUILT from the fixture
  * semantics (not copied). */
class GoldenPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val spec = ExtractionSpec("cards", Seq(
    FieldSpec("Name", "name", Seq("text", "href")),
    FieldSpec("Phones", "phone", Seq("text"))))

  test("cards payload end-to-end JSON golden, bit-for-bit") {
    val clips = ClipGen.clipsDf(spark, 12).select("clip_id", "person_idx", "transcript")
    val out = Extraction(spec)(clips)
      .select(col("clip_id"), col("Name_text"), col("Name_href"), col("Phones_text"))
      .orderBy("clip_id") // the (page, block) key-order analog (L2)
    val path = Files.createTempDirectory("golden").resolve("result.json").toString
    DfkEncoders.encode(out, path, "json")
    val got = Files.readString(java.nio.file.Paths.get(path))

    val golden = (0 until 12).map { i =>
      val p = Persons.all(i % Persons.N)
      val phones =
        if (p.phones.size == 1) "\"" + p.phones.head + "\""
        else p.phones.map("\"" + _ + "\"").mkString("[", ",", "]")
      s"""{"clip_id":"${ClipGen.clipId(i)}","Name_text":"${p.name}",""" +
        s""""Name_href":"/person/${p.counter}","Phones_text":$phones}"""
    }.mkString("[", ",", "]")
    assert(got == golden)
  }

  test("cards payload end-to-end XML golden with entity escaping") {
    val clips = ClipGen.clipsDf(spark, 3).select("clip_id", "person_idx", "transcript")
    val out = Extraction(spec)(clips)
      .select(col("clip_id"), col("Name_text"), col("Phones_text"))
      .orderBy("clip_id")
    val path = Files.createTempDirectory("golden").resolve("result.xml").toString
    DfkEncoders.encode(out, path, "xml")
    val got = Files.readString(java.nio.file.Paths.get(path))
    val golden = "<?xml version=\"1.0\" encoding=\"UTF-8\"?><root>" +
      (0 until 3).map { i =>
        val p = Persons.all(i % Persons.N)
        s"<clip_id>${ClipGen.clipId(i)}</clip_id>" +
          s"<Name_text>${p.name}</Name_text>" +
          s"<Phones_text>${p.phones.mkString(";")}</Phones_text>"
      }.mkString + "</root>"
    assert(got == golden)
  }

  test("cards payload end-to-end CSV golden with array ; joins") {
    val clips = ClipGen.clipsDf(spark, 6).select("clip_id", "person_idx", "transcript")
    val out = Extraction(spec)(clips)
      .select(col("clip_id"), col("Name_text"), col("Phones_text"))
      .orderBy("clip_id")
    val path = Files.createTempDirectory("golden").resolve("result.csv").toString
    DfkEncoders.encode(out, path, "csv")
    val lines = Files.readAllLines(java.nio.file.Paths.get(path))
    assert(lines.get(0) == "clip_id,Name_text,Phones_text")
    (0 until 6).foreach { i =>
      val p = Persons.all(i % Persons.N)
      assert(lines.get(i + 1) ==
        s"${ClipGen.clipId(i)},${p.name},${p.phones.mkString(";")}")
    }
  }

  test("details rehydration: object-if-1 / array-if-N in JSON, nested XML") {
    // the reference nests child rows under the parent column
    // (encoders.go:207-241; golden shape testdata/scrape/details.json):
    // exactly one detail row -> a JSON OBJECT, several -> an ARRAY.
    import spark.implicits._
    val df = Seq(
      ("r1", Seq(("a@x.com", "NY")), "one detail"),
      ("r2", Seq(("b@x.com", "LA"), ("c@x.com", "SF")), "two details"))
      .toDF("id", "raw", "note")
      .select(col("id"),
        transform(col("raw"), r =>
          struct(r.getField("_1").as("Email_text"),
            r.getField("_2").as("City_text"))).as("Links_details"),
        col("note"))
    val dir = Files.createTempDirectory("golden-details")
    val j = Files.readString(java.nio.file.Paths.get(
      DfkEncoders.encode(df, dir.resolve("d.json").toString, "json")))
    assert(j ==
      """[{"id":"r1","Links_details":{"Email_text":"a@x.com","City_text":"NY"},"note":"one detail"},""" +
        """{"id":"r2","Links_details":[{"Email_text":"b@x.com","City_text":"LA"},""" +
        """{"Email_text":"c@x.com","City_text":"SF"}],"note":"two details"}]""")
    val x = Files.readString(java.nio.file.Paths.get(
      DfkEncoders.encode(df, dir.resolve("d.xml").toString, "xml")))
    assert(x == "<?xml version=\"1.0\" encoding=\"UTF-8\"?><root>" +
      "<id>r1</id><Links_details><Email_text>a@x.com</Email_text><City_text>NY</City_text></Links_details><note>one detail</note>" +
      "<id>r2</id><Links_details><Email_text>b@x.com</Email_text><City_text>LA</City_text>" +
      "<Email_text>c@x.com</Email_text><City_text>SF</City_text></Links_details><note>two details</note>" +
      "</root>")
    // CSV: the reference's formatFieldValue has no map case -> empty cell
    val c = Files.readAllLines(java.nio.file.Paths.get(
      DfkEncoders.encode(df, dir.resolve("d.csv").toString, "csv")))
    assert(c.get(1) == "r1,,one detail")
  }
}
