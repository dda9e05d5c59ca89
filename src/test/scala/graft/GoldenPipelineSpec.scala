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
    val golden = "<root>" + (0 until 3).map { i =>
      val p = Persons.all(i % Persons.N)
      val phones = p.phones.map(ph => s"<Phones_text>$ph</Phones_text>").mkString
      s"<row><clip_id>${ClipGen.clipId(i)}</clip_id>" +
        s"<Name_text>${p.name}</Name_text>$phones</row>"
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
}
