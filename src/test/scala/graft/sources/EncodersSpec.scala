package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Encoder parity with the reference's formatting rules
  * (`/root/reference/scrape/encoders.go`): JSON array protocol, JSONL,
  * CSV quoting + `;` array join, XML entity escaping, single-value
  * unwrap, gzip. Expected strings are hand-derived from the rules, not
  * copied goldens. */
class EncodersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    (Seq("Avery Alder"), Seq("1-702-111-2222", "1-555-333-4444")),
    (Seq("Blake, Birch"), Seq("1-800-000-0001")),
    (Seq("Casey \"CC\" Cedar"), Seq.empty[String]))
    .toDF("Name_text", "Phones_text")

  private def tmp(name: String) =
    Files.createTempDirectory("enc").resolve(name).toString

  test("json: array of objects, unwrap single, omit empty") {
    val out = DfkEncoders.encode(df, tmp("r.json"), "json")
    val got = Files.readString(java.nio.file.Paths.get(out))
    assert(got ==
      """[{"Name_text":"Avery Alder","Phones_text":["1-702-111-2222","1-555-333-4444"]},""" +
        """{"Name_text":"Blake, Birch","Phones_text":"1-800-000-0001"},""" +
        """{"Name_text":"Casey \"CC\" Cedar"}]""")
  }

  test("jsonl: one object per line") {
    val out = DfkEncoders.encode(df, tmp("r.jsonl"), "jsonl")
    val lines = Files.readAllLines(java.nio.file.Paths.get(out))
    assert(lines.size == 3)
    assert(lines.get(1) == """{"Name_text":"Blake, Birch","Phones_text":"1-800-000-0001"}""")
  }

  test("csv: header, ; array join, quote rules") {
    val out = DfkEncoders.encode(df, tmp("r.csv"), "csv")
    val lines = Files.readAllLines(java.nio.file.Paths.get(out))
    assert(lines.get(0) == "Name_text,Phones_text")
    assert(lines.get(1) == "Avery Alder,1-702-111-2222;1-555-333-4444")
    assert(lines.get(2) == "\"Blake, Birch\",1-800-000-0001")
    // quote-alone stays UNWRAPPED per the reference's formatFieldValue
    assert(lines.get(3) == "Casey \"\"CC\"\" Cedar,")
  }

  test("xml: declaration + fields under root, arrays ;-joined, entity escaping") {
    val out = DfkEncoders.encode(
      Seq((Seq("a&b"), Seq("<x>", "y'z"))).toDF("N", "P"), tmp("r.xml"), "xml")
    val got = Files.readString(java.nio.file.Paths.get(out))
    assert(got == "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
      "<root><N>a&amp;b</N><P>&lt;x&gt;;y&apos;z</P></root>")
  }

  test("gzip roundtrip") {
    val out = DfkEncoders.encode(df, tmp("r.jsonl"), "jsonl", gzip = true)
    assert(out.endsWith(".gz"))
    val in = new java.util.zip.GZIPInputStream(Files.newInputStream(java.nio.file.Paths.get(out)))
    val content = new String(in.readAllBytes(), "UTF-8")
    assert(content.linesIterator.size == 3)
  }

  test("unknown format rejected") {
    intercept[IllegalArgumentException] { DfkEncoders.encode(df, tmp("r.x"), "parquetish") }
  }

  test("xlsx: zip of well-formed SpreadsheetML parts, CSV-formatted cells") {
    val out = DfkEncoders.encode(df, tmp("r.xlsx"), "xlsx")
    val zf = new java.util.zip.ZipFile(out)
    try {
      val names = {
        val es = zf.entries(); val b = scala.collection.mutable.Set.empty[String]
        while (es.hasMoreElements) b += es.nextElement().getName
        b.toSet
      }
      assert(names == Set("[Content_Types].xml", "_rels/.rels",
        "xl/workbook.xml", "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml"))
      // every part must be well-formed XML
      val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      names.foreach { n =>
        dbf.newDocumentBuilder().parse(zf.getInputStream(zf.getEntry(n)))
      }
      val sheet = new String(
        zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml")).readAllBytes(), "UTF-8")
      // header row then one row per record; cells carry formatFieldValue's
      // output including its trailing comma (the reference's own quirk,
      // encoders.go:427-431) with CSV quote rules applied
      assert(sheet.contains("<t>Name_text</t>"))
      assert(sheet.contains("<t>Avery Alder,</t>"))
      assert(sheet.contains("<t>1-702-111-2222;1-555-333-4444,</t>"))
      assert(sheet.contains("<t>&quot;Blake, Birch&quot;,</t>"))
      assert(sheet.linesIterator.mkString.split("<row>").length == 5) // header + 3 rows (+ prefix)
    } finally zf.close()
  }

  test("xlsx rejects gzip (already a zip)") {
    intercept[IllegalArgumentException] {
      DfkEncoders.encode(df, tmp("g.xlsx"), "xlsx", gzip = true)
    }
  }
}
