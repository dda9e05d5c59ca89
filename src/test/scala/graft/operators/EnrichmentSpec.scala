package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextOps

class EnrichmentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("policyGate: deny list rows removed, everything else passes") {
    val df = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    val deny = Seq("b").toDF("k")
    val got = Enrichment.policyGate(df, deny, "k").select("k").as[String].collect().sorted
    assert(got.toSeq == Seq("a", "c"))
  }

  test("multiHop: two bounded hops enrich to the leaf") {
    val base = Seq(("x", "c1"), ("y", "c2"), ("z", "c9")).toDF("id", "cid")
    val cities = Seq(("c1", "r1"), ("c2", "r2")).toDF("cid2", "rid")
      .withColumnRenamed("cid2", "cid")
    val regions = Seq(("r1", "north"), ("r2", "south")).toDF("rid2", "name")
      .withColumnRenamed("rid2", "rid")
    val got = Enrichment.multiHop(base,
      Seq((cities, "cid", "cid"), (regions, "rid", "rid")))
      .select("id", "name").as[(String, String)].collect().toMap
    assert(got == Map("x" -> "north", "y" -> "south", "z" -> null))
  }

  test("uidCol = crc32(md5(to_json(struct))) — P4 composition") {
    val got = Seq(("clip-1", "pcm16")).toDF("clip_id", "codec")
      .select(Enrichment.uidCol(col("clip_id"), col("codec"))).as[String].head()
    // manual: md5 of the json, crc32 of the md5 HEX STRING as spark does
    val json = """{"clip_id":"clip-1","codec":"pcm16"}"""
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest(json.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val crc = new java.util.zip.CRC32()
    crc.update(md5hex.getBytes("UTF-8"))
    assert(got == java.lang.Long.toHexString(crc.getValue))
  }

  test("specUid is stable and distinguishes specs") {
    val a = ExtractionSpec("x", Seq(FieldSpec("N", "name", Seq("text"))))
    val b = ExtractionSpec("x", Seq(FieldSpec("N", "name", Seq("text", "href"))))
    assert(Enrichment.specUid(a) == Enrichment.specUid(a))
    assert(Enrichment.specUid(a) != Enrichment.specUid(b))
  }

  test("rel_url resolves like java.net.URI (F8)") {
    assert(TextOps.relUrl("https://h.test/a/b", "/person/1") == "https://h.test/person/1")
    assert(TextOps.relUrl("https://h.test/a/", "c.html") == "https://h.test/a/c.html")
    assert(TextOps.relUrl("https://h.test", "https://other.test/x") == "https://other.test/x")
    assert(TextOps.relUrl("::bad::", "still-returned") == "still-returned")
    val got = Seq(("https://h.test/a/b", "/p/1")).toDF("b", "r")
      .select(graft.functions.GraftFunctions.rel_url(col("b"), col("r"))).as[String].head()
    assert(got == "https://h.test/p/1")
  }

  test("str_to_map parses form-data (F14)") {
    val got = Seq("a=1&b=2").toDF("s")
      .select(str_to_map(col("s"), lit("&"), lit("=")).as("m"))
      .select(col("m")("a"), col("m")("b")).as[(String, String)].head()
    assert(got == ("1", "2"))
  }
}
