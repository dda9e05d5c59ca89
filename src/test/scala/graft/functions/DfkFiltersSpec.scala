package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Parity tests: the Column path must agree with the pure-Scala reference
  * implementation of the filter semantics cited from
  * `/root/reference/scrape/scrape.go:87-132`. */
class DfkFiltersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def runColumn(name: String, param: String, inputs: Seq[String]): Seq[String] =
    inputs.toDF("v").select(DfkFilters.filter(name, param)($"v").as("r"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq

  private val corpus = Seq(
    "", "  padded  ", "MiXeD CaSe", "hello world", "a-b c_d 42x",
    "phone 1-702-292-6096 and 1-555-111-0001 end", "ALLCAPS", "ünïcode wörds",
    "no.digits.here", "42", "tab\tsep", "<tag>body</tag>")

  test("trim/lowercase/uppercase/capitalize parity vs pure-Scala semantics") {
    for (name <- Seq("trim", "lowercase", "uppercase", "capitalize")) {
      val got = runColumn(name, "", corpus)
      val want = corpus.map(DfkFilters.applyScala(name, "", _))
      assert(got == want, s"filter=$name")
    }
  }

  test("capitalize = Go strings.Title, not initcap") {
    assert(DfkFilters.goTitle("her royal highness") == "Her Royal Highness")
    // boundary after ANY non-letter, rest of word untouched:
    assert(DfkFilters.goTitle("a-b_c.d") == "A-B_C.D")
    assert(DfkFilters.goTitle("miXED caSE") == "MiXED CaSE")
    assert(DfkFilters.goTitle("42abc") == "42Abc")
  }

  test("regex filter: trailing-; join, no-match empty, group auto-wrap") {
    // matches joined with ';' each followed by ';' (scrape.go:100-127)
    val got = runColumn("regex", "1-\\d{3}-\\d{3}-\\d{4}",
      Seq("phone 1-702-292-6096 and 1-555-111-0001 end", "nothing here", ""))
    assert(got == Seq("1-702-292-6096;1-555-111-0001;", "", ""))
    // explicit single group
    assert(runColumn("regex", "(\\d+)x", Seq("3x 4x")) == Seq("3;4;"))
    // >1 group rejected at plan time
    intercept[IllegalArgumentException] { DfkFilters.filter("regex", "(a)(b)") }
  }

  test("empty-input passthrough (F6) and null tolerance") {
    val got = runColumn("uppercase", "", Seq("", null, "x"))
    assert(got == Seq("", null, "X"))
  }

  test("unknown filter rejected at plan time (F7)") {
    intercept[IllegalArgumentException] { DfkFilters.filter("nope", "") }
  }

  test("filter chain composes in order") {
    val f = DfkFilters.chain(Seq(("trim", ""), ("capitalize", ""), ("regex", "[A-Z]\\w+")))
    val got = Seq("  alpha beta  ").toDF("v").select(f($"v")).as[String].collect()
    assert(got.toSeq == Seq("Alpha;Beta;"))
  }

  test("regex parity vs pure-Scala on the corpus") {
    for (pat <- Seq("\\d+", "[A-Za-z]+", "w\\w+")) {
      val got = runColumn("regex", pat, corpus)
      val want = corpus.map(DfkFilters.applyScala("regex", pat, _))
      assert(got == want, s"pattern=$pat")
    }
  }
}
