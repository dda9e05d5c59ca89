package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.GraftFunctions._

class HllSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("register file is identical at any partitioning (merge correctness)") {
    val ids = (0 until 20000).map(i => (s"g${i % 3}", s"id-$i")).toDF("g", "v")
    def regs(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(hll_registers(col("v")).as("r"))
        .as[(String, Seq[Int])].collect().toMap
    val a = regs(ids)
    val b = regs(ids.repartition(23))
    val c = regs(ids.coalesce(1))
    assert(a == b && b == c)
    assert(a.values.forall(_.length == 4096))
  }

  test("estimate lands within 3% at n=50k (p=12 standard error ~1.6%)") {
    val df = (0 until 50000).map(i => s"doc-$i").toDF("v")
    val r = df.agg(hll_registers(col("v")).as("r")).as[Seq[Int]].head()
    val est = HllSketch.estimate(r.toArray)
    assert(math.abs(est - 50000) / 50000.0 < 0.03, s"estimate $est")
  }

  test("small-range linear counting is exact-ish and duplicates don't move it") {
    val df = (0 until 100).map(i => s"k$i").toDF("v")
    val r1 = df.agg(hll_registers(col("v")).as("r")).as[Seq[Int]].head()
    // the sketch is a pure set function: duplicating every row 50x
    // changes nothing
    val dup = (0 until 5000).map(i => s"k${i % 100}").toDF("v")
    val r2 = dup.agg(hll_registers(col("v")).as("r")).as[Seq[Int]].head()
    assert(r1 == r2)
    val est = HllSketch.estimate(r1.toArray)
    assert(math.abs(est - 100) / 100.0 < 0.05, s"estimate $est")
  }

  test("register math matches the hand formula for known hashes") {
    // doc0: md5 lower-64 = 11997765398830915582 -> idx 2664, rho 5
    // (cross-checked against DuckDB md5_number_lower // and bin())
    val r = Seq("doc0").toDF("v").agg(hll_registers(col("v")).as("r"))
      .as[Seq[Int]].head()
    assert(r(2664) == 5 && r.sum == 5)
  }

  test("nulls are ignored; non-string input is rejected at analysis") {
    val r = Seq(Some("x"), None, Some("x")).toDF("v")
      .agg(hll_registers(col("v")).as("r")).as[Seq[Int]].head()
    assert(r.count(_ > 0) == 1)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1, 2).toDF("v").agg(hll_registers(col("v"))).collect()
    }
    assert(e.getMessage.contains("hll_registers") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
