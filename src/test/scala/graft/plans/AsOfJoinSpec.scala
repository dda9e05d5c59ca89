package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The custom as-of join: logical node -> injected strategy -> merge-sweep
  * exec. Verified against the composed-operators re-expression (equi-join
  * + row_number window), plus plan shape and parallelism invariance. */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1704067200000L + s * 1000)

  private lazy val left = Seq(
    (1L, ts(10), "l-a"), (1L, ts(20), "l-b"), (1L, ts(3), "l-pre"),
    (2L, ts(15), "l-c"),
    (3L, ts(9), "l-nomatch"), // key with no right rows
    (4L, ts(5), "l-exact")    // exact-tie timestamp
  ).toDF("k", "t", "tag")

  private lazy val right = Seq(
    (1L, ts(5), "r-1"), (1L, ts(18), "r-2"), (1L, ts(25), "r-late"),
    (2L, ts(1), "r-3"),
    (4L, ts(5), "r-tie"),     // equal time counts (at-or-before)
    (9L, ts(2), "r-unused")   // key with no left rows
  ).toDF("rk", "rt", "rtag")

  /** Reference semantics composed from built-ins: O(matches) blowup, only
    * usable as a small-scale oracle. */
  private def composed(l: DataFrame, r: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("k"), col("t"), col("tag"))
      .orderBy(col("rt").desc, col("rtag"))
    l.join(r, col("k") === col("rk") && col("rt") <= col("t"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  test("as-of join matches the composed join+window re-expression") {
    val got = AsOfJoin(left, right, "k", "rk", "t", "rt")
      .select("tag", "rtag").as[(String, String)].collect().toSet
    val want = composed(left, right)
      .select("tag", "rtag").as[(String, String)].collect().toSet
    assert(want.nonEmpty)
    assert(got == want)
    // spot semantics: no-match left dropped, exact tie matches, latest wins
    assert(got == Set(
      ("l-a", "r-1"), ("l-b", "r-2"), ("l-c", "r-3"), ("l-exact", "r-tie")))
  }

  test("ties on (key, time) resolve to the greatest tiebreak, any partitioning") {
    // Two right rows tied on (key, time): without a tiebreak the winner is
    // whichever sorted last (partition/scan-order dependent); with
    // rightTieBreakCol the greatest value must win at every layout.
    val l = Seq((1L, ts(10), "click")).toDF("k", "t", "tag")
    val rTied = Seq(
      (1L, ts(5), "v-02"), (1L, ts(5), "v-10"), (1L, ts(5), "v-07"),
      (1L, ts(1), "v-99") // earlier time: must lose to the ts(5) group
    ).toDF("rk", "rt", "rtag")
    for (parts <- Seq(1, 3, 7)) {
      val got = AsOfJoin(l, rTied.repartition(parts), "k", "rk", "t", "rt",
        rightTieBreakCol = Some("rtag"))
        .select("tag", "rtag").as[(String, String)].collect().toSeq
      assert(got == Seq(("click", "v-10")), s"parts=$parts => $got")
    }
  }

  test("physical plan uses AsOfJoinExec with one exchange per side") {
    val plan = AsOfJoin(left, right, "k", "rk", "t", "rt")
      .queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("AsOfJoin"), s)
    val exchanges = s.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 2, s"expected 2 exchanges, plan:\n$s")
  }

  test("identical results at different parallelism and input partitioning") {
    val l = left.repartition(7)
    val r = right.repartition(3)
    val got = AsOfJoin(l, r, "k", "rk", "t", "rt")
      .select("tag", "rtag").as[(String, String)].collect().toSet
    val want = composed(left, right)
      .select("tag", "rtag").as[(String, String)].collect().toSet
    assert(got == want)
  }

  test("null keys and times never match") {
    val ln = left.unionByName(Seq((0L, ts(1), "l-null")).toDF("k", "t", "tag")
      .withColumn("k", lit(null).cast("long")))
    val rn = right.unionByName(Seq((1L, ts(1), "r-null")).toDF("rk", "rt", "rtag")
      .withColumn("rt", lit(null).cast("timestamp")))
    val got = AsOfJoin(ln, rn, "k", "rk", "t", "rt")
      .select("tag", "rtag").as[(String, String)].collect().toSet
    assert(!got.exists(p => p._1 == "l-null" || p._2 == "r-null"))
  }

  test("self-join (same source both sides) re-aliases cleanly") {
    val ev = Seq((1L, ts(1), "a"), (1L, ts(2), "b"), (1L, ts(3), "a"))
      .toDF("k", "t", "typ")
    val l = ev.filter(col("typ") === "a")
    val r = ev.filter(col("typ") === "b")
      .select(col("k").as("rk"), col("t").as("rt"), col("typ").as("rtyp"))
    val got = AsOfJoin(l, r, "k", "rk", "t", "rt")
      .select(unix_millis(col("t")), unix_millis(col("rt")))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((ts(3).getTime, ts(2).getTime)))
  }
}
