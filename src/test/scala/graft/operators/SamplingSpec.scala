package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, s"grp${i % 5}")).toDF("id", "grp")

  test("deterministicSplit: pure function of id — partition- and growth-stable") {
    val base = Sampling.deterministicSplit(corpus(2000), "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    // identical at any partitioning (randomSplit fails exactly this)
    val reparted = Sampling.deterministicSplit(corpus(2000).repartition(13), "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(reparted == base)
    // growing the corpus never moves an existing row's split
    val grown = Sampling.deterministicSplit(corpus(3000), "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(base.forall { case (id, s) => grown(id) == s })
    // fractions land near 80/10/10 (hash uniformity)
    val counts = base.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 1600) < 100, counts.toString)
    assert(math.abs(counts("val") - 200) < 60, counts.toString)
    assert(math.abs(counts("test") - 200) < 60, counts.toString)
    // degenerate permilles rejected
    intercept[IllegalArgumentException](
      Sampling.deterministicSplit(corpus(10), "id", trainPermille = 900,
        valPermille = 200))
  }

  test("capPerGroup: exact cap, deterministic kept set, stable across partitioning") {
    val capped = Sampling.capPerGroup(corpus(1000), "grp", "id", 7)
      .select("id", "grp").as[(Long, String)].collect().sorted.toSeq
    assert(capped.length == 5 * 7)
    assert(capped.map(_._2).groupBy(identity).forall(_._2.size == 7))
    val again = Sampling.capPerGroup(corpus(1000).repartition(11), "grp", "id", 7)
      .select("id", "grp").as[(Long, String)].collect().sorted.toSeq
    assert(again == capped)
    // groups smaller than the cap pass through whole
    val tiny = Sampling.capPerGroup(corpus(3), "grp", "id", 7)
    assert(tiny.count() == 3)
  }

  test("tokenBudgetPerGroup: maximal hash-order prefix within budget, deterministic") {
    val df = (0 until 300).map(i => (i.toLong, s"g${i % 3}", 10L + i % 7))
      .toDF("id", "grp", "toks")
    val kept = Sampling.tokenBudgetPerGroup(df, "grp", "id", "toks", 500L)
      .select("id", "grp", "toks").as[(Long, String, Long)].collect()
    // per group: total within budget, and the kept set is exactly the
    // maximal prefix in (md5-hex(id), id) order — verified independently
    val perGroup = kept.groupBy(_._2)
    assert(perGroup.keySet == Set("g0", "g1", "g2"))
    val all = df.as[(Long, String, Long)].collect()
    def md5hex(id: Long): String = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for ((g, rows) <- perGroup) {
      assert(rows.map(_._3).sum <= 500L)
      val order = all.filter(_._2 == g).sortBy(t => (md5hex(t._1), t._1))
      var run = 0L
      val expect = order.takeWhile { t => run += t._3; run <= 500L }.map(_._1).toSet
      assert(rows.map(_._1).toSet == expect, s"group $g kept wrong prefix")
    }
    // stable across partitioning
    val again = Sampling.tokenBudgetPerGroup(df.repartition(13), "grp", "id", "toks", 500L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(again == kept.map(_._1).sorted.toSeq)
    // a first row larger than the budget empties the group
    val fat = Seq((1L, "g", 100L), (2L, "g", 100L)).toDF("id", "grp", "toks")
    assert(Sampling.tokenBudgetPerGroup(fat, "grp", "id", "toks", 50L).count() == 0)
  }

  test("capPerGroupSalted: identical kept set to capPerGroup, incl. one-group skew") {
    // balanced corpus, several salt counts (1 = degenerate single phase)
    val plain = Sampling.capPerGroup(corpus(1000), "grp", "id", 7)
      .select("id", "grp").as[(Long, String)].collect().sorted.toSeq
    for (salts <- Seq(1, 4, 32)) {
      val salted = Sampling.capPerGroupSalted(corpus(1000), "grp", "id", 7, salts)
        .select("id", "grp").as[(Long, String)].collect().sorted.toSeq
      assert(salted == plain, s"salts=$salts diverged")
    }
    // the pathological case the salted form exists for: ONE giant group
    val hot = (0 until 5000).map(i => (i.toLong, "only")).toDF("id", "grp")
    val hotPlain = Sampling.capPerGroup(hot, "grp", "id", 20)
      .select("id").as[Long].collect().sorted.toSeq
    val hotSalted = Sampling.capPerGroupSalted(hot, "grp", "id", 20, salts = 16)
      .select("id").as[Long].collect().sorted.toSeq
    assert(hotSalted == hotPlain)
    assert(hotSalted.length == 20)
    // groups smaller than the cap survive both phases whole
    assert(Sampling.capPerGroupSalted(corpus(3), "grp", "id", 7, 16).count() == 3)
  }
}
