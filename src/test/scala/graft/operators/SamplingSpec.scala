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

  test("stratifiedSample: exact per-stratum rates, growth-stable, split-independent") {
    val df = corpus(2000) // 5 strata of 400
    val rates = Map("grp0" -> 0, "grp1" -> 250, "grp2" -> 1000)
    val kept = Sampling.stratifiedSample(df, "grp", "id", rates,
      defaultPermille = 500)
      .select("id", "grp").as[(Long, String)].collect().toSeq
    val byGrp = kept.groupBy(_._2).view.mapValues(_.size).toMap
    assert(!byGrp.contains("grp0")) // permille 0 drops the stratum
    assert(byGrp("grp2") == 400) // permille 1000 keeps it whole
    assert(math.abs(byGrp("grp1") - 100) < 45, byGrp.toString)
    assert(math.abs(byGrp("grp3") - 200) < 60, byGrp.toString) // default
    // partition- and growth-stability: the kept set is a pure id function
    val reparted = Sampling.stratifiedSample(df.repartition(13), "grp", "id",
      rates, defaultPermille = 500)
      .select("id", "grp").as[(Long, String)].collect().toSeq
    assert(reparted.sorted == kept.sorted)
    val grownKept = Sampling.stratifiedSample(corpus(3000), "grp", "id",
      rates, defaultPermille = 500)
      .select("id", "grp").as[(Long, String)].collect().toSeq
    assert(kept.toSet.subsetOf(grownKept.toSet))
    // hash-domain independence from deterministicSplit: a 250-permille
    // sample must not nest inside the train split (same-hash correlation
    // would put 100% of it there)
    val sampleIds = Sampling.stratifiedSample(df, "grp", "id",
      Map.empty, defaultPermille = 250)
      .select("id").as[Long].collect().toSet
    val splits = Sampling.deterministicSplit(df, "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    val inTrain = sampleIds.count(id => splits(id) == "train")
    assert(inTrain < sampleIds.size, "sample nested inside the train split")
    assert(math.abs(inTrain.toDouble / sampleIds.size - 0.8) < 0.1,
      s"sample-vs-split correlation: $inTrain of ${sampleIds.size} in train")
    intercept[IllegalArgumentException](
      Sampling.stratifiedSample(df, "grp", "id", Map("grp0" -> 1001)))
  }

  test("mixToProportions: exact maximal mix at the target weights") {
    // strata of 500/120/80; weights 50/25/25 (permille scale x10):
    // T = min(500*1000/500, 120*1000/250, 80*1000/250) = min(1000,480,320)=320
    // keeps = 160/80/80 — exact proportions, gated by the scarcest stratum
    val df = ((0 until 500).map(i => (i.toLong, "a")) ++
      (1000 until 1120).map(i => (i.toLong, "b")) ++
      (2000 until 2080).map(i => (i.toLong, "c")) ++
      (3000 until 3050).map(i => (i.toLong, "unweighted")))
      .toDF("id", "grp")
    val mix = Sampling.mixToProportions(df, "grp", "id",
      Map("a" -> 500, "b" -> 250, "c" -> 250))
      .select("id", "grp").as[(Long, String)].collect().toSeq
    val by = mix.groupBy(_._2).view.mapValues(_.size).toMap
    assert(by == Map("a" -> 160, "b" -> 80, "c" -> 80), by.toString)
    // maximality: the binding stratum (c: 80 rows) is taken WHOLE
    assert(mix.count(_._2 == "c") == 80)
    // deterministic under repartitioning
    val again = Sampling.mixToProportions(df.repartition(13), "grp", "id",
      Map("a" -> 500, "b" -> 250, "c" -> 250))
      .select("id", "grp").as[(Long, String)].collect().toSeq
    assert(again.sorted == mix.sorted)
    intercept[IllegalArgumentException](
      Sampling.mixToProportions(df, "grp", "id", Map("a" -> 0)))
  }

  test("packSequences: slices tile every doc, sequences fill to seqLen, deterministic") {
    val rnd = new scala.util.Random(7)
    val docs = (0 until 400)
      .map(i => (i.toLong, s"g${i % 3}", 1L + rnd.nextInt(97)))
      .toDF("id", "grp", "toks")
    val L = 64
    val packed = Sampling.packSequences(docs, "grp", "id", "toks", L)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val toksOf = docs.as[(Long, String, Long)].collect()
      .map(r => r._1 -> r._3).toMap

    // each doc's slices tile [0, toks) contiguously across consecutive seqs
    packed.groupBy(_._2).foreach { case (id, slices) =>
      val s = slices.sortBy(_._3)
      assert(s.map(_._3) == (s.head._3 to s.last._3), s"doc $id seq gap")
      assert(s.head._4 == 0 && s.map(_._5).sum == toksOf(id), s"doc $id tiling")
      // interior boundaries: cut exactly at multiples of L
      s.sliding(2).foreach {
        case Seq(a, b) => assert(a._4 + a._5 == b._4, s"doc $id cut")
        case _ =>
      }
    }
    // each (grp, seq) holds exactly L tokens except the group's last seq
    packed.groupBy(p => (p._1, p._3)).foreach { case ((g, k), slices) =>
      val lastSeq = packed.filter(_._1 == g).map(_._3).max
      val total = slices.map(_._5).sum
      if (k < lastSeq) assert(total == L, s"($g,$k) holds $total")
      else assert(total >= 1 && total <= L)
    }
    // deterministic under repartitioning
    val again = Sampling.packSequences(docs.repartition(17), "grp", "id",
      "toks", L).as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(again.sortBy(p => (p._1, p._3, p._2)) ==
      packed.sortBy(p => (p._1, p._3, p._2)))
    intercept[IllegalArgumentException](
      Sampling.packSequences(docs, "grp", "id", "toks", 0))
  }

  test("decontaminate: exact 8-gram overlap counts; sub-span and unrelated docs clean") {
    // benchmark: one 10-token eval item -> exactly 3 distinct 8-grams
    val bench = Seq((0L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val docs = Seq(
      // full leak mid-text -> all 3 benchmark grams present
      (1L, "intro words here the quick brown fox jumps over the lazy dog tonight and trailing prose"),
      // 7-token sub-span -> no 8-gram can match
      (2L, "padding the quick brown fox jumps over the padding end padding"),
      // exactly one 8-token span of the item
      (3L, "xx quick brown fox jumps over the lazy dog yy zz aa"),
      // unrelated -> absent from the output entirely
      (4L, "completely different content with no shared spans at all today"),
      // CASE/whitespace robustness: tokenization lowers + trims
      (5L, "  THE QUICK brown fox JUMPS over the lazy DOG tonight  "))
      .toDF("doc_id", "text")
    val got = Scrub.decontaminate(docs, bench, "text", "doc_id", n = 8)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 3L -> 1L, 5L -> 3L), got.toString)
    // short benchmark rows (< n tokens) contribute nothing and don't throw
    val shortBench = Seq((0L, "too short")).toDF("doc_id", "text")
    assert(Scrub.decontaminate(docs, shortBench, "text", "doc_id", n = 8).isEmpty)
  }

  test("scrubPii: planted spans redacted exactly; idempotent; organic text untouched") {
    val rows = Seq(
      (1L, "plain organic text with numbers 1234 and a plus + sign"),
      (2L, "mail me at a.b+tag@ex-ample.co.uk or root@ex.io today"),
      (3L, "call +1 555 0100 or +49 30-1234567 tonight"),
      (4L, "both: x@y.org and +1 555 9999 end"),
      // '+' is legal in an email local-part: the phone-shaped span inside
      // the email must be counted as part of the ONE email redaction, not
      // double-counted as a phone (ADVICE r5: counts == replacements)
      (5L, "overlap: user+15551234567@example.com only")).toDF("doc_id", "text")
    val out = Scrub.scrubPii(rows, "text")
      .select("doc_id", "n_emails", "n_phones", "clean_text")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 0, 0, "plain organic text with numbers 1234 and a plus + sign")))
    assert(out(1) == ((2L, 2, 0, "mail me at <EMAIL> or <EMAIL> today")))
    assert(out(2) == ((3L, 0, 2, "call <PHONE> or <PHONE> tonight")))
    assert(out(3) == ((4L, 1, 1, "both: <EMAIL> and <PHONE> end")))
    assert(out(4) == ((5L, 1, 0, "overlap: <EMAIL> only")))
    // scrubbing is a fixed point: tokens never re-match the patterns
    val twice = Scrub.scrubPii(
      out.toSeq.map(r => (r._1, r._4)).toDF("doc_id", "text"), "text")
      .select("n_emails", "n_phones").as[(Int, Int)].collect()
    assert(twice.forall(_ == ((0, 0))))
  }
}
