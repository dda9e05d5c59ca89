package graft.audio

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.operators.Dedup

/** Planted-skew exercise of `audioNearDupShift(salts = S)` — the r4
  * verdict's one documented-but-untested skew surface: a near-constant-
  * tone corpus concentrates EVERY clip on one (sr, f1, nb, f2b)
  * fingerprint key, and the unsalted candidate stage would collect the
  * whole corpus into one task. The salted cell pairing must (a) produce
  * the IDENTICAL pair set, (b) actually spread the hot group (grouping
  * keys include the cell columns; per-cell row counts are ~2m/S), and
  * (c) stay deterministic under repartitioning. */
class AudioSkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val M = 120
  private val Sr = 8000
  private val N = 2000
  private val S = 8

  /** One hot key by construction: every clip is 0.5·sin(1000 Hz) +
    * 0.3·sin(1703 Hz) with per-clip deterministic phases — the integer-Hz
    * tone estimates are EXACTLY (1000, 1703) for all clips, lengths are
    * equal, so (sr, f1, nb, f2b) is a single group of M rows. */
  private def hotClip(i: Long): (String, Array[Byte], String, Int) = {
    val p1 = 2.0 * math.Pi *
      (java.lang.Long.remainderUnsigned(AudioSynth.mix64(0xA11CE + i), 1000L) / 1000.0)
    val p2 = 2.0 * math.Pi *
      (java.lang.Long.remainderUnsigned(AudioSynth.mix64(0xB0B0 + i), 1000L) / 1000.0)
    val w1 = 2.0 * math.Pi * 1000.0 / Sr
    val w2 = 2.0 * math.Pi * 1703.0 / Sr
    val pcm = Array.tabulate(N)(n =>
      (0.5 * math.sin(w1 * n + p1) + 0.3 * math.sin(w2 * n + p2)).toFloat)
    (f"hot-$i%05d", AudioCodec.encode(pcm, "pcm16"), "pcm16", Sr)
  }

  private lazy val baseRows = (0L until M.toLong).map(hotClip)
  private lazy val corpus = {
    // plus trimmed twins for every 20th clip (the c15 attack) — recall
    // through the salted path must be exact
    val twins = baseRows.zipWithIndex.collect { case ((id, b, c, sr), i) if i % 20 == 3 =>
      (id + "-s", java.util.Arrays.copyOfRange(b, 320, b.length), c, sr)
    }
    (baseRows ++ twins).toDF("clip_id", "bytes", "codec", "sr_hz")
  }

  test("the planted corpus really is one fingerprint key") {
    val keys = baseRows.take(20).map { case (_, b, c, sr) =>
      val tp = AudioCodec.tonePair(b, c, sr)
      (sr, AudioCodec.sampleCount(b.length, c), tp(0), tp(1))
    }
    assert(keys.distinct.size == 1, s"keys not constant: ${keys.distinct}")
    assert(keys.head == ((Sr, N, 1000, 1703)), s"unexpected key ${keys.head}")
  }

  test("salted pair set is IDENTICAL to unsalted on the hot-key corpus") {
    val unsalted = Dedup.audioNearDupShift(corpus)
      .as[(String, String)].collect().toSet
    val salted = Dedup.audioNearDupShift(corpus, salts = S)
      .as[(String, String)].collect().toSet
    assert(salted == unsalted,
      s"missing: ${unsalted.diff(salted)}, extra: ${salted.diff(unsalted)}")
    // the planted twins are recovered through the salted path
    val want = baseRows.zipWithIndex.collect { case ((id, _, _, _), i) if i % 20 == 3 =>
      (id, id + "-s") }.toSet
    assert(want.nonEmpty && want.subsetOf(salted))
    // and deterministic under repartitioning
    val again = Dedup.audioNearDupShift(corpus.repartition(13), salts = S)
      .as[(String, String)].collect().toSet
    assert(again == salted)
  }

  test("the hot group is structurally spread: cells in the grouping key, bounded cell size") {
    val df = Dedup.audioNearDupShift(corpus, salts = S)
    // the ANALYZED plan keeps the _ca/_cb aliases (the optimizer may
    // collapse them into struct-field extractions); grouping keys are
    // never dropped by optimization, so this is the stable place to check
    val aggs = df.queryExecution.analyzed.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
        if a.groupingExpressions.exists(_.references.exists(_.name == "_ca")) => a
    }
    assert(aggs.nonEmpty, "no candidate aggregation keyed by the salt cells")
    aggs.foreach { a =>
      val names = a.groupingExpressions.flatMap(_.references.map(_.name)).toSet
      assert(Set("_ca", "_cb", "sr", "f1", "nb", "f2b").subsetOf(names),
        s"cell grouping incomplete: $names")
    }
    // quantitative spread: a cell (a, b) holds only rows with salt a or b,
    // so its collected size is c_a + c_b (c_a for the diagonal) — compute
    // the salt histogram with the operator's own hash and bound the worst
    // cell far below the unsalted group size (= all rows).
    val m = corpus.count()
    val counts = corpus
      .select(pmod(hash(col("clip_id")), lit(S)).cast("int").as("s"))
      .groupBy("s").count().as[(Int, Long)].collect().toMap
    val worstCell = (for (a <- 0 until S; b <- a until S) yield
      if (a == b) counts.getOrElse(a, 0L)
      else counts.getOrElse(a, 0L) + counts.getOrElse(b, 0L)).max
    assert(worstCell < m / 2,
      s"worst cell $worstCell of $m rows — hot group not spread")
  }
}
