package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.fixtures.ClipGen
import graft.functions.GraftFunctions._
import graft.operators.{Dedup, Sampling}
import graft.streaming.ClipStreamJob

/** The README's end-to-end curation pass, run for real: normalize ->
  * near-dup pairs -> clusters -> keep one per family -> cap -> token
  * budget -> split. Every stage is individually oracled/spec'd elsewhere;
  * this proves they COMPOSE (schemas line up, determinism survives
  * chaining, and the dedup family logic keeps exactly one member). */
class CurationPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("curation pipeline composes end-to-end and keeps one copy per dup family") {
    val base = ClipGen.readClips(spark, "/root/testdata/sf0.001")
      .select("clip_id", "bytes", "codec", "sr_hz", "dur_ms")
    // plant trimmed+transcoded twins for every residue-10 clip (the c15
    // fixture construction): each original + twin must collapse to ONE
    val twinCodec = when(col("codec") === "ulaw", lit("alaw")).otherwise(lit("ulaw"))
    val trimmed = expr(
      "substring(bytes, CASE WHEN codec = 'pcm16' THEN 321 ELSE 161 END)")
    val twins = base
      .filter(substring(col("clip_id"), 6, 8).cast("int") % 20 === 10)
      .withColumn("bytes", pcm_transcode(trimmed, col("codec"), twinCodec))
      .withColumn("codec", twinCodec)
      .withColumn("clip_id", concat(col("clip_id"), lit("-s")))
    val raw = base.unionByName(twins)
    val nFamilies = twins.count()

    // 1. normalize-on-ingest (breaks sr/codec skew before anything keys on it)
    val clips = ClipStreamJob.normalizeRate(raw, targetHz = 16000)
    // 2-3. pairs -> canonical keep-id per family. NOTE: near-dup runs on
    // the RAW stream (pre-normalization) — after resampling to one rate,
    // trimmed twins differ only by phase and would need the aligned
    // verify to have already keyed them; the fingerprint keys rely on
    // (sr, f1) diversity.
    val pairs = Dedup.audioNearDupShift(raw)
    val canon = Dedup.components(pairs)
    assert(canon.count() == nFamilies * 2, "every family member labeled")
    // 4. keep canonical-or-unpaired rows
    val keep = clips.join(canon, clips("clip_id") === canon("id"), "left")
      .filter(canon("canonical_id").isNull || canon("canonical_id") === clips("clip_id"))
      .drop("id", "canonical_id")
    assert(keep.count() == raw.count() - nFamilies, "exactly one kept per family")
    // every kept dup-family member is its family's minimum id
    val keptIds = keep.select("clip_id").as[String].collect().toSet
    canon.as[(String, String)].collect().groupBy(_._2).foreach { case (c, members) =>
      assert(keptIds.contains(c) && members.map(_._1).filter(keptIds).toSeq == Seq(c))
    }

    // 5. rebalance + budget + split, all deterministic and composable
    val curated = Sampling.tokenBudgetPerGroup(
      Sampling.capPerGroupSalted(keep, "codec", "clip_id", n = 200, salts = 4),
      "codec", "clip_id", "dur_ms", budget = 100000L)
    assert(curated.groupBy("codec").agg(sum("dur_ms").as("s"))
      .as[(String, Long)].collect().forall(_._2 <= 100000L))
    val split = Sampling.deterministicSplit(curated, "clip_id")
    assert(split.count() == curated.count())
    // chaining changed nothing about determinism: a re-run is identical
    val again = Sampling.deterministicSplit(
      Sampling.tokenBudgetPerGroup(
        Sampling.capPerGroupSalted(keep.repartition(7), "codec", "clip_id",
          n = 200, salts = 4),
        "codec", "clip_id", "dur_ms", budget = 100000L), "clip_id")
    assert(again.select("clip_id", "split").as[(String, String)].collect().sorted.toSeq ==
      split.select("clip_id", "split").as[(String, String)].collect().sorted.toSeq)
  }

  test("curation v2: container ingest -> VAD strip -> incremental dedup -> keep-best -> mix -> pack") {
    // The round-5 operator set composed end-to-end, streaming-ingest
    // style: WAV containers in, packed training sequences out. Every
    // stage is individually oracled/spec'd; this pins the composition.
    val base = ClipGen.readClips(spark, "/root/testdata/sf0.001")
      .select("clip_id", "bytes", "codec", "sr_hz", "dur_ms")

    // 0. the corpus arrives WAV-wrapped with poisoned metadata: ingest
    //    must recover codec/rate from the container
    val arrived = base
      .withColumn("bytes", wav_wrap(col("bytes"), col("codec"), col("sr_hz")))
      .withColumn("codec", lit("unknown")).withColumn("sr_hz", lit(-1))
    val ingested = graft.streaming.ClipStreamJob.ingestWav(arrived)
    assert(ingested.filter(col("codec") === "unknown").isEmpty)

    // 1. VAD silence strip (frame-exact; organic corpus is voiced
    //    end-to-end so only the sub-frame tail is trimmed)
    val stripped = ingested
      .withColumn("bytes", pcm_strip_silence(col("bytes"), col("codec"), col("sr_hz")))

    // 2. a later DELTA arrives: trimmed+transcoded re-uploads (residue
    //    10) — incremental dedup against the ALREADY-INGESTED corpus's
    //    fingerprint table finds every one with zero corpus DSP
    val twinCodec = when(col("codec") === "ulaw", lit("alaw")).otherwise(lit("ulaw"))
    val trimmed = expr(
      "substring(bytes, CASE WHEN codec = 'pcm16' THEN 321 ELSE 161 END)")
    val delta = stripped
      .filter(substring(col("clip_id"), 6, 8).cast("int") % 20 === 10)
      .withColumn("bytes", pcm_transcode(trimmed, col("codec"), twinCodec))
      .withColumn("codec", twinCodec)
      .withColumn("clip_id", concat(col("clip_id"), lit("-re")))
    val fp = Dedup.audioFingerprints(stripped).localCheckpoint(true)
    val pairs = Dedup.audioNearDupIncremental(fp, stripped, delta)
    val expected = delta.select(
      concat(substring(col("clip_id"), 1, 13)).as("orig")).count()
    assert(pairs.count() == expected, s"pairs=${pairs.count()} expected=$expected")

    // 3. keep-best across each dup family (quality = sample count: the
    //    LONGER original beats its trimmed re-upload)
    val quality = stripped.unionByName(delta)
      .select(col("clip_id"),
        pcm_sample_count(col("bytes"), col("codec")).as("q"))
    val keeps = Dedup.keepBest(Dedup.components(pairs), quality, "clip_id", "q")
    val kept = keeps.filter(col("id") === col("keep_id"))
      .select("id").as[String].collect().toSet
    assert(kept.forall(!_.endsWith("-re")), "a trimmed re-upload won keep-best")

    // 4. drop non-kept family members, rebalance to a target codec mix,
    //    pack into fixed sequences
    val all = stripped.unionByName(delta)
    val deduped = all.join(keeps.filter(col("id") =!= col("keep_id"))
      .select(col("id").as("clip_id")), Seq("clip_id"), "left_anti")
    val mixed = Sampling.mixToProportions(deduped, "codec", "clip_id",
      Map("pcm16" -> 700, "ulaw" -> 200, "alaw" -> 100))
    val withTok = mixed.withColumn("n_samples",
      pcm_sample_count(col("bytes"), col("codec")).cast("long"))
    val packed = Sampling.packSequences(withTok, "codec", "clip_id",
      "n_samples", seqLen = 160000)
    assert(packed.count() > 0)
    // tiling: per codec, every sequence except the last holds exactly
    // seqLen samples
    packed.groupBy("codec", "seq_id").agg(sum("slice_len").as("s"))
      .as[(String, Long, Long)].collect().groupBy(_._1).foreach {
        case (codec, seqs) =>
          val last = seqs.map(_._2).max
          seqs.filter(_._2 < last).foreach { r =>
            assert(r._3 == 160000L, s"$codec seq ${r._2} holds ${r._3}")
          }
      }
    // determinism under repartitioning, end to end
    val again = Sampling.packSequences(
      Sampling.mixToProportions(deduped.repartition(11), "codec", "clip_id",
        Map("pcm16" -> 700, "ulaw" -> 200, "alaw" -> 100))
        .withColumn("n_samples",
          pcm_sample_count(col("bytes"), col("codec")).cast("long")),
      "codec", "clip_id", "n_samples", seqLen = 160000)
    assert(again.select("clip_id", "seq_id", "doc_start", "slice_len")
      .as[(String, Long, Long, Long)].collect().sorted.toSeq ==
      packed.select("clip_id", "seq_id", "doc_start", "slice_len")
        .as[(String, Long, Long, Long)].collect().sorted.toSeq)
  }
}
