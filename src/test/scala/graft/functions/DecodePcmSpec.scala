package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.audio.AudioCodec
import graft.fixtures.ClipGen
import graft.functions.GraftFunctions._

/** The per-row invariant from BASELINE.json input_hint, enforced at the
  * Catalyst-expression level: decoded PCM allclose (SNR >= 30 dB) vs the
  * generator's reference signal, plus transcript equality. */
class DecodePcmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val clips = ClipGen.clipsDf(spark, 60).cache()

  test("decode_pcm meets SNR >= 30 dB vs reference PCM for every clip/codec") {
    val rows = clips
      .select(col("clip_id"), col("codec"),
        decode_pcm(col("bytes"), col("codec"), col("sr_hz")).as("pcm"))
      .collect()
    assert(rows.length == 60)
    rows.foreach { r =>
      val idx = r.getString(0).stripPrefix("clip-").toLong
      val got = r.getSeq[Float](2).toArray
      val ref = ClipGen.referencePcm(idx)
      val snr = AudioCodec.snrDb(ref, got)
      assert(snr >= 30.0, s"${r.getString(0)} codec=${r.getString(1)} snr=$snr")
    }
  }

  test("transcript equality: generated table carries the exact fixture transcript") {
    val rows = clips.select("clip_id", "person_idx", "transcript").collect()
    rows.foreach { r =>
      val want = graft.fixtures.Persons.transcript(
        graft.fixtures.Persons.all(r.getInt(1)))
      assert(r.getString(2) == want, s"${r.getString(0)}")
    }
  }

  test("fused pcm_rms == rms of decode_pcm output") {
    val rows = clips
      .select(col("clip_id"),
        pcm_rms(col("bytes"), col("codec")).as("fused"),
        decode_pcm(col("bytes"), col("codec"), col("sr_hz")).as("pcm"))
      .collect()
    rows.foreach { r =>
      val fused = r.getDouble(1)
      val pcm = r.getSeq[Float](2)
      val manual = math.sqrt(pcm.map(x => x.toDouble * x).sum / pcm.size)
      assert(math.abs(fused - manual) < 1e-6, s"${r.getString(0)}: $fused vs $manual")
    }
  }

  test("SQL registration: decode_pcm / pcm_rms / pcm_sample_count callable from SQL") {
    GraftFunctions.register(spark)
    clips.createOrReplaceTempView("clips_v")
    val row = spark.sql(
      """SELECT clip_id, size(decode_pcm(bytes, codec, sr_hz)) AS n,
        |       pcm_sample_count(bytes, codec) AS n2,
        |       pcm_rms(bytes, codec) AS r
        |FROM clips_v ORDER BY clip_id LIMIT 5""".stripMargin).collect()
    row.foreach { r =>
      assert(r.getInt(1) == r.getInt(2))
      assert(r.getDouble(3) > 0.0)
    }
  }

  test("pcm_tone: plan output == direct synth bytes; nulls propagate; types checked") {
    import spark.implicits._
    val rows = Seq((8000, 250000L, 1600), (44100, 1378125L, 4410),
      (16000, 3500000L, 320)).toDF("sr", "f_mhz", "n")
    val got = rows.select(col("sr"), col("f_mhz"), col("n"),
        pcm_tone(col("sr"), col("f_mhz"), col("n")).as("b"))
      .collect()
    got.foreach { r =>
      val want = graft.audio.AudioSynth.tone(r.getInt(0), r.getLong(1), r.getInt(2))
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("b"), want),
        s"sr=${r.getInt(0)}")
    }
    val withNull = Seq((Some(8000), Option.empty[Long], Some(100)))
      .toDF("sr", "f_mhz", "n")
      .select(pcm_tone(col("sr"), col("f_mhz"), col("n"))).collect()
    assert(withNull.head.isNullAt(0))
    val e = intercept[Exception] {
      rows.select(pcm_tone(col("f_mhz"), col("f_mhz"), col("n"))).collect()
    }
    assert(e.getMessage.contains("pcm_tone") || e.getMessage.contains("DATATYPE"))
  }

  test("decode_pcm rejects wrong input types at analysis time") {
    val e = intercept[Exception] {
      clips.select(decode_pcm(col("transcript"), col("codec"), col("sr_hz"))).collect()
    }
    assert(e.getMessage.contains("decode_pcm") || e.getMessage.contains("DATATYPE"))
  }
}
