package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.audio.{AudioCodec, AudioSynth}

case class AudioEvt(clip_id: String, bytes: Array[Byte], codec: String,
                    sr_hz: Int, event_time: Timestamp)

/** Streaming dedup with bounded state: dropDuplicatesWithinWatermark keeps
  * the dedup key set only as long as the watermark requires (SURVEY §2.11
  * mandates it alongside windows/joins) — re-expresses the reference's
  * deterministic-key idempotency at the STREAM level instead of the sink. */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(1704067200000L + sec * 1000)
  private def clip(id: String, sec: Long) =
    ClipEvt(id, "pcm16", 8000, 1000, s"<card><name>$id</name></card>", ts(sec))

  test("duplicate clip_ids within the watermark are dropped exactly-once") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ClipEvt]
    val deduped = in.toDF()
      .withWatermark("event_time", "30 seconds")
      .dropDuplicatesWithinWatermark("clip_id")
      .groupBy(window(col("event_time"), "10 seconds"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("window.start")).as("w"), col("n"))
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      // c1 delivered 3x (same batch + next batch), c2 once
      in.addData(clip("c1", 1), clip("c1", 1), clip("c2", 5))
      q.processAllAvailable()
      in.addData(clip("c1", 1)) // replayed duplicate, still inside watermark
      q.processAllAvailable()
      in.addData(clip("s", 600)); q.processAllAvailable()
      in.addData(clip("s2", 1200)); q.processAllAvailable()
      val got = spark.table("dedup_stream")
        .filter(col("w") === 1704067200000L).select("n").as[Long].collect()
      assert(got.toSeq == Seq(2L)) // c1 once + c2 once
    } finally q.stop()
  }

  test("CONTENT dedup: transcoded re-uploads dropped by acoustic fingerprint") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[AudioEvt]
    val q = ClipStreamJob.audioDedupStream(in.toDF())
      .writeStream.format("memory").queryName("audio_dedup")
      .outputMode("append").start()
    try {
      val a16 = AudioCodec.encode(AudioSynth.synth(AudioSynth.mix64(1L), 8000, 8000), "pcm16")
      val b16 = AudioCodec.encode(AudioSynth.synth(AudioSynth.mix64(2L), 8000, 8000), "pcm16")
      // batch 1: two distinct clips pass
      in.addData(AudioEvt("a", a16, "pcm16", 8000, ts(1)),
        AudioEvt("b", b16, "pcm16", 8000, ts(2)))
      q.processAllAvailable()
      // batch 2: the SAME audio as `a`, re-uploaded under a new id and a
      // different codec — the G.711 transcode preserves (sr, n, f1), so
      // the fingerprint key is already in dedup state -> dropped
      val aUlaw = AudioCodec.transcode(a16, "pcm16", "ulaw")
      in.addData(AudioEvt("a-reupload", aUlaw, "ulaw", 8000, ts(3)))
      q.processAllAvailable()
      // batch 3: a genuinely new clip still passes
      val c16 = AudioCodec.encode(AudioSynth.synth(AudioSynth.mix64(3L), 8000, 8000), "pcm16")
      in.addData(AudioEvt("c", c16, "pcm16", 8000, ts(4)))
      q.processAllAvailable()
      val got = spark.table("audio_dedup").select("clip_id").as[String].collect().toSet
      assert(got == Set("a", "b", "c"), s"got $got")
    } finally q.stop()
  }

  test("SHIFT-ROBUST content dedup: trimmed+transcoded re-uploads dropped on ingest") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[AudioEvt]
    val q = ClipStreamJob.audioDedupStream(in.toDF(), shiftRobust = true)
      .writeStream.format("memory").queryName("audio_dedup_shift")
      .outputMode("append").start()
    try {
      val a16 = AudioCodec.encode(AudioSynth.synth(AudioSynth.mix64(7L), 8000, 8000), "pcm16")
      val b16 = AudioCodec.encode(AudioSynth.synth(AudioSynth.mix64(8L), 8000, 8000), "pcm16")
      in.addData(AudioEvt("a", a16, "pcm16", 8000, ts(1)),
        AudioEvt("b", b16, "pcm16", 8000, ts(2)))
      q.processAllAvailable()
      // the c15 attack, on ingest: 160 leading samples trimmed AND
      // transcoded to ulaw — the exact-length key of the plain dedup
      // would pass it; the bucketed key must drop it
      val aTrimUlaw = AudioCodec.transcode(
        java.util.Arrays.copyOfRange(a16, 320, a16.length), "pcm16", "ulaw")
      in.addData(AudioEvt("a-trim-reupload", aTrimUlaw, "ulaw", 8000, ts(3)))
      q.processAllAvailable()
      // distinct content still passes
      val c16b = AudioCodec.encode(AudioSynth.synth(AudioSynth.mix64(9L), 8000, 8000), "pcm16")
      in.addData(AudioEvt("c", c16b, "pcm16", 8000, ts(4)))
      q.processAllAvailable()
      val got = spark.table("audio_dedup_shift").select("clip_id").as[String].collect().toSet
      assert(got == Set("a", "b", "c"), s"got $got")
    } finally q.stop()
  }

  test("EXACT-VERIFY incremental dedup against the table: first arrival wins") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[AudioEvt]
    val dir = java.nio.file.Files.createTempDirectory("tbl-incdedup").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-incdedup").toString
    val table = ClipTable(dir, Seq("clip_id"), numBuckets = 2,
      mergeOnRead = true, gcGraceMs = 0L)
    val q = ClipStreamJob.runDedupedToTable(in.toDF(), table, ckpt,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    def pcm(seed: Long) =
      AudioCodec.encode(AudioSynth.synth(AudioSynth.mix64(seed), 8000, 8000), "pcm16")
    // trimmed + transcoded re-upload: the c15 attack, across micro-batches
    def twin(of: Array[Byte]) =
      AudioCodec.transcode(java.util.Arrays.copyOfRange(of, 320, of.length),
        "pcm16", "ulaw")
    try {
      val a = pcm(1); val b = pcm(2); val c = pcm(3); val d = pcm(4)
      in.addData(AudioEvt("a", a, "pcm16", 8000, ts(1)),
        AudioEvt("b", b, "pcm16", 8000, ts(2)))
      q.processAllAvailable()
      // batch 2: a's re-upload (vs the TABLE), a fresh clip, and a
      // batch-internal twin pair (d1 survives, d2 drops)
      in.addData(AudioEvt("a-re", twin(a), "ulaw", 8000, ts(10)),
        AudioEvt("c", c, "pcm16", 8000, ts(11)),
        AudioEvt("d1", d, "pcm16", 8000, ts(12)),
        AudioEvt("d2", twin(d), "ulaw", 8000, ts(13)))
      q.processAllAvailable()
      // batch 3: b's re-upload — lookback spans ALL prior batches, not a
      // watermark window
      in.addData(AudioEvt("b-re", twin(b), "ulaw", 8000, ts(2000)))
      q.processAllAvailable()
      val ids = table.read(spark).select("clip_id").as[String].collect().toSet
      assert(ids == Set("a", "b", "c", "d1"), ids.toString)
      // the decode-once discipline: fingerprints persisted at ingest
      val cols = table.read(spark).columns.toSet
      assert(Set("n_samples", "f1", "f2").subsetOf(cols), cols.toString)
    } finally q.stop()
  }
}
