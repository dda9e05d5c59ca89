package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

case class ClipEvt(clip_id: String, codec: String, sr_hz: Int, dur_ms: Int,
                   transcript: String, event_time: Timestamp)
case class UpdEvt(clip_id: String, transcript: String, update_time: Timestamp)

/** Stateful stream-stream join (J1 re-expression): clip stream ⟕ late
  * transcript updates, watermark-bounded state; late rows beyond the
  * watermark are dropped; unmatched clips emit with their original
  * transcript once the watermark closes the join window. */
class StatefulJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(1704067200000L + sec * 1000)
  private def clip(id: String, sec: Long) =
    ClipEvt(id, "pcm16", 8000, 1000, s"<card><name>orig-$id</name></card>", ts(sec))
  private def upd(id: String, sec: Long) =
    UpdEvt(id, s"<card><name>upd-$id</name></card>", ts(sec))

  test("updates enrich within the window; unmatched flush after watermark") {
    implicit val ctx = spark.sqlContext
    val clips = MemoryStream[ClipEvt]
    val updates = MemoryStream[UpdEvt]
    val joined = ClipStreamJob.joinUpdates(clips.toDF(), updates.toDF(), "10 seconds")
    val q = joined.writeStream.format("memory").queryName("joined")
      .outputMode("append").start()
    try {
      // c1 updated at +15s (inside 60s bound); c2 never updated.
      clips.addData(clip("c1", 0), clip("c2", 5))
      updates.addData(upd("c1", 15))
      q.processAllAvailable()
      // push both watermarks far past everything => c2 flushes unmatched
      clips.addData(clip("sentinel", 600))
      updates.addData(upd("sentinel-u", 600))
      q.processAllAvailable()
      clips.addData(clip("sentinel2", 1200))
      updates.addData(upd("sentinel-u2", 1200))
      q.processAllAvailable()

      val rows = spark.table("joined")
        .filter(!col("clip_id").startsWith("sentinel"))
        .select("clip_id", "transcript", "updated")
        .as[(String, String, Boolean)].collect().sortBy(_._1)
      assert(rows.length == 2, s"got ${rows.mkString(";")}")
      assert(rows(0) == ("c1", "<card><name>upd-c1</name></card>", true))
      assert(rows(1) == ("c2", "<card><name>orig-c2</name></card>", false))
    } finally q.stop()
  }

  test("update arriving beyond the join bound does not enrich") {
    implicit val ctx = spark.sqlContext
    val clips = MemoryStream[ClipEvt]
    val updates = MemoryStream[UpdEvt]
    val joined = ClipStreamJob.joinUpdates(clips.toDF(), updates.toDF(), "10 seconds")
    val q = joined.writeStream.format("memory").queryName("joined_late")
      .outputMode("append").start()
    try {
      clips.addData(clip("c1", 0))
      q.processAllAvailable()
      updates.addData(upd("c1", 120)) // 120s > 60s join bound
      q.processAllAvailable()
      clips.addData(clip("sentinel", 600)); updates.addData(upd("s-u", 600))
      q.processAllAvailable()
      clips.addData(clip("sentinel2", 1200)); updates.addData(upd("s-u2", 1200))
      q.processAllAvailable()
      val rows = spark.table("joined_late")
        .filter(col("clip_id") === "c1")
        .select("clip_id", "updated").as[(String, Boolean)].collect()
      assert(rows.toSeq == Seq(("c1", false)))
    } finally q.stop()
  }

  test("streaming session windows (append) == batch sessions after flush") {
    implicit val ctx = spark.sqlContext
    val clips = MemoryStream[ClipEvt]
    // two sessions for pcm16: [0..20], gap >= 30s, [60..65]
    val data = Seq(clip("a", 0), clip("b", 10), clip("c", 20),
      clip("d", 60), clip("e", 65))
    val stream = ClipStreamJob.sessionCounts(clips.toDF(), "10 seconds")
    val q = stream.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      clips.addData(data: _*)
      q.processAllAvailable()
      clips.addData(clip("sentinel", 600))
      q.processAllAvailable()
      clips.addData(clip("sentinel2", 1200))
      q.processAllAvailable()
      val got = spark.table("sessions")
        .filter(col("w_start_ms") < 1704067200000L + 300000L)
        .orderBy("w_start_ms")
        .select("w_start_ms", "codec", "n_clips")
        .as[(Long, String, Long)].collect().toSeq
      assert(got == Seq(
        (1704067200000L, "pcm16", 3L),
        (1704067260000L, "pcm16", 2L)))
    } finally q.stop()
  }
}
