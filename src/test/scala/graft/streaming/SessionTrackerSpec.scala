package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

case class SessEvt(clip_id: String, person_idx: Int, dur_ms: Int, event_time: Timestamp)

/** Custom keyed state (flatMapGroupsWithState + EventTimeTimeout) — the
  * per-user session-state semantics (T5/T6). */
class SessionTrackerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(1704067200000L + sec * 1000)
  private def e(p: Int, sec: Long, dur: Int = 1000) =
    SessEvt(s"c$p-$sec", p, dur, ts(sec))

  test("sessions close on event-time gap and on watermark timeout") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SessEvt]
    val out = SessionTracker.sessions(
      in.toDF().withWatermark("event_time", "10 seconds"))
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // person 1: two sessions (gap 40s); person 2: one session
      in.addData(e(1, 0), e(1, 5), e(1, 45), e(2, 3))
      q.processAllAvailable()
      // watermark push to close open sessions
      in.addData(e(9, 600))
      q.processAllAvailable()
      in.addData(e(9, 1200))
      q.processAllAvailable()

      val rows = spark.table("sess")
        .filter($"person_idx" < 9)
        .orderBy("person_idx", "session_start_ms")
        .as[SessionTracker.ClipSession].collect().toSeq
      assert(rows == Seq(
        SessionTracker.ClipSession(1, ts(0).getTime, ts(5).getTime + 30000, 2, 2000),
        SessionTracker.ClipSession(1, ts(45).getTime, ts(45).getTime + 30000, 1, 1000),
        SessionTracker.ClipSession(2, ts(3).getTime, ts(3).getTime + 30000, 1, 1000)))
    } finally q.stop()
  }

  test("events older than the watermark neither crash timeout arming nor leak state") {
    // setTimeoutTimestamp is clamped to watermark+1 (Spark rejects a
    // timeout <= current watermark). In Spark 4.1 flatMapGroupsWithState
    // additionally FILTERS input rows older than the watermark before they
    // reach the state function, so a too-old event is dropped outright —
    // this test pins both: the query survives the sequence, and the late
    // key produces no session (dropped-late semantics, same as the
    // aggregation operators). The clamp remains as defense-in-depth for
    // the timeout re-arm path.
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SessEvt]
    val out = SessionTracker.sessions(
      in.toDF().withWatermark("event_time", "10 seconds"))
    val q = out.writeStream.format("memory").queryName("sess3")
      .outputMode("append").start()
    try {
      in.addData(e(9, 600)) // push watermark to 590s
      q.processAllAvailable()
      in.addData(e(3, 500)) // 90s older than the watermark -> dropped
      q.processAllAvailable()
      in.addData(e(9, 1200)); q.processAllAvailable()
      in.addData(e(9, 1800)); q.processAllAvailable()
      assert(q.exception.isEmpty)
      assert(spark.table("sess3").filter($"person_idx" === 3).isEmpty)
    } finally q.stop()
  }

  test("streaming sessions == declarative sessionsBatch (oracle surface parity)") {
    // deterministic workload: 6 people, bursts separated by >gap quiet
    val evts = for {
      p <- 1 to 6
      i <- 0 until 20
    } yield e(p, sec = (i / 5) * 100 + (i % 5) * (3 + p % 3), dur = 500 + i)
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SessEvt]
    val out = SessionTracker.sessions(
      in.toDF().withWatermark("event_time", "10 seconds"))
    val q = out.writeStream.format("memory").queryName("sessParity")
      .outputMode("append").start()
    try {
      evts.sortBy(_.event_time.getTime).grouped(35).foreach { bs =>
        in.addData(bs: _*); q.processAllAvailable()
      }
      in.addData(e(9999, 5000)); q.processAllAvailable()
      in.addData(e(9999, 10000)); q.processAllAvailable()
      val got = spark.table("sessParity").filter($"person_idx" < 9999)
        .as[SessionTracker.ClipSession].collect().toSeq
        .sortBy(s => (s.person_idx, s.session_start_ms))
      val want = SessionTracker.sessionsBatch(
        evts.toDF().withColumnRenamed("clip_id", "clip_id"))
        .as[SessionTracker.ClipSession].collect().toSeq
        .sortBy(s => (s.person_idx, s.session_start_ms))
      assert(want.size >= 12) // several sessions per person
      assert(got == want)
    } finally q.stop()
  }

  test("state survives across batches: session spanning two micro-batches") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SessEvt]
    val out = SessionTracker.sessions(
      in.toDF().withWatermark("event_time", "10 seconds"))
    val q = out.writeStream.format("memory").queryName("sess2")
      .outputMode("append").start()
    try {
      in.addData(e(5, 0), e(5, 10))
      q.processAllAvailable()
      in.addData(e(5, 20), e(5, 25)) // same session continues (gaps < 30s)
      q.processAllAvailable()
      in.addData(e(9, 600)); q.processAllAvailable()
      in.addData(e(9, 1200)); q.processAllAvailable()
      val rows = spark.table("sess2").filter($"person_idx" === 5)
        .as[SessionTracker.ClipSession].collect().toSeq
      assert(rows == Seq(
        SessionTracker.ClipSession(5, ts(0).getTime, ts(25).getTime + 30000, 4, 4000)))
    } finally q.stop()
  }
}
