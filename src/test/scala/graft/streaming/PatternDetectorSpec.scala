package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

case class PEvt(key: String, id: String, event_time: Timestamp,
                is_a: Boolean, is_b: Boolean)

/** Sequential CEP pattern: A followed by B within T, per key, with
  * watermark-bounded state. */
class PatternDetectorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(1704067200000L + sec * 1000)
  private def a(k: String, id: String, sec: Long) = PEvt(k, id, ts(sec), true, false)
  private def b(k: String, id: String, sec: Long) = PEvt(k, id, ts(sec), false, true)
  private def n(k: String, id: String, sec: Long) = PEvt(k, id, ts(sec), false, false)

  private def run(name: String)(feed: (MemoryStream[PEvt], () => Unit) => Unit): Seq[PatternDetector.PatternMatch] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[PEvt]
    val out = PatternDetector.detect(
      in.toDF().withWatermark("event_time", "10 seconds"), withinMs = 30000)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      feed(in, () => q.processAllAvailable())
      q.processAllAvailable()
      in.addData(n("zz", "s1", 600)); q.processAllAvailable()
      in.addData(n("zz", "s2", 1200)); q.processAllAvailable()
      spark.table(name).as[PatternDetector.PatternMatch]
        .collect().toSeq.sortBy(m => (m.key, m.a_id, m.b_id))
    } finally q.stop()
  }

  test("A then B within window matches; outside window does not") {
    val got = run("pat1") { (in, _) =>
      in.addData(a("k1", "a1", 0), b("k1", "b1", 20),   // match (20s gap)
        a("k2", "a2", 0), b("k2", "b2", 45),            // no match (45s > 30s)
        a("k3", "a3", 10))                              // never gets a B
    }
    assert(got.map(m => (m.key, m.a_id, m.b_id, m.gap_ms)) ==
      Seq(("k1", "a1", "b1", 20000L)))
  }

  test("one B closes every open A in window; sequencing across batches") {
    val got = run("pat2") { (in, proc) =>
      in.addData(a("k", "a1", 0), a("k", "a2", 5)); proc()
      // second batch: B arrives later, state carried across batches
      in.addData(b("k", "b1", 25)); proc()
      // a2 closed by b1; later B has nothing left to match
      in.addData(b("k", "b2", 28)); proc()
    }
    assert(got.map(m => (m.a_id, m.b_id)) == Seq(("a1", "b1"), ("a2", "b1")))
  }

  test("B before any A does not match; A evicted after watermark deadline") {
    val got = run("pat3") { (in, proc) =>
      in.addData(b("k", "b0", 0), a("k", "a1", 5)); proc()
      // watermark pushed far past a1's deadline before its B arrives
      in.addData(n("k", "push", 300)); proc()
      in.addData(b("k", "late-b", 20)); proc() // late: a1 already evicted
    }
    assert(got.isEmpty)
  }

  test("streaming detect == declarative detectBatch (oracle surface parity)") {
    // deterministic mixed workload: 5 keys x 24 events, every third an A,
    // every fourth a B (some events both), strictly increasing times
    val evts = for {
      k <- 0 until 5
      i <- 0 until 24
    } yield PEvt(s"k$k", f"e$k%d-$i%02d", ts(i * 7 + k),
      is_a = i % 3 == 0, is_b = i % 4 == 0)
    val batches = evts.sortBy(_.event_time.getTime).grouped(40).toSeq
    val got = run("parity") { (in, proc) =>
      batches.foreach { bs => in.addData(bs: _*); proc() }
    }.map(m => (m.key, m.a_id, m.a_time_ms, m.b_id, m.b_time_ms, m.gap_ms))
    val want = PatternDetector.detectBatch(evts.toDF(), withinMs = 30000)
      .as[(String, String, Long, String, Long, Long)].collect().toSeq
      .sortBy(t => (t._1, t._2, t._4))
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("pattern over the clip domain: alaw clip followed by 44.1kHz clip in 30s") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ClipEvt]
    val events = in.toDF()
      .withWatermark("event_time", "10 seconds")
      .select(col("codec").as("key"), col("clip_id").as("id"), col("event_time"),
        (col("codec") === "alaw").as("is_a"), (col("sr_hz") === 44100).as("is_b"))
    // predicates keyed by codec make a contrived but end-to-end CEP query
    val q = PatternDetector.detect(events, 30000)
      .writeStream.format("memory").queryName("pat4").outputMode("append").start()
    try {
      in.addData(
        ClipEvt("c1", "alaw", 8000, 500, "<card/>", ts(0)),
        ClipEvt("c2", "alaw", 44100, 500, "<card/>", ts(10)))
      q.processAllAvailable()
      in.addData(ClipEvt("s", "pcm16", 8000, 1, "<card/>", ts(600)))
      q.processAllAvailable()
      in.addData(ClipEvt("s2", "pcm16", 8000, 1, "<card/>", ts(1200)))
      q.processAllAvailable()
      val got = spark.table("pat4").select("a_id", "b_id").as[(String, String)].collect()
      assert(got.toSeq == Seq(("c1", "c2")))
    } finally q.stop()
  }
}
