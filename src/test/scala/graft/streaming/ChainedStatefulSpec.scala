package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Chained stateful operators in ONE streaming query (Spark 3.4+ allows
  * stream-stream time-interval join followed by a windowed aggregation in
  * append mode): clips ⟕ updates -> tumbling counts by enrichment status.
  * This is the full CEP composition of the reference's details-join +
  * page-accumulation semantics. */
class ChainedStatefulSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(1704067200000L + sec * 1000)
  private def clip(id: String, sec: Long) =
    ClipEvt(id, "pcm16", 8000, 1000, s"<card><name>$id</name></card>", ts(sec))
  private def upd(id: String, sec: Long) =
    UpdEvt(id, s"<card><name>u-$id</name></card>", ts(sec))

  test("join -> window aggregation composes in one append-mode query") {
    implicit val ctx = spark.sqlContext
    val clips = MemoryStream[ClipEvt]
    val updates = MemoryStream[UpdEvt]
    val joined = ClipStreamJob.joinUpdates(clips.toDF(), updates.toDF(), "10 seconds")
    val agg = joined
      .groupBy(window(col("event_time"), "10 seconds"), col("updated"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("window.start")).as("w_start_ms"),
        col("updated"), col("n"))
    val q = agg.writeStream.format("memory").queryName("chained")
      .outputMode("append").start()
    try {
      // window [0,10): c1 (updated), c2 (not); window [10,20): c3 (not)
      clips.addData(clip("c1", 1), clip("c2", 5), clip("c3", 12))
      updates.addData(upd("c1", 8))
      q.processAllAvailable()
      clips.addData(clip("s1", 600)); updates.addData(upd("su1", 600))
      q.processAllAvailable()
      clips.addData(clip("s2", 1200)); updates.addData(upd("su2", 1200))
      q.processAllAvailable()
      clips.addData(clip("s3", 2400)); updates.addData(upd("su3", 2400))
      q.processAllAvailable()

      val got = spark.table("chained")
        .filter(col("w_start_ms") < 1704067200000L + 60000L)
        .orderBy("w_start_ms", "updated")
        .as[(Long, Boolean, Long)].collect().toSeq
      assert(got == Seq(
        (1704067200000L, false, 1L),
        (1704067200000L, true, 1L),
        (1704067210000L, false, 1L)))
    } finally q.stop()
  }
}
