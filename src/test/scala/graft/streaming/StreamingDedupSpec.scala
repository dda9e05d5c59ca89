package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

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
}
