package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.fixtures.ClipGen
import graft.operators.Windows

/** Graceful stop + restart (the operational resume path, distinct from the
  * crash-replay tests): the query is stopped between micro-batches, MORE
  * INPUT ARRIVES while it is down, and the restarted query picks up from
  * the checkpoint — final sink equals the batch ground truth over all
  * input that ever arrived. */
class StopResumeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("stop, receive more data while down, restart, converge") {
    // stage the full input as 6 time-ordered slice files, reveal 3 first
    val staged = Files.createTempDirectory("staged").toString
    graft.TestSpark.writeTimeOrdered(ClipGen.clipsDf(spark, 180), staged, 6)
    val sliceFiles = Files.walk(Paths.get(staged)).iterator()
    val parquets = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
      while (sliceFiles.hasNext) {
        val p = sliceFiles.next()
        if (p.toString.endsWith(".parquet")) buf += p
      }
      buf.sortBy(p => Files.getLastModifiedTime(p).toMillis)
    }
    assert(parquets.size == 6)

    val live = Files.createTempDirectory("live").toString
    def reveal(p: java.nio.file.Path): Unit =
      Files.copy(p, Paths.get(live, p.getFileName.toString),
        StandardCopyOption.COPY_ATTRIBUTES)

    val expected = Windows.tumblingCounts(spark.read.parquet(staged))
      .orderBy("w_start_ms", "codec", "sr_hz").collect().map(_.toSeq).toSeq

    val tableDir = Files.createTempDirectory("sink").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    val table = ClipTable(tableDir, Seq("w_start_ms", "codec", "sr_hz"),
      numBuckets = 2, mergeOnRead = true)
    def plan() = ClipStreamJob.tumblingCounts(
      ClipStreamJob.readClipStream(spark, live, maxFilesPerTrigger = 1))

    // phase 1: first half of the stream, then graceful stop
    parquets.take(3).foreach(reveal)
    val q1 = ClipStreamJob.runToTable(plan(), table, ckpt,
      Trigger.AvailableNow(), outputMode = "update")
    q1.awaitTermination(120000)

    // while "down": the rest of the stream lands
    parquets.drop(3).foreach(reveal)

    // phase 2: restart from the same checkpoint
    val q2 = ClipStreamJob.runToTable(plan(), table, ckpt,
      Trigger.AvailableNow(), outputMode = "update")
    q2.awaitTermination(120000)

    val got = table.read(spark)
      .select("w_start_ms", "codec", "sr_hz", "n_clips", "sum_dur_ms")
      .orderBy("w_start_ms", "codec", "sr_hz").collect().map(_.toSeq).toSeq
    assert(got == expected)
  }
}
