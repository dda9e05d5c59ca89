package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.fixtures.ClipGen
import graft.operators.Windows

/** Bounded soak (ROADMAP "long-run soak", sized for CI): a continuous
  * ProcessingTime stream fed slice-by-slice while running, an injected
  * graceful restart mid-stream, and the ops invariants checked from the
  * METRICS TABLE afterwards — watermark monotonically non-decreasing
  * across batches AND across the restart, no watermark-lag alarms at the
  * configured bound, and the final sink equal to the batch ground truth
  * over everything that ever arrived. */
class SoakSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ProcessingTime soak with live feeding + restart: converges, watermark healthy") {
    val staged = Files.createTempDirectory("soak-staged").toString
    TestSpark.writeTimeOrdered(ClipGen.clipsDf(spark, 240), staged, 12)
    val parquets = {
      val it = Files.walk(Paths.get(staged)).iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
      while (it.hasNext) {
        val p = it.next()
        if (p.toString.endsWith(".parquet")) buf += p
      }
      buf.sortBy(p => Files.getLastModifiedTime(p).toMillis)
    }
    assert(parquets.size == 12)

    val live = Files.createTempDirectory("soak-live").toString
    def reveal(p: java.nio.file.Path): Unit =
      Files.copy(p, Paths.get(live, p.getFileName.toString),
        StandardCopyOption.COPY_ATTRIBUTES)

    val expected = Windows.tumblingCounts(spark.read.parquet(staged))
      .orderBy("w_start_ms", "codec", "sr_hz").collect().map(_.toSeq).toSeq

    val tableDir = Files.createTempDirectory("soak-sink").toString
    val ckpt = Files.createTempDirectory("soak-ckpt").toString
    val metricsPath = Files.createTempDirectory("soak-metrics").resolve("m.jsonl").toString
    // eager GC: the soak's delta-count bound below measures the
    // maintenance policy, not the grace window
    val table = ClipTable(tableDir, Seq("w_start_ms", "codec", "sr_hz"),
      numBuckets = 2, mergeOnRead = true, gcGraceMs = 0L)
    def plan() = ClipStreamJob.tumblingCounts(
      ClipStreamJob.readClipStream(spark, live, maxFilesPerTrigger = 1))
    val listener = MetricsListener.attach(spark, metricsPath)

    /** Rows processed so far according to the metrics file (>= accounts
      * for replay of an uncommitted batch after restart). */
    def fedRows(): Long =
      if (!Files.exists(Paths.get(metricsPath))) 0L
      else {
        val it = Files.lines(Paths.get(metricsPath)).iterator()
        var sum = 0L
        while (it.hasNext) {
          val l = it.next()
          val k = "\"num_input_rows\":"
          val i = l.indexOf(k)
          if (i >= 0) {
            val rest = l.substring(i + k.length)
            sum += rest.takeWhile(c => c.isDigit).toLong
          }
        }
        sum
      }
    // incremental-compaction bound: sample the MOR delta count while the
    // stream runs; with maxDeltas=6 wired into runToTable the count must
    // never exceed maxDeltas + 1 (one new delta lands before the between-
    // batch compaction folds them)
    val soakMaxDeltas = 6
    var maxDeltasSeen = 0
    def sampleDeltas(): Unit = {
      val d = Paths.get(tableDir, "delta")
      if (Files.exists(d)) {
        val it = Files.list(d)
        try {
          var n = 0
          val i = it.iterator()
          while (i.hasNext) { if (i.next().getFileName.toString.startsWith("batch=")) n += 1 }
          maxDeltasSeen = math.max(maxDeltasSeen, n)
        } finally it.close()
      }
    }
    def awaitFed(n: Long, timeoutMs: Long = 120000): Unit = {
      val t0 = System.currentTimeMillis()
      while (fedRows() < n) {
        assert(System.currentTimeMillis() - t0 < timeoutMs,
          s"timed out waiting for $n rows, have ${fedRows()}")
        sampleDeltas()
        Thread.sleep(200)
      }
    }

    try {
      // phase 1: continuous trigger; slices land WHILE the query runs
      parquets.take(2).foreach(reveal)
      val q1 = ClipStreamJob.runToTable(plan(), table, ckpt,
        Trigger.ProcessingTime("200 milliseconds"), outputMode = "update",
        maxDeltas = soakMaxDeltas)
      parquets.slice(2, 7).foreach { p => reveal(p); Thread.sleep(300) }
      awaitFed(140) // 7 of 12 slices x 20 rows, drained
      // graceful stop mid-stream (restart injection)
      q1.stop(); q1.awaitTermination(60000)

      // down: more of the stream arrives
      parquets.slice(7, 9).foreach(reveal)

      // phase 2: restart from the checkpoint, keep feeding live
      val q2 = ClipStreamJob.runToTable(plan(), table, ckpt,
        Trigger.ProcessingTime("200 milliseconds"), outputMode = "update",
        maxDeltas = soakMaxDeltas)
      parquets.drop(9).foreach { p => reveal(p); Thread.sleep(300) }
      awaitFed(240) // everything drained (replay may push it past 240)
      q2.stop(); q2.awaitTermination(60000)

      // 1) exactly-once convergence over everything that ever arrived
      val got = table.read(spark)
        .select("w_start_ms", "codec", "sr_hz", "n_clips", "sum_dur_ms")
        .orderBy("w_start_ms", "codec", "sr_hz").collect().map(_.toSeq).toSeq
      assert(got == expected)

      // 2) ops invariants from the metrics table
      val m = MetricsListener.read(spark, metricsPath)
        .filter(col("watermark") =!= "")
      val wms = m.orderBy("timestamp")
        .select(unix_millis(to_timestamp(col("watermark"))))
        .collect().map(_.getLong(0)).toSeq
      assert(wms.size >= 6, s"soak too short: ${wms.size} watermarked batches")
      assert(wms.sliding(2).forall { case Seq(a, b) => b >= a },
        "watermark regressed across batches/restart")
      // 3) no watermark-lag alarms: watermark must track max event time
      //    within delay (30 s) + one slice span of slack
      val alarms = MetricsListener.watermarkLagAlarms(m, maxLagMs = 120000)
      assert(alarms.isEmpty, s"lag alarms: ${alarms.collect().mkString(",")}")
      // 4) incremental compaction kept the MOR reader bounded: the delta
      //    count never exceeded maxDeltas + 1 and at least one compaction
      //    actually folded (24 batches >> maxDeltas=6 forces it)
      sampleDeltas()
      assert(maxDeltasSeen <= soakMaxDeltas + 1,
        s"deltas unbounded: saw $maxDeltasSeen > ${soakMaxDeltas + 1}")
      val compactionRan = {
        val s = Files.list(Paths.get(tableDir))
        try {
          val it = s.iterator()
          var found = false
          while (it.hasNext && !found)
            found = it.next().getFileName.toString.startsWith("compacted-v")
          found
        } finally s.close()
      }
      assert(compactionRan, "no compaction ran during the soak")
    } finally spark.streams.removeListener(listener)
  }
}
