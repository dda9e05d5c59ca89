package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.GraftFunctions
import graft.operators.Extraction
import graft.streaming.{ClipStreamJob, ClipTable, MetricsListener}

/** One-off diagnostics: run the bench streaming pipeline once at a given
  * parallelism and dump per-batch duration breakdowns. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("8").toInt
    val clipsPath = "/root/repo/data/clips/sf0.1/clips"
    val spark = GraftSession.create(s"local[$cpus]", 32, "stream-probe")
    val metrics = Files.createTempDirectory("probe").resolve("m.jsonl").toString
    MetricsListener.attach(spark, metrics)

    def pipeline(clips: org.apache.spark.sql.DataFrame) = {
      val decoded = clips
        .withColumn("bands", GraftFunctions.pcm_band_energies(col("bytes"), col("codec"), col("sr_hz"), 16))
        .withColumn("rms", GraftFunctions.pcm_rms(col("bytes"), col("codec")))
        .withColumn("n_samples", GraftFunctions.pcm_sample_count(col("bytes"), col("codec")))
        .drop("bytes")
      val extracted = Extraction(graft.queries.ClipQueries.cardsSpec)(decoded)
      extracted
        .withWatermark("event_time", "15 minutes")
        .groupBy(window(col("event_time"), "10 seconds"), col("codec"), col("sr_hz"))
        .agg(count(lit(1)).as("n_clips"), avg(col("rms")).as("avg_rms"))
        .select(unix_millis(col("window.start")).as("w_start_ms"),
          col("codec"), col("sr_hz"), col("n_clips"), col("avg_rms"))
    }

    val sink = Files.createTempDirectory("probe-sink").toString
    val ckpt = Files.createTempDirectory("probe-ckpt").toString
    val table = ClipTable(sink, Seq("w_start_ms", "codec", "sr_hz"), numBuckets = 4)
    val clips = ClipStreamJob.readClipStream(spark, clipsPath, 96)
    val t0 = System.nanoTime()
    val q = ClipStreamJob.runToTable(pipeline(clips), table, ckpt,
      Trigger.AvailableNow(), outputMode = "update")
    q.awaitTermination(1800000)
    println(f"[probe] cpus=$cpus total wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    Files.readAllLines(java.nio.file.Paths.get(metrics)).forEach(l => println(s"[probe] $l"))
    spark.stop()
  }
}
