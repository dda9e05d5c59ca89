package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Per-batch metrics table (K8/A3 re-expression: the reference's task
  * manifest `{Requests, Responses, Took}`, `/root/reference/scrape/
  * scrape.go:257-268`, becomes a queryable metrics table): one JSONL row
  * per micro-batch with rows, rates, state-store size and watermark lag.
  * Readable back as a DataFrame via [[MetricsListener.read]].
  */
final class MetricsListener(path: String) extends StreamingQueryListener {
  Files.createDirectories(Paths.get(path).getParent)

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: QueryProgressEvent): Unit = synchronized {
    val p = e.progress
    val stateRows = p.stateOperators.map(_.numRowsTotal).sum
    val stateBytes = p.stateOperators.map(_.memoryUsedBytes).sum
    val watermark = Option(p.eventTime.get("watermark")).getOrElse("")
    val eventMax = Option(p.eventTime.get("max")).getOrElse("")
    val durations = {
      val it = p.durationMs.entrySet().iterator()
      val sb = new StringBuilder("{")
      var first = true
      while (it.hasNext) {
        val e = it.next()
        if (!first) sb.append(',')
        sb.append('"').append(e.getKey).append("\":").append(e.getValue)
        first = false
      }
      sb.append('}').toString
    }
    val line =
      s"""{"query_id":"${p.id}","batch_id":${p.batchId},""" +
        s""""timestamp":"${p.timestamp}","num_input_rows":${p.numInputRows},""" +
        s""""input_rows_per_sec":${safe(p.inputRowsPerSecond)},""" +
        s""""processed_rows_per_sec":${safe(p.processedRowsPerSecond)},""" +
        s""""state_rows":$stateRows,"state_bytes":$stateBytes,""" +
        s""""durations_ms":$durations,""" +
        s""""watermark":"$watermark","event_time_max":"$eventMax"}""" + "\n"
    Files.write(Paths.get(path), line.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  private def safe(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" else d.toString
}

object MetricsListener {
  def attach(spark: SparkSession, path: String): MetricsListener = {
    val l = new MetricsListener(path)
    spark.streams.addListener(l)
    l
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Watermark-lag alarms: batches whose event-time watermark trails the
    * maximum event time seen SO FAR by more than `maxLagMs` while input
    * keeps flowing — the ops signal that state eviction (and therefore
    * state size) is falling behind the stream. Lag is measured in event
    * time (not wall clock), so it is meaningful for replayed/synthetic
    * streams too. Returns the offending batches. */
  def watermarkLagAlarms(metrics: DataFrame, maxLagMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("query_id")).orderBy(col("batch_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    metrics
      .filter(col("watermark") =!= "" && col("event_time_max") =!= "")
      // a 1970 epoch watermark is Spark's "not yet initialized" bootstrap
      // value on a query's first batch, not a lagging watermark
      .filter(unix_millis(to_timestamp(col("watermark"))) > 0)
      .withColumn("max_event_ms",
        max(unix_millis(to_timestamp(col("event_time_max")))).over(w))
      .withColumn("lag_ms",
        col("max_event_ms") - unix_millis(to_timestamp(col("watermark"))))
      .filter(col("num_input_rows") > 0 && col("lag_ms") > maxLagMs)
      .select("batch_id", "watermark", "event_time_max", "lag_ms", "state_rows")
  }
}
