package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed session state via flatMapGroupsWithState — the reference's
  * per-user read-modify-write session state (cookies keyed userToken+host,
  * `/root/reference/fetch/service.go:52-115`) with TTL-style expiry
  * (`/root/reference/storage/diskv.go:49-81`), re-expressed: per-speaker
  * (person_idx) clip sessions that close after a 30 s event-time gap.
  *
  * Unlike the built-in `session_window` aggregation this keeps ARBITRARY
  * state per key (running counters, open-session bounds) and emits on
  * event-time timeout — the general CEP primitive. State lives in the
  * RocksDB store; eviction is watermark-driven (EventTimeTimeout), which is
  * the Spark analog of the reference's ITEM_EXPIRE_IN mtime check.
  */
object SessionTracker {

  val GapMs: Long = 30000L

  case class ClipSession(
      person_idx: Int,
      session_start_ms: Long,
      session_end_ms: Long,
      n_clips: Long,
      total_dur_ms: Long)

  case class OpenSession(startMs: Long, lastMs: Long, n: Long, dur: Long)

  /** Keeps the watermarked timestamp column itself so the event-time
    * watermark tag survives into the stateful operator. (Public: Spark's
    * generated deserializer cannot access a private class.) */
  case class In(person_idx: Int, event_time: java.sql.Timestamp, dur_ms: Int)

  /** events per key per batch -> closed sessions now + open session kept in
    * state; timeout (watermark past last+gap) closes the remainder. */
  private def update(key: Int, rows: Iterator[In],
                     state: GroupState[OpenSession]): Iterator[ClipSession] = {
    def close(s: OpenSession) =
      ClipSession(key, s.startMs, s.lastMs + GapMs, s.n, s.dur)

    if (rows.isEmpty && state.hasTimedOut) {
      val out = state.getOption.map(close).toSeq
      state.remove()
      return out.iterator
    }
    val sorted = rows.map(r => (r.event_time.getTime, r.dur_ms)).toArray.sorted
    var open = state.getOption.orNull
    val closed = scala.collection.mutable.ArrayBuffer.empty[ClipSession]
    for ((ms, dur) <- sorted) {
      open match {
        case null =>
          open = OpenSession(ms, ms, 1, dur)
        case s if ms - s.lastMs >= GapMs =>
          closed += close(s)
          open = OpenSession(ms, ms, 1, dur)
        case s =>
          open = OpenSession(s.startMs, math.max(s.lastMs, ms),
            s.n + 1, s.dur + dur)
      }
    }
    if (open != null) {
      state.update(open)
      // Clamp to watermark+1: Spark rejects a timeout <= current watermark,
      // and a batch whose newest event per key is older than watermark-gap
      // (allowed by the lateness bound) would otherwise crash the query.
      state.setTimeoutTimestamp(
        math.max(open.lastMs + GapMs, state.getCurrentWatermarkMs() + 1))
    }
    closed.iterator
  }

  /** The declarative BATCH twin of [[sessions]] — the classic gap-islands
    * plan (lag + cumulative session counter), shuffling on person_idx
    * only. Same output schema as the streaming operator; stream==batch
    * parity is asserted in SessionTrackerSpec and this plan is the
    * DuckDB-oracle surface (query c13). */
  def sessionsBatch(clips: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("person_idx")).orderBy(col("ms"))
    val ws = Window.partitionBy(col("person_idx"), col("sid"))
    clips
      .select(col("person_idx").cast("int").as("person_idx"),
        unix_millis(col("event_time")).as("ms"),
        col("dur_ms").cast("long").as("dur"))
      .withColumn("new_session",
        when(col("ms") - lag(col("ms"), 1).over(w) >= GapMs, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("person_idx"),
        min(col("ms")).over(ws).as("session_start_ms"),
        (max(col("ms")).over(ws) + GapMs).as("session_end_ms"),
        count(lit(1)).over(ws).as("n_clips"),
        sum(col("dur")).over(ws).as("total_dur_ms"))
      .distinct()
  }

  /** clips (clip_id, person_idx, dur_ms, event_time) -> closed sessions.
    * Works on a stream (watermark required upstream for timeouts). */
  def sessions(clips: DataFrame): Dataset[ClipSession] = {
    val spark = clips.sparkSession
    import spark.implicits._
    clips
      .select(col("person_idx").cast("int").as("person_idx"),
        col("event_time"),
        col("dur_ms").cast("int").as("dur_ms"))
      .as[In]
      .groupByKey(_.person_idx)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
