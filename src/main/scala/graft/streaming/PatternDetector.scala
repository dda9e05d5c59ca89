package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sequential pattern detection (the CEP primitive): per key, emit a match
  * whenever an event satisfying predicate A is followed by an event
  * satisfying predicate B within `withinMs` of event time.
  *
  * This generalizes the reference's paginate-then-parse sequencing
  * (`/root/reference/scrape/scrape.go:378-445`: a page event triggers
  * expectation of a follow-up within bounded work) into a first-class
  * watermarked operator: open A-candidates live in keyed state (RocksDB),
  * are matched by later B events, and are evicted by event-time timeout
  * once the watermark passes their deadline — state is bounded by
  * `withinMs` x event rate per key, never by stream length.
  *
  * Pattern predicates are plan-time SQL expressions evaluated into boolean
  * columns upstream, so the stateful function itself stays generic.
  */
object PatternDetector extends Serializable {

  case class PatternMatch(
      key: String,
      a_id: String,
      a_time_ms: Long,
      b_id: String,
      b_time_ms: Long,
      gap_ms: Long)

  case class Evt(key: String, id: String, event_time: java.sql.Timestamp,
                 is_a: Boolean, is_b: Boolean)

  // public: Spark's generated state (de)serializers cannot touch private classes
  case class Open(aId: String, aMs: Long)
  case class St(open: List[Open])

  /** events: any DataFrame with (key, id, event_time, is_a, is_b) columns
    * — produce with `.withColumn("is_a", <predicate>)` etc. upstream.
    * Each B event matches EVERY open A within the window (then those As
    * close); an event may be both A and B (B-side evaluated first, so a
    * self-match is not emitted). */
  def detect(events: DataFrame, withinMs: Long): Dataset[PatternMatch] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(key: String, rows: Iterator[Evt],
               state: GroupState[St]): Iterator[PatternMatch] = {
      if (rows.isEmpty && state.hasTimedOut) {
        // watermark passed every open deadline we registered
        val wm = state.getCurrentWatermarkMs()
        val kept = state.getOption.map(_.open.filter(_.aMs + withinMs > wm))
          .getOrElse(Nil)
        if (kept.isEmpty) state.remove()
        else { state.update(St(kept)); armTimeout(state, kept, withinMs) }
        return Iterator.empty
      }
      val sorted = rows.toArray.sortBy(e => (e.event_time.getTime, e.id))
      var open = state.getOption.map(_.open).getOrElse(Nil)
      val out = scala.collection.mutable.ArrayBuffer.empty[PatternMatch]
      for (e <- sorted) {
        val ms = e.event_time.getTime
        if (e.is_b) {
          val (hit, stay) = open.partition(o => ms >= o.aMs && ms - o.aMs <= withinMs)
          hit.foreach(o => out += PatternMatch(key, o.aId, o.aMs, e.id, ms, ms - o.aMs))
          open = stay
        }
        if (e.is_a) open = Open(e.id, ms) :: open
        // drop hopeless candidates eagerly (no later event can match them)
        open = open.filter(o => o.aMs + withinMs >= ms)
      }
      if (open.isEmpty) state.remove()
      else { state.update(St(open)); armTimeout(state, open, withinMs) }
      out.iterator
    }

    events
      .select(col("key").cast("string").as("key"), col("id").cast("string").as("id"),
        col("event_time"), col("is_a"), col("is_b"))
      .as[Evt]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** The declarative BATCH twin of [[detect]]: A matches its FIRST
    * qualifying B (by event time, then id) within `withinMs`; a B may
    * close many As; an event that is both A and B never self-matches.
    * Same output schema as the streaming operator — parity is asserted in
    * PatternDetectorSpec, and this plan is the DuckDB-oracle surface
    * (query c12). Plan shape: one equi-join on key + a per-A window,
    * both shuffling on key only. */
  def detectBatch(events: DataFrame, withinMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events.select(col("key").cast("string").as("key"),
      col("id").cast("string").as("id"), col("event_time"),
      col("is_a"), col("is_b"))
    val a = ev.filter(col("is_a")).select(col("key"), col("id").as("a_id"),
      unix_millis(col("event_time")).as("a_time_ms"))
    val b = ev.filter(col("is_b")).select(col("key").as("b_key"),
      col("id").as("b_id"), unix_millis(col("event_time")).as("b_time_ms"))
    val w = Window.partitionBy(col("key"), col("a_id"))
      .orderBy(col("b_time_ms"), col("b_id"))
    a.join(b, col("key") === col("b_key") &&
        (col("b_time_ms") > col("a_time_ms") ||
          (col("b_time_ms") === col("a_time_ms") && col("b_id") > col("a_id"))) &&
        col("b_time_ms") <= col("a_time_ms") + withinMs)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("key"), col("a_id"), col("a_time_ms"),
        col("b_id"), col("b_time_ms"),
        (col("b_time_ms") - col("a_time_ms")).as("gap_ms"))
  }

  /** Re-arm eviction at the earliest open candidate's match deadline:
    * once the watermark passes aMs + withinMs, that A can never match. */
  private def armTimeout(state: GroupState[St], open: List[Open],
                         withinMs: Long): Unit = {
    val deadline = open.map(o => o.aMs + withinMs + 1).min
    val wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(math.max(deadline, wm + 1))
  }
}
