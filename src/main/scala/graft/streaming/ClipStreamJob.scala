package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.Windows

/** The streaming CEP engine: clip stream -> decode/extract -> watermarked
  * event-time windows -> exactly-once MERGE sink (ClipTable).
  *
  * Re-expresses the reference pipeline fetch->paginate->divide->parse->save
  * (`/root/reference/scrape/scrape.go:306-333`) as a Structured Streaming
  * DAG: the file source replaces fetch (S1/S5; `maxFilesPerTrigger` is the
  * throttle analog of FETCH_DELAY), windows replace the pagination loop
  * (T2), the stateful stream-stream join replaces details-following (J1),
  * and ClipTable.merge replaces the idempotent Mongo upsert (K1/T9).
  */
object ClipStreamJob {

  /** input_hint schema + generated lineage columns. */
  val clipSchema: StructType = StructType(Seq(
    StructField("clip_id", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("sr_hz", IntegerType, nullable = false),
    StructField("dur_ms", IntegerType, nullable = false),
    StructField("codec", StringType, nullable = false),
    StructField("transcript", StringType, nullable = true),
    StructField("person_idx", IntegerType, nullable = false),
    StructField("event_time", TimestampType, nullable = false)))

  val updateSchema: StructType = StructType(Seq(
    StructField("clip_id", StringType, nullable = false),
    StructField("transcript", StringType, nullable = true),
    StructField("update_time", TimestampType, nullable = false)))

  /** Read the clips table as a stream (file source over the Iceberg-style
    * layout). `maxFilesPerTrigger` bounds micro-batch size — the rate
    * throttle (S5). */
  def readClipStream(spark: SparkSession, path: String,
                     maxFilesPerTrigger: Int = 8): DataFrame =
    spark.readStream
      .schema(clipSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)
      .drop("p_codec", "p_bucket")

  def readUpdateStream(spark: SparkSession, path: String,
                       maxFilesPerTrigger: Int = 8): DataFrame =
    spark.readStream
      .schema(updateSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  /** Watermarked tumbling-window aggregation — the same logical plan as the
    * batch query (Windows.tumblingCounts), plus the watermark. */
  def tumblingCounts(clips: DataFrame, watermark: String = "30 seconds"): DataFrame =
    Windows.tumblingCounts(clips.withWatermark("event_time", watermark))

  def sessionCounts(clips: DataFrame, watermark: String = "30 seconds"): DataFrame =
    Windows.sessionCounts(clips.withWatermark("event_time", watermark))

  /** CONTENT-keyed streaming dedup: the same audio arriving again under a
    * different clip_id and/or codec (a transcoded re-upload) is dropped on
    * ingest by its acoustic fingerprint via `dropDuplicatesWithinWatermark`.
    * The fingerprint reduction runs in the scan stage, so dedup STATE
    * holds only the tiny key tuple (never bytes) and is evicted by the
    * watermark — bounded state at any stream length. First arrival wins
    * (id-level replay dedup is the sink's job; this is the content level
    * above it).
    *
    * KEY CHOICE — a wrong drop here is permanent data loss, so the key
    * must err toward KEEPING: (sr, n_samples, f1) alone organically
    * collides at corpus scale (two distinct clips of equal length and
    * dominant tone), and unlike the batch detector there is no verify
    * stage to reject the collision. The key therefore includes the second
    * tone as a COARSE bucket (width `f2BucketHz`): a G.711 transcode
    * jitters f2 by only a few Hz, so true re-uploads still collapse
    * (except the ~jitter/width fraction straddling a bucket edge, which
    * are KEPT — the benign direction, caught downstream by the batch
    * near-dup), while organic collisions must now also match f2 within
    * the bucket. For guaranteed-lossless dedup use `Dedup.audioNearDup*`,
    * whose exact correlation verify has no false drops at any scale. */
  /** `shiftRobust`: additionally drop re-uploads whose leading samples
    * were TRIMMED (the c15 attack, on ingest). Streaming state can hold
    * only ONE key per row (no adjacent-bucket emission like the batch
    * detector — exploding copies would change stream cardinality), so the
    * length key coarsens to an `nBucket`-wide bucket: a trim <= maxTrim
    * maps to the same bucket unless the length straddles a bucket edge
    * (~trim/nBucket of clips ~= 4% at the defaults) — those are KEPT, the
    * benign direction, and collapse later in the batch `audioNearDupShift`
    * pass which has the exact aligned-correlation verify.
    *
    * The coarse bucket also WIDENS the irreversible false-DROP surface
    * (ADVICE r4): two DISTINCT clips sharing (sr_hz, f1, f2b) collide on
    * the length key whenever their lengths fall in the same `nBucket`-wide
    * bucket (vs exact-length equality when shiftRobust=false) — a 4096x
    * larger organic-collision window, and a streaming drop has no verify
    * stage to reject it. Turn shiftRobust on only when trimmed re-uploads
    * are an actual ingest threat; for guaranteed-lossless dedup run the
    * batch detectors instead (exact correlation verify, no false drops).
    *
    * CHECKPOINT COMPATIBILITY: the four key columns (sr_hz, nk, f1, f2b)
    * ARE the dropDuplicatesWithinWatermark state schema — renaming any of
    * them (r4 renamed n_samples -> nk when shiftRobust landed), changing
    * their types, or toggling shiftRobust on an existing checkpoint fails
    * the restart with a state-schema mismatch. Restarting across such a
    * change needs a fresh checkpoint dir (the sink's id-level MERGE
    * absorbs the reprocessing). */
  def audioDedupStream(clips: DataFrame, watermark: String = "30 seconds",
                       f2BucketHz: Int = 64, shiftRobust: Boolean = false,
                       nBucket: Int = 4096): DataFrame = {
    val nKey =
      if (shiftRobust) (col("n_samples") / nBucket).cast("int")
      else col("n_samples").cast("int")
    clips
      .withColumn("n_samples",
        graft.functions.GraftFunctions.pcm_sample_count(col("bytes"), col("codec")))
      .withColumn("fp", graft.functions.GraftFunctions.pcm_tone_pair(
        col("bytes"), col("codec"), col("sr_hz")))
      .withColumn("f1", element_at(col("fp"), 1))
      .withColumn("f2b", (element_at(col("fp"), 2) / f2BucketHz).cast("int"))
      .withColumn("nk", nKey)
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("sr_hz", "nk", "f1", "f2b")
      .drop("fp", "n_samples", "f1", "f2b", "nk")
  }

  /** NORMALIZE-ON-INGEST: every clip leaves this stage as pcm16 at
    * `targetHz` (mixed-rate corpus -> one model rate, the c17 operation
    * as a stream stage). The polyphase windowed-sinc kernel
    * (`pcm_resample`) runs in the scan stage like every codec expression
    * — a narrow map, no state, no shuffle; already-normalized clips
    * short-circuit inside the kernel (sr == target re-encodes only).
    * dur_ms is unchanged (resampling preserves duration); sr_hz and
    * codec are rewritten to the post-condition so every downstream
    * consumer (windows keyed on (codec, sr_hz), dedup fingerprints, the
    * sink key) sees the normalized view. */
  def normalizeRate(clips: DataFrame, targetHz: Int = 16000): DataFrame =
    clips
      .withColumn("bytes", graft.functions.GraftFunctions.pcm_resample(
        col("bytes"), col("codec"), col("sr_hz"), lit(targetHz)))
      .withColumn("sr_hz", lit(targetHz))
      .withColumn("codec", lit("pcm16"))

  /** CONTAINER ingest: strip mono WAV containers at the door — rows whose
    * bytes are WAV files (PCM / G.711 format tags) come out as raw codec
    * rows with `codec` / `sr_hz` rewritten from the CONTAINER header, the
    * exact input_hint shape every downstream stage expects; rows that are
    * not unwrappable WAVs pass through untouched (already-raw payloads).
    * A stateless narrow map (wav_unwrap runs in the scan stage), so
    * stream == batch by construction — StreamingParitySpec proves it by
    * wrapping the whole fixture and comparing windows bit-for-bit. */
  def ingestWav(clips: DataFrame): DataFrame = {
    val w = graft.functions.GraftFunctions.wav_unwrap(col("bytes"))
    clips
      .withColumn("_w", w)
      .withColumn("bytes", when(col("_w").isNotNull, col("_w.payload"))
        .otherwise(col("bytes")))
      .withColumn("codec", when(col("_w").isNotNull, col("_w.codec"))
        .otherwise(col("codec")))
      .withColumn("sr_hz", when(col("_w").isNotNull, col("_w.sr_hz"))
        .otherwise(col("sr_hz")))
      .drop("_w")
  }

  /** SEGMENT-ON-INGEST: explode each clip into its voiced spans (the c18
    * VAD operator as a stream stage — silence stripping at the door, so
    * nothing downstream pays for silent audio). Stateless narrow map +
    * generate: `pcm_segments` runs in the scan stage like every codec
    * expression, explode emits one row per voiced span — no state, no
    * shuffle, watermark-agnostic, so stream == batch by construction
    * (StreamingParitySpec pins it). Downstream key: (clip_id,
    * seg_start_ms). */
  def segmentSpans(clips: DataFrame, frameMs: Int = 50,
                   rmsThreshold: Double = 0.03): DataFrame =
    clips.select(col("clip_id"), col("codec"), col("sr_hz"), col("event_time"),
        explode(graft.functions.GraftFunctions.pcm_segments(
          col("bytes"), col("codec"), col("sr_hz"), frameMs, rmsThreshold))
          .as("seg"))
      .select(col("clip_id"), col("codec"), col("sr_hz"), col("event_time"),
        col("seg.seg_start_ms"), col("seg.seg_end_ms"))

  /** Stateful stream-stream LEFT OUTER join of the clip stream with the
    * late transcript-update stream (J1 re-expression): equi-join on
    * clip_id, time-bounded so state can be evicted by the watermark.
    * Updates arrive a bounded delay after the clip (generator: +15 s). */
  def joinUpdates(clips: DataFrame, updates: DataFrame,
                  watermark: String = "30 seconds"): DataFrame = {
    val u = updates
      .withColumnRenamed("clip_id", "u_clip_id")
      .withColumnRenamed("transcript", "u_transcript")
      .withWatermark("update_time", watermark)
    clips.withWatermark("event_time", watermark)
      .join(u,
        expr("""clip_id = u_clip_id AND
                update_time >= event_time AND
                update_time <= event_time + interval 60 seconds"""),
        "leftOuter")
      .select(col("clip_id"), col("codec"), col("sr_hz"), col("event_time"),
        coalesce(col("u_transcript"), col("transcript")).as("transcript"),
        col("u_transcript").isNotNull.as("updated"))
  }

  /** Run any streaming DataFrame into an exactly-once ClipTable MERGE with
    * checkpoint-resume. Returns the started query.
    *
    * Incremental compaction runs between micro-batches once more than
    * `maxDeltas` MOR deltas accumulate, bounding the reader's latest-wins
    * window on a long-running stream (the Iceberg `rewrite_data_files`
    * maintenance analog). Replay-safe: a batch replayed after its delta
    * was folded re-writes the same rows, and the latest-batch-wins reader
    * resolves base-vs-delta copies of one batch to identical data. */
  /** EXACT-VERIFY incremental dedup stream: each micro-batch is checked
    * against everything already ingested via the decode-once fingerprint
    * discipline ([[graft.operators.Dedup.audioNearDupIncremental]] — the
    * sink table carries (sr_hz, n_samples, f1, f2) columns written at
    * ingest, so the corpus is never re-decoded), and batch rows whose
    * audio near-duplicates an existing clip (trim/transcode robust, exact
    * aligned-correlation verified) are DROPPED before the exactly-once
    * MERGE. Contrast [[audioDedupStream]]: that stage is fingerprint-
    * EQUALITY in bounded watermark state (cheap, first line of defense);
    * this one is the full candidates-plus-verify semantics with unbounded
    * lookback, priced like a real pipeline would run it — per batch,
    * O(delta) DSP + a fingerprint-table join + candidate-only byte reads.
    *
    * Replay-safe: a replayed batch re-checks against the table, its
    * survivors re-merge idempotently (same keys, same batch id), and
    * rows it already merged are NOT self-matched (the delta's ids are
    * excluded from the corpus side for that batch). */
  def runDedupedToTable(df: DataFrame, table: ClipTable, checkpointDir: String,
                        trigger: Trigger = Trigger.AvailableNow(),
                        minCorr: Double = 0.8): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val spark = batch0.sparkSession
        // two references below (dedup probe + merge): persist so the
        // stateful upstream executes once per batch
        val batch = batch0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val existing = table.read(spark)
          val survivors =
            if (existing.isEmpty) batch
            else {
              val deltaIds = batch.select(col("clip_id"))
              // replay guard: rows of THIS batch already in the table
              // must not self-match — exclude them from the corpus side
              val corpus = existing.join(broadcast(deltaIds), Seq("clip_id"),
                "left_anti")
              val fp = corpus.select(col("clip_id").as("id"), col("sr_hz").as("sr"),
                col("n_samples").as("n"), col("f1"), col("f2"))
              val pairs = graft.operators.Dedup.audioNearDupIncremental(
                fp, corpus, batch, minCorr = minCorr)
              // FIRST-ARRIVAL-WINS drop rule: the corpus side never drops
              // (it was first); a corpus-batch pair drops its batch end,
              // a batch-batch pair drops its larger id (ids normalized
              // id_a < id_b, so: drop id_b when both are batch rows, else
              // drop whichever end is the batch row).
              val aInB = deltaIds.withColumnRenamed("clip_id", "id_a")
                .withColumn("_a_in", lit(true))
              val bInB = deltaIds.withColumnRenamed("clip_id", "id_b")
                .withColumn("_b_in", lit(true))
              val drops = pairs
                .join(broadcast(aInB), Seq("id_a"), "left")
                .join(broadcast(bInB), Seq("id_b"), "left")
                .select(when(col("_a_in").isNotNull && col("_b_in").isNotNull,
                    col("id_b"))
                  .when(col("_a_in").isNotNull, col("id_a"))
                  .otherwise(col("id_b")).as("clip_id"))
                .distinct()
              batch.join(broadcast(drops), Seq("clip_id"), "left_anti")
            }
          val withFp = survivors
            .withColumn("n_samples", graft.functions.GraftFunctions
              .pcm_sample_count(col("bytes"), col("codec")))
            .withColumn("tones", graft.functions.GraftFunctions
              .pcm_tone_pair(col("bytes"), col("codec"), col("sr_hz")))
            .withColumn("f1", element_at(col("tones"), 1))
            .withColumn("f2", element_at(col("tones"), 2))
            .drop("tones")
          table.merge(withFp, batchId)
        } finally batch.unpersist()
        ()
      }
      .start()

  def runToTable(df: DataFrame, table: ClipTable, checkpointDir: String,
                 trigger: Trigger = Trigger.AvailableNow(),
                 outputMode: String = "append",
                 maxDeltas: Int = 16): StreamingQuery =
    df.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        table.merge(batch, batchId)
        table.compactIfNeeded(batch.sparkSession, maxDeltas)
        ()
      }
      .start()

  /** Outcome of a [[supervise]]d run: how it ended plus the restart
    * trail (one classified entry per failed attempt). */
  final case class SuperviseReport(completed: Boolean, attempts: Int,
      failures: Seq[(Errors.ErrorClass, String)])

  /** SUPERVISED streaming run — the consumer of the error taxonomy (the
    * reference classifies fetch errors to decide retry-vs-fail;
    * `errs/errors.go` + the scraper's retry loop): start the query via
    * `startQuery`, await termination, and on failure classify the live
    * StreamingQueryException through [[Errors.classify]] — RESTART (same
    * checkpoint => exactly-once resume, the CrashKillSpec contract) while
    * the class is retryable and attempts remain; rethrow terminal
    * classes immediately (an InvalidSpec retried forever is the real
    * operational bug this exists to prevent). The restart trail is
    * returned for the metrics/error manifest. */
  def supervise(startQuery: () => StreamingQuery,
                maxRestarts: Int = 3): SuperviseReport = {
    val failures = scala.collection.mutable.ArrayBuffer[(Errors.ErrorClass, String)]()
    var attempts = 0
    while (attempts <= maxRestarts) {
      attempts += 1
      val q = startQuery()
      try {
        q.awaitTermination()
        return SuperviseReport(completed = true, attempts, failures.toSeq)
      } catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException =>
          val cls = Errors.classify(e)
          failures += ((cls, Option(e.getMessage).getOrElse("")))
          if (!cls.retryable || attempts > maxRestarts) throw e
      }
    }
    SuperviseReport(completed = false, attempts, failures.toSeq)
  }
}
