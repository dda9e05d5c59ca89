package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.{ImageGen, MixedImageGen, MixedVideoGen, NearDupImageGen, VideoGen}
import graft.functions.GraftFunctions._

/** Image-modality query surface: REAL uncompressed netpbm payloads
  * (graft.image.ImageCodec), generated deterministically per scale factor
  * with id-arithmetic planted ground truth — the DuckDB oracle reads the
  * SAME parquet and states the planting rule, so recall AND precision of
  * the byte-derived answer are both exact-checked (the c16 discipline on
  * the image column). */
object ImageQueries {

  /** Driver verifies at sf0.01 (default); Verify derives the actual scale
    * from its sfDir so oracle and engine always read the same table. The
    * glob comes from the same tablePath function the engine reads, so the
    * two sides can never diverge on layout or generation version. */
  def imagesGlob(sf: String = "sf0.01"): String =
    s"${ImageGen.tablePath(sf)}/*.parquet"
  def videosGlob(sf: String = "sf0.01"): String =
    s"${VideoGen.tablePath(sf)}/*.parquet"
  def mixedGlob(sf: String = "sf0.01"): String =
    s"${MixedImageGen.tablePath(sf)}/*.parquet"
  def mixedVideoGlob(sf: String = "sf0.01"): String =
    s"${MixedVideoGen.tablePath(sf)}/*.parquet"
  def nearDupGlob(sf: String = "sf0.01"): String =
    s"${NearDupImageGen.tablePath(sf)}/*.parquet"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Image QUALITY flagging from bytes alone: netpbm decode + fused luma
    // reduction in the scan stage (ppm_luma_mean — bytes never reach a
    // shuffle), then threshold into dark/bright verdicts. The fixture
    // plants dark images (every sample <= ~0.07) at idx%20==7 and bright
    // (>= ~0.93) at idx%20==17; organic mid-range images (luma in
    // [0.25, 0.75]) can trip neither threshold — equality with the
    // id-arithmetic oracle = recall AND precision 1.0.
    "i1_image_quality" -> ((s, dir) => {
      ImageGen.readImages(s, dir)
        .select(col("image_id"), ppm_luma_mean(col("bytes")).as("mean_luma"))
        .select(col("image_id"),
          when(col("mean_luma") <= 0.1, lit("dark"))
            .when(col("mean_luma") >= 0.9, lit("bright"))
            .as("verdict"))
        .filter(col("verdict").isNotNull)
        .orderBy("image_id")
    }),

    // COMPRESSED-image metadata from bytes alone (the r3/r4 verdicts'
    // "library-free metadata path"): JPEG SOF marker walk, PNG IHDR, GIF
    // screen descriptor, BMP info header, netpbm — no pixel decoded, no
    // library used (graft.image.ImageMeta). The fixture interleaves all
    // six formats with dimensions planted by id arithmetic; equality with
    // the id-stated oracle proves every format's header parse recovers
    // format, dimensions, channels and bit depth exactly.
    "i2_image_meta" -> ((s, dir) => {
      MixedImageGen.readImages(s, dir)
        .select(col("image_id"), image_meta(col("bytes")).as("m"))
        .select(col("image_id"), col("m.format").as("format"),
          col("m.width").as("width"), col("m.height").as("height"),
          col("m.channels").as("channels"), col("m.bit_depth").as("bit_depth"))
        .orderBy("image_id")
    }),

    // COMPRESSED-image quality flagging through REAL pixel decode: the i1
    // dark/bright discipline, but the payloads are JPEG/PNG/GIF/BMP (JDK
    // decoder, no external jars) interleaved with netpbm — planted dark
    // (<= 0.05) at idx%10==4 and bright (>= 0.95) at idx%10==9 must be
    // recovered from DECODED PIXELS across every format; codec loss
    // (JPEG quantization, GIF palette) moves the mean by < 0.02, an order
    // of magnitude inside the thresholds.
    "i3_compressed_quality" -> ((s, dir) => {
      MixedImageGen.readImages(s, dir)
        .select(col("image_id"), image_luma_mean(col("bytes")).as("mean_luma"))
        .select(col("image_id"),
          when(col("mean_luma") <= 0.12, lit("dark"))
            .when(col("mean_luma") >= 0.88, lit("bright"))
            .as("verdict"))
        .filter(col("verdict").isNotNull)
        .orderBy("image_id")
    }),

    // CROSS-FORMAT image near-dup: the same picture re-encoded through a
    // different codec (JPEG loss included) is found from the BYTES alone
    // via the perceptual dHash computed in the scan stage + the shared
    // chunk-bucket pairing (Dedup.hashNearDup, pigeonhole-complete at
    // hamming <= 8; only (id, 64-bit sig) rides the shuffle — never
    // pixels). Planted twins at idx%10==7 with format rotated; the
    // populations are separated (twins <= 6 bits, organic >= 12 —
    // ImageHashSpec), so equality with the id-stated oracle is recall
    // AND precision 1.0.
    "i4_image_neardup" -> ((s, dir) => {
      graft.operators.Dedup.hashNearDup(
        NearDupImageGen.readImages(s, dir)
          .select(col("image_id").as("id"), image_dhash(col("bytes")).as("sig")),
        maxHamming = 8)
        .select(col("id_a"), col("id_b"))
        .orderBy("id_a", "id_b")
    }),

    // COMPRESSED-video metadata from bytes alone — the video analog of
    // i2: the fixture interleaves uncompressed YUV4MPEG2 with
    // structurally valid H.264 Annex-B streams (SPS/PPS/SEI), and the
    // engine recovers container, profile, level and CROP-EXACT
    // dimensions via the library-free SPS walk (Exp-Golomb,
    // emulation-prevention removal — graft.image.H264Meta). Dimensions
    // are deliberately non-multiples of 16, so a parser that skips the
    // frame-cropping arithmetic cannot match the oracle.
    "v2_video_meta" -> ((s, dir) => {
      MixedVideoGen.readVideos(s, dir)
        .select(col("video_id"), video_meta(col("bytes")).as("m"))
        .select(col("video_id"), col("m.codec").as("codec"),
          col("m.profile_idc").as("profile_idc"),
          col("m.level_idc").as("level_idc"),
          col("m.width").as("width"), col("m.height").as("height"))
        .orderBy("video_id")
    }),

    // VIDEO near-dup over sampled-frame perceptual hashes (the last
    // modality gap at the operator level, VERDICT r5 #4): each y4m
    // payload is reduced IN THE SCAN STAGE to a 64-bit temporal signature
    // (per-bit majority over every frame's luma dHash —
    // y4m_temporal_dhash; pixels never reach a shuffle), then the shared
    // combination-chunk pairing (Dedup.hashNearDup, pigeonhole-complete
    // at hamming <= 8) recovers the planted trimmed+luma-remapped twins
    // ('-d', idx%20==6) with recall AND precision 1.0 — twins land
    // within ~2 bits (gradient-sign-preserving remap), organic videos
    // ~32 apart (margins pinned in Y4mCodecSpec).
    "v3_video_neardup" -> ((s, dir) => {
      graft.operators.Dedup.hashNearDup(
        VideoGen.readVideos(s, dir)
          .select(col("video_id").as("id"),
            y4m_temporal_dhash(col("bytes")).as("sig")),
        maxHamming = 8)
        .select(col("id_a"), col("id_b"))
        .orderBy("id_a", "id_b")
    }),

    // INCREMENTAL video near-dup (the c20/d8 discipline on the hash
    // family, r6): the '-d' twins arrive as a DELTA against a corpus
    // whose candidate keys are already materialized (Dedup.hashKeys —
    // the stored-at-ingest key table; built in-query here, stored next
    // to the signatures in production). The corpus pays one stored-key
    // scan and ZERO signature/key recomputation; candidates come from
    // the broadcast chunk-keyed delta. Same planted oracle as v3:
    // equality = the incremental path has exact recall and precision.
    "v4_video_neardup_inc" -> ((s, dir) => {
      val sigs = VideoGen.readVideos(s, dir)
        .select(col("video_id").as("id"),
          y4m_temporal_dhash(col("bytes")).as("sig"))
      // MATERIALIZE the key table, as production would (the c20 contract:
      // kernel-computed join keys pay the inferred-constraint tax)
      val corpusKeys = graft.operators.Dedup.hashKeys(
        sigs.filter(!col("id").endsWith("-d")), maxHamming = 8)
        .localCheckpoint(true)
      graft.operators.Dedup.hashNearDupIncremental(
        corpusKeys, sigs.filter(col("id").endsWith("-d")), maxHamming = 8)
        .select(col("id_a"), col("id_b"))
        .orderBy("id_a", "id_b")
    }),

    // Video TEMPORAL quality flagging: y4m luma planes reduced in the scan
    // stage to [n_frames, mean_luma, mean |Δ frame-mean|] — static videos
    // (planted at idx%20==3, identical frames, delta exactly 0) and
    // high-motion ones (idx%20==13, alternating dark/bright, delta ~0.7)
    // must be recovered from the BYTES; organic drift (~0.02) sits an
    // order of magnitude from both thresholds.
    "v1_video_quality" -> ((s, dir) => {
      VideoGen.readVideos(s, dir)
        .select(col("video_id"),
          y4m_motion_stats(col("bytes")).as("m"))
        .select(col("video_id"),
          when(element_at(col("m"), 3) <= 0.001, lit("static"))
            .when(element_at(col("m"), 3) >= 0.3, lit("high_motion"))
            .as("verdict"))
        .filter(col("verdict").isNotNull)
        .orderBy("video_id")
    }))

  val oracleSql: Map[String, String] = oracleSqlFor("sf0.01")

  /** Oracle SQL with fixture globs derived from the harness's scale factor
    * (ADVICE r3: never compare engine@sfX against oracle@sf0.01). */
  def oracleSqlFor(sf: String): Map[String, String] = Map(
    "i1_image_quality" ->
      s"""SELECT image_id,
         |  CASE WHEN CAST(substr(image_id, 5, 8) AS INTEGER) % 20 = 7
         |    THEN 'dark' ELSE 'bright' END AS verdict
         |FROM read_parquet('${imagesGlob(sf)}')
         |WHERE CAST(substr(image_id, 5, 8) AS INTEGER) % 20 IN (7, 17)
         |ORDER BY 1""".stripMargin,
    "v1_video_quality" ->
      s"""SELECT video_id,
         |  CASE WHEN CAST(substr(video_id, 5, 8) AS INTEGER) % 20 = 3
         |    THEN 'static' ELSE 'high_motion' END AS verdict
         |FROM read_parquet('${videosGlob(sf)}')
         |WHERE CAST(substr(video_id, 5, 8) AS INTEGER) % 20 IN (3, 13)
         |ORDER BY 1""".stripMargin,
    // The planting rules of MixedImageGen, stated from the id — the
    // engine derives the same five columns from the BYTES (header walk).
    "i2_image_meta" ->
      s"""SELECT image_id,
         |  CASE CAST(substr(image_id, 6, 8) AS INTEGER) % 6
         |    WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' WHEN 2 THEN 'pgm'
         |    WHEN 3 THEN 'ppm' WHEN 4 THEN 'gif' ELSE 'bmp' END AS format,
         |  16 + (CAST(substr(image_id, 6, 8) AS INTEGER) % 9) * 8 AS width,
         |  12 + (CAST(substr(image_id, 6, 8) AS INTEGER) % 7) * 6 AS height,
         |  CASE WHEN CAST(substr(image_id, 6, 8) AS INTEGER) % 6 = 2
         |    THEN 1 ELSE 3 END AS channels,
         |  8 AS bit_depth
         |FROM read_parquet('${mixedGlob(sf)}')
         |ORDER BY 1""".stripMargin,
    "i3_compressed_quality" ->
      s"""SELECT image_id,
         |  CASE WHEN CAST(substr(image_id, 6, 8) AS INTEGER) % 10 = 4
         |    THEN 'dark' ELSE 'bright' END AS verdict
         |FROM read_parquet('${mixedGlob(sf)}')
         |WHERE CAST(substr(image_id, 6, 8) AS INTEGER) % 10 IN (4, 9)
         |ORDER BY 1""".stripMargin,
    // NearDupImageGen's planted twin set, stated from the id — the
    // engine recovers it from pixels across codecs.
    "i4_image_neardup" ->
      s"""SELECT image_id AS id_a, image_id || '-t' AS id_b
         |FROM read_parquet('${nearDupGlob(sf)}')
         |WHERE image_id NOT LIKE '%-t'
         |  AND CAST(substr(image_id, 6, 8) AS INTEGER) % 10 = 7
         |ORDER BY 1, 2""".stripMargin,
    // VideoGen's planted twin set, stated from the id — the engine
    // recovers it from the y4m luma planes alone.
    "v3_video_neardup" ->
      s"""SELECT video_id AS id_a, video_id || '-d' AS id_b
         |FROM read_parquet('${videosGlob(sf)}')
         |WHERE video_id NOT LIKE '%-d'
         |  AND CAST(substr(video_id, 5, 8) AS INTEGER) % 20 = 6
         |ORDER BY 1, 2""".stripMargin,
    // incremental path, same planted truth (every true pair touches the
    // delta: the corpus is organic-collision-free at hamming 8 — v3's
    // own precision property, margins in Y4mCodecSpec)
    "v4_video_neardup_inc" ->
      s"""SELECT video_id AS id_a, video_id || '-d' AS id_b
         |FROM read_parquet('${videosGlob(sf)}')
         |WHERE video_id NOT LIKE '%-d'
         |  AND CAST(substr(video_id, 5, 8) AS INTEGER) % 20 = 6
         |ORDER BY 1, 2""".stripMargin,
    // MixedVideoGen's planting rules, stated from the id — the engine
    // derives the same columns from the BYTES (y4m header / H.264 SPS).
    "v2_video_meta" ->
      s"""SELECT video_id,
         |  CASE WHEN CAST(substr(video_id, 6, 8) AS INTEGER) % 2 = 0
         |    THEN 'y4m' ELSE 'h264' END AS codec,
         |  CASE WHEN CAST(substr(video_id, 6, 8) AS INTEGER) % 2 = 0 THEN 0
         |    WHEN CAST(substr(video_id, 6, 8) AS INTEGER) % 4 = 1 THEN 66
         |    ELSE 100 END AS profile_idc,
         |  CASE WHEN CAST(substr(video_id, 6, 8) AS INTEGER) % 2 = 0 THEN 0
         |    ELSE 30 + (CAST(substr(video_id, 6, 8) AS INTEGER) % 3) * 10
         |    END AS level_idc,
         |  160 + (CAST(substr(video_id, 6, 8) AS INTEGER) % 11) * 18 AS width,
         |  90 + (CAST(substr(video_id, 6, 8) AS INTEGER) % 7) * 14 AS height
         |FROM read_parquet('${mixedVideoGlob(sf)}')
         |ORDER BY 1""".stripMargin)
}
