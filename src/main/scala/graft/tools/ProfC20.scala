package graft.tools

import org.apache.spark.sql.functions._
import graft.{Bench, GraftSession}
import graft.fixtures.ClipGen
import graft.functions.GraftFunctions._

/** Scratch: stage-wise timing of the c20 query shape. */
object ProfC20 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create("local[32]", 32, "prof-c20")
    val (clipsPath, _) = ClipGen.ensure(spark, sfDir)
    spark.catalog.clearCache()
    Bench.warmPageCache(clipsPath)
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val clips = ClipGen.readClips(spark, sfDir)
      .select("clip_id", "bytes", "codec", "sr_hz")
    val twinCodec = when(col("codec") === "ulaw", lit("alaw")).otherwise(lit("ulaw"))
    val trimmed = expr(
      "substring(bytes, CASE WHEN codec = 'pcm16' THEN 321 ELSE 161 END)")
    val combined = t("combined fp+delta scan (checkpoint)") {
      clips.select(col("clip_id"), col("sr_hz"),
          pcm_sample_count(col("bytes"), col("codec")).as("n"),
          pcm_tone_pair(col("bytes"), col("codec"), col("sr_hz")).as("tones"),
          when(substring(col("clip_id"), 6, 8).cast("int") % 20 === 10,
            struct(concat(col("clip_id"), lit("-s")).as("clip_id"),
              pcm_transcode(trimmed, col("codec"), twinCodec).as("bytes"),
              twinCodec.as("codec"), col("sr_hz"))).as("twin"))
        .select(struct(col("clip_id").as("id"), col("sr_hz").as("sr"),
          col("n"), element_at(col("tones"), 1).as("f1"),
          element_at(col("tones"), 2).as("f2")).as("fp"), col("twin"))
        .localCheckpoint(true)
    }
    val fp = combined.select("fp.*")
    val twins = combined.filter(col("twin").isNotNull).select("twin.*")
    val result = t("audioNearDupIncremental plan + run") {
      val df = graft.operators.Dedup.audioNearDupIncremental(fp, clips, twins)
        .orderBy("id_a", "id_b")
      df.write.format("noop").mode("overwrite").save()
    }
    // second run to split plan-build vs execute
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.valuesIterator
      .foreach(_.unpersist(blocking = true))
    Bench.warmPageCache(clipsPath)
    t("incremental again") {
      graft.operators.Dedup.audioNearDupIncremental(fp, clips, twins)
        .orderBy("id_a", "id_b")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
