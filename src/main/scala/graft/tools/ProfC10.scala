package graft.tools

import org.apache.spark.sql.functions._
import graft.{Bench, GraftSession}
import graft.fixtures.ClipGen
import graft.functions.GraftFunctions._

/** Scratch: stage-by-stage timing of the c10 query shape. */
object ProfC10 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create("local[32]", 32, "prof-c10")
    val (clipsPath, _) = ClipGen.ensure(spark, sfDir)
    def t(label: String)(f: => Unit): Unit = {
      spark.catalog.clearCache()
      Bench.warmPageCache(clipsPath)
      val t0 = System.nanoTime()
      f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val base = ClipGen.readClips(spark, sfDir)
      .select(col("clip_id"), col("sr_hz"),
        (substring(col("clip_id"), 6, 8).cast("int") % 8).as("b"),
        pcm_sample_count(col("bytes"), col("codec")).as("n"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    t("scan+n only")(noop(base))
    val withBands = base.withColumn("bands", pcm_band_energies(
      pcm_tone(col("sr_hz"),
        expr("CAST(2 * b + 1 AS BIGINT) * (CAST(sr_hz AS BIGINT) * 1000 DIV 32)"),
        col("n")),
      lit("pcm16"), col("sr_hz")))
    t("bands")(noop(withBands))
    t("bands again")(noop(withBands))
    val full = withBands.select(col("clip_id"), col("sr_hz"),
      (expr("array_position(bands, array_max(bands))") - 1).cast("int").as("band"),
      (element_at(col("bands"), expr("CAST(array_position(bands, array_max(bands)) AS INT)")) * 10 >
        expr("aggregate(bands, 0.0d, (a, x) -> a + x)") * 9).as("concentrated"))
    t("full no-sort")(noop(full))
    t("full sorted")(noop(full.orderBy("clip_id")))
    spark.stop()
  }
}
