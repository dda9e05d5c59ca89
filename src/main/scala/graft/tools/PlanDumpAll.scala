package graft.tools

import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}
import graft.fixtures.ClipGen

/** Dump `.explain("formatted")` for a list of queries to files — the
  * plans/r07/<query>_{before,after}.txt evidence the optimization round
  * commits. Run:
  * `sbt "runMain graft.tools.PlanDumpAll <sfDir> <outDir> <suffix> <name>[,<name>...]"`. */
object PlanDumpAll {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDumpAll <sfDir> <outDir> <suffix> <name>[,...]")
    val Array(sfDir, outDir, suffix, namesCsv) = args.take(4)
    val spark = GraftSession.create("local[8]", 8, "graft-plandumpall")
    ClipGen.ensure(spark, sfDir)
    if (namesCsv.split(",").exists(n => n.startsWith("i") || n.startsWith("v"))) {
      graft.fixtures.ImageGen.ensure(spark, sfDir)
      graft.fixtures.VideoGen.ensure(spark, sfDir)
      graft.fixtures.MixedImageGen.ensure(spark, sfDir)
      graft.fixtures.MixedVideoGen.ensure(spark, sfDir)
      graft.fixtures.NearDupImageGen.ensure(spark, sfDir)
    }
    Files.createDirectories(Paths.get(outDir))
    namesCsv.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
