package graft.tools

import graft.{Bench, GraftSession, SparkEntry}
import graft.fixtures.ClipGen

/** Time individual `SparkEntry` queries at any scale factor without the
  * full Bench streaming sweep — the iteration loop for single-query
  * optimization (e.g. re-measuring a near-dup plan change at sf1).
  * Inputs are page-cache-warmed before each timed run, like Bench.
  *
  * Run: `sbt "runMain graft.tools.QueryBench <sfDir> <name>[,<name>...]"`.
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryBench <sfDir> <name>[,<name>...]")
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.create(s"local[$cpus]", cpus, "graft-querybench")
    val (clipsPath, updatesPath) = ClipGen.ensure(spark, sfDir)
    names.foreach { n =>
      Bench.warmPageCache(clipsPath)
      Bench.warmPageCache(updatesPath)
      Bench.warmPageCache(sfDir)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"$n: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
