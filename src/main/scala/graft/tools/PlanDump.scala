package graft.tools

import graft.{GraftSession, SparkEntry}
import graft.fixtures.ClipGen

/** Print the formatted physical plan of a SparkEntry query (plan-shape
  * iteration loop: count kernel sites, check codegen spans/exchanges).
  * Run: `sbt "runMain graft.tools.PlanDump <sfDir> <name>"`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <name>")
    val spark = GraftSession.create("local[8]", 8, "graft-plandump")
    ClipGen.ensure(spark, args(0))
    val df = SparkEntry.queries(args(1))(spark, args(0))
    // scalastyle:off println
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    // scalastyle:on println
    spark.stop()
  }
}
