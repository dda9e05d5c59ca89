package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

/** ClipTable.readForKeys — the storage-bucketed (SPJ-style) rehydration
  * fallback for key sets beyond one broadcast's ceiling. Proves, with
  * auto-broadcast DISABLED (so nothing silently saves the plan at fixture
  * scale), that (a) the output is identical to a plain semi-join against
  * the full table, (b) the executed plan contains NO shuffle exchange
  * carrying the payload column and NO sort-merge join — only per-bucket
  * broadcast semi-joins over dir-pruned scans, and (c) each broadcast is
  * a per-bucket slice, not the whole key set. */
class BucketedRehydrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
    p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: allNodes(q.plan)
      case other => other +: other.children.flatMap(allNodes)
    }

  test("bucket-aligned rehydration: no corpus exchange, identical output") {
    val dir = Files.createTempDirectory("tbl-spj").toString
    val nBuckets = 8
    val t = ClipTable(dir, Seq("clip_id"), numBuckets = nBuckets)
    // a COW table with a fat payload column
    val corpus = spark.range(2000).select(
      concat(lit("clip-"), col("id")).as("clip_id"),
      concat(lit("payload-"), col("id"), lit("-"),
        lpad(lit("x"), 64, "x")).cast("binary").as("bytes"),
      (col("id") % 97).as("v"))
    t.merge(corpus, 0)

    // candidate ids: ~half the corpus, deliberately "too big to broadcast
    // whole" for this test's purposes
    val cands = spark.range(2000).filter(col("id") % 2 === 0)
      .select(concat(lit("clip-"), col("id")).as("clip_id"))

    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val got = t.readForKeys(spark, cands)
      // (b) plan shape: every join is a broadcast semi-join; the payload
      // column never rides a shuffle; scans are per-bucket directories
      got.write.format("noop").mode("overwrite").save() // materialize AQE
      val nodes = allNodes(got.queryExecution.executedPlan)
      val smj = nodes.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
      assert(smj.isEmpty, s"sort-merge join in the bucketed plan")
      val joins = nodes.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j }
      assert(joins.size == nBuckets, s"${joins.size} broadcast joins != $nBuckets")
      val badShuffles = nodes.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
          if e.child.output.exists(_.name == "bytes") => e
      }
      assert(badShuffles.isEmpty, "payload bytes ride a shuffle exchange")
      // (c) each broadcast carries one bucket's slice of the key set: the
      // build side filters on _kbucket
      val builds = joins.map(j => (j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
      }).toString)
      assert(builds.forall(_.contains("_kbucket")),
        s"broadcast build sides are not bucket-sliced:\n${builds.head}")

      // (a) output identity vs the straightforward full-table semi-join
      val want = t.read(spark)
        .join(cands, Seq("clip_id"), "leftsemi")
        .select("clip_id", "v").as[(String, Long)].collect().toSet
      val gotSet = got.select("clip_id", "v").as[(String, Long)].collect().toSet
      assert(gotSet == want && gotSet.size == 1000,
        s"bucketed rehydration diverged: ${gotSet.size} vs ${want.size} rows")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("readForKeys refuses the MOR layout") {
    val dir = Files.createTempDirectory("tbl-spj-mor").toString
    val t = ClipTable(dir, Seq("k"), numBuckets = 2, mergeOnRead = true)
    t.merge(Seq(("a", 1)).toDF("k", "v"), 0)
    intercept[IllegalArgumentException] {
      t.readForKeys(spark, Seq("a").toDF("k"))
    }
  }
}
