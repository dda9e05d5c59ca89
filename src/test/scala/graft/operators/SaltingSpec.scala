package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SaltingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // heavily skewed: one hot key with 5000 rows, 10 cold keys with 10
  private lazy val skewed = (
    (1 to 5000).map(i => ("hot", s"v$i")) ++
      (1 to 10).flatMap(k => (1 to 10).map(i => (s"cold$k", s"w$k-$i")))
    ).toDF("k", "v")

  test("saltedCollectSorted equals the direct collect_list (sorted), per key") {
    val direct = skewed.groupBy("k")
      .agg(sort_array(collect_list($"v")).as("values"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getSeq[String](1), r.getLong(2))).toMap
    val salted = Salting.saltedCollectSorted(skewed, Seq("k"), $"v", salt = 8)
      .collect().map(r => r.getString(0) -> (r.getSeq[String](1), r.getLong(2))).toMap
    assert(salted == direct)
  }

  test("repartitionSalted spreads the hot key across partitions") {
    val parts = Salting.repartitionSalted(skewed.filter($"k" === "hot"),
        Seq($"k"), $"v", salt = 8, numPartitions = 8)
      .select(spark_partition_id().as("p")).groupBy("p").count()
      .collect().map(_.getLong(1))
    assert(parts.length >= 4, s"hot key landed in only ${parts.length} partitions")
    assert(parts.max < 5000, "one partition still holds the whole hot key")
  }
}
