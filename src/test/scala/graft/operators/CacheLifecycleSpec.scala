package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Dedup.withCandidates]] — the r6 lifecycle API for the candidate-stage
  * persists (VERDICT r5 #5 / the accepted ADVICE-low): the SemiJoin
  * rehydration paths persist their candidate pair sets, and by default
  * that cache's lifetime is the caller's. A scoped pass must leave the
  * block manager exactly as it found it, with identical output. */
class CacheLifecycleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def persistedRddCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  private lazy val docs = (0 until 400).map { i =>
    val base = s"the quick brown fox ${i % 97} jumps over the lazy dog " * 4
    (s"d-$i", if (i % 10 == 0) base + " near dup tail" else base + s" unique $i")
  }.toDF("doc_id", "text")

  test("withCandidates: no candidate persists survive the scope; output identical") {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.valuesIterator
      .foreach(_.unpersist(blocking = true))
    val before = persistedRddCount

    // force the SemiJoin path (persisting) explicitly — Auto would pick
    // Direct (no persist) at this fixture size and the spec would gate air
    val inScope = Dedup.withCandidates {
      val out = Dedup.nearDupJaccard(docs, "text", "doc_id",
        rehydration = Dedup.Rehydration.SemiJoin)
        .as[(String, String, Long)].collect().toSet
      assert(persistedRddCount > before, "SemiJoin path registered no persist")
      out
    }
    assert(persistedRddCount == before,
      s"candidate persists leaked: $persistedRddCount != $before")

    // unscoped runs still work and produce the same output (caller-owned
    // lifetime, the pre-r6 default)
    val unscoped = Dedup.nearDupJaccard(docs, "text", "doc_id",
      rehydration = Dedup.Rehydration.SemiJoin)
      .as[(String, String, Long)].collect().toSet
    assert(unscoped == inScope)
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.valuesIterator
      .foreach(_.unpersist(blocking = true))
  }

  test("withCandidates covers the incremental path and nests with plain code") {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.valuesIterator
      .foreach(_.unpersist(blocking = true))
    val before = persistedRddCount
    // the delta re-uploads two corpus docs nearly verbatim (true twins)
    val delta = docs.filter(col("doc_id").isin("d-20", "d-30"))
      .select(concat(col("doc_id"), lit("-re")).as("doc_id"),
        concat(col("text"), lit(" x")).as("text"))
    val n = Dedup.withCandidates {
      Dedup.nearDupJaccardIncremental(docs, delta, "text", "doc_id").count()
    }
    assert(n >= 2)
    assert(persistedRddCount == before,
      s"incremental candidate persists leaked: $persistedRddCount != $before")
  }
}
