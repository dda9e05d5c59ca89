package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling (SURVEY.md §4): the clips table is intentionally
  * codec-skewed (80/15/5) like the reference's per-domain request bursts
  * (`/root/reference/scrape/scrape.go:344-346`). Two tools:
  *
  *  - `repartitionSalted`: spread one hot key across `salt` partitions for
  *    downstream per-partition work (pre-shuffle stage balancing).
  *  - `saltedAgg`: two-phase aggregation — partial agg on (key, salt),
  *    final agg on key. Catalyst's own partial aggregation already defuses
  *    skew for algebraic aggregates; the two-phase form matters for
  *    holistic ones (collect_list/set, exact distinct) where one reducer
  *    would otherwise receive the whole hot key.
  */
object Salting {

  def saltCol(salt: Int, pivot: Column): Column =
    pmod(hash(pivot), lit(salt))

  /** Spread rows of hot `keys` evenly across `keys x salt` partitions;
    * `pivot` must be high-cardinality (e.g. clip_id). */
  def repartitionSalted(df: DataFrame, keys: Seq[Column], pivot: Column,
                        salt: Int, numPartitions: Int): DataFrame =
    df.repartition(numPartitions, keys :+ saltCol(salt, pivot): _*)

  /** Two-phase salted collect_list: partial lists per (keys, salt), final
    * flatten+sort per keys — no single reducer ever holds a hot key's raw
    * rows, and output order stays deterministic (sorted). */
  def saltedCollectSorted(df: DataFrame, keys: Seq[String], valueCol: Column,
                          salt: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("_salt", saltCol(salt, valueCol))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(collect_list(valueCol).as("_partial"),
        count(lit(1)).as("_n"))
      .groupBy(keyCols: _*)
      .agg(sort_array(flatten(collect_list(col("_partial")))).as("values"),
        sum(col("_n")).as("n"))
  }
}
