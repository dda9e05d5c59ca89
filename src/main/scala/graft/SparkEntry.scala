package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{AudioContainerQueries, ClipQueries, DocQueries, ImageQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Two query families:
  *  - Relational analytics over the driver's TPC-H-ish parquet (DuckDB
  *    oracles on the same tables).
  *  - CEP-engine queries over the synthesized audio clip + transcript
  *    table (BASELINE.json input_hint shape); the table is generated
  *    deterministically under /root/repo/data/clips/<sf>/ and the oracle
  *    reads the same parquet via read_parquet.
  */
object SparkEntry {

  /** Flagship: the reference "persons cards" payload re-expressed — decode
    * + extract + tumbling windows on the sf0.001 clip table. */
  def entry(spark: SparkSession): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    ClipQueries.queries("c2_tumbling_counts")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2 (plus the
    * training-data pipeline operators: dedup/similarity/text analysis). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ ClipQueries.queries ++ DocQueries.queries ++
      ImageQueries.queries ++ AudioContainerQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = oracleSqlFor("sf0.01")

  /** Same, with self-generated fixture globs (clips/images/videos) derived
    * from the harness's scale factor name — the relational oracles resolve
    * tables driver-side and are already scale-independent. */
  def oracleSqlFor(sfName: String): Map[String, String] =
    RelationalQueries.oracleSql ++ ClipQueries.oracleSqlFor(sfName) ++
      DocQueries.oracleSql ++ ImageQueries.oracleSqlFor(sfName) ++
      AudioContainerQueries.oracleSqlFor(sfName)
}
