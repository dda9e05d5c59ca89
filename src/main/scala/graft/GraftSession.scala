package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's session tuning — every entry point (Verify,
  * Bench, tests) builds through here so the knobs stay consistent.
  *
  * Scale-motivated settings:
  *  - `columnarReaderBatchSize=128`: the clips table carries a fat binary
  *    column (up to ~350 KB of audio per row at 44.1 kHz pcm16); the
  *    default 4096-row vectorized batch would reserve >100 MB per task and
  *    OOM a 32-thread executor. 128 rows x ~350 KB ~= 45 MB worst case.
  *  - small `maxPartitionBytes`/`openCostInBytes`: keep enough input splits
  *    that the CPU-heavy decode/extract scan stage can use all cores even
  *    inside a single micro-batch.
  *  - RocksDB state store: the mandated provider for streaming state.
  *  - AQE on: runtime coalescing/skew-join handling.
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int, appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // the engine's Catalyst extensions (optimizer rules + the as-of join
      // planner strategy) — same line a spark-submit user would pass
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.columnarReaderBatchSize", "128")
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (1024 * 1024).toString)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // changelog checkpointing: per-batch state commit uploads the delta,
      // not a full RocksDB snapshot — cuts fixed per-micro-batch cost.
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")

  def create(master: String, shufflePartitions: Int, appName: String = "graft"): SparkSession = {
    val s = builder(master, shufflePartitions, appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(s)
    s
  }
}
