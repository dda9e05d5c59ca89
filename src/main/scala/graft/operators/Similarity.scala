package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - `bruteForceKnn`: the exact baseline — broadcast the (small) query
  *    set against the corpus; one scan, no corpus shuffle, top-k via
  *    per-query window. Scales linearly with corpus size and is the
  *    correctness reference for the ANN path.
  *  - `lshKnn`: hyperplane-LSH bucketing (the scale path) — queries only
  *    score candidates in their own bucket, cutting scored pairs by
  *    ~2^nBits; recall measured against brute force in the test suite.
  *
  * Scoring uses the int-quantized cosine (bit-identical across engines and
  * parallelism — see graft.functions.VectorOps); ties break on vec_id.
  */
object Similarity {

  /** Exact top-k: every (query, candidate) pair scored. `queries` must be
    * small enough to broadcast (it is the probe set, not the corpus). */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cand_id"))
    c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .withColumn("score", qcosine_sim(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"),
        floor(col("score") * 1e6).as("score_x1e6"))
  }

  /** LSH-bucketed ANN with multi-probe: each query probes its own bucket
    * plus every bucket at hamming distance 1 in the bucket code (the
    * standard multi-probe trick — recall of several independent tables for
    * the storage cost of one). Scored candidate fraction ~= (nBits+1)/2^nBits. */
  def lshKnn(corpus: DataFrame, queries: DataFrame, k: Int, nBits: Int = 6,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val qBase = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      vec_lsh_bucket(col(vecCol), lit(nBits)).as("bucket0"))
    // probes: exact bucket + single-bit flips (all distinct => no dup pairs)
    val q = qBase.select(col("query_id"), col("qv"),
      explode(transform(sequence(lit(0), lit(nBits)),
        i => when(i === 0, col("bucket0"))
          .otherwise(col("bucket0").bitwiseXOR(
            pow(lit(2.0), (i - 1).cast("double")).cast("int")))))
        .as("bucket"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      vec_lsh_bucket(col(vecCol), lit(nBits)).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cand_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("score", qcosine_sim(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"),
        floor(col("score") * 1e6).as("score_x1e6"))
  }
}
