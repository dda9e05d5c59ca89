package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.operators.{Dedup, Similarity}

/** Training-data pipeline operators over the driver's documents/embeddings
  * tables: text analysis, dedup (exact + MinHash-LSH + SimHash + embedding
  * near-dup), and ANN similarity search.
  *
  * The driver corpus is all-distinct, so dedup queries run on a corpus
  * AUGMENTED with deterministic duplicates (exact copies of doc_id%7==0,
  * near-copies of doc_id%11==0 with a few words appended) — the identical
  * construction is expressed in the oracle SQL, so results stay checkable.
  *
  * Similarity scores use the int-quantized cosine (integer dot/norms are
  * addition-order free => bit-identical in Spark and DuckDB at any
  * parallelism; see graft.functions.VectorOps).
  */
object DocQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** documents + exact copies (%7) and near copies (%11, words appended). */
  private def augmented(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    d.unionByName(
        d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      .unionByName(
        d.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 2000000).as("doc_id"),
            concat(col("text"), lit(" appended tail marker words")).as("text")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Text quality stats — integer-exact ratios (floor(1e4 * a / b)).
    "t1_text_stats" -> ((s, dir) => {
      docs(s, dir).select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        size(split(trim(col("text")), "\\s+")).as("n_tokens"),
        floor(lit(10000.0) * length(regexp_replace(col("text"), "[^A-Za-z]", ""))
          / length(col("text"))).as("alpha_x10k"),
        floor(lit(100.0) * length(regexp_replace(col("text"), "\\s+", ""))
          / size(split(trim(col("text")), "\\s+"))).as("avg_wordlen_x100"))
        .orderBy("doc_id")
    }),

    // Language-ID heuristic + simhash + winnowing fingerprint (native
    // expressions; not SQL-expressible -> rows-only; accuracy and
    // robustness are covered by TextOpsSpec).
    "t2_lang_fingerprints" -> ((s, dir) => {
      docs(s, dir).select(
        col("doc_id"), col("lang"),
        lang_id(col("text")).as("lang_pred"),
        sim_hash(col("text")).as("simhash"),
        winnow_fp(col("text")).as("winnow_fp"))
        .orderBy("doc_id")
    }),

    // Normalized md5 content digest (the exact-dedup signature).
    "t3_fingerprint_md5" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"), Dedup.digest(col("text")).as("digest"))
        .orderBy("doc_id")
    }),

    // Exact dedup over the augmented corpus: hash-groupBy on the digest.
    "d1_dedup_exact" -> ((s, dir) => {
      Dedup.exact(augmented(s, dir), "text", "doc_id")
        .orderBy("canonical_id")
    }),

    // MinHash-LSH near-dup + exact Jaccard verify (rows-only; pair-recall
    // asserted in DedupSpec).
    "d2_neardup_minhash" -> ((s, dir) => {
      Dedup.nearDupJaccard(augmented(s, dir), "text", "doc_id", threshold = 0.5)
        .orderBy("id_a", "id_b")
    }),

    // SimHash near-dup (rows-only).
    "d3_neardup_simhash" -> ((s, dir) => {
      Dedup.simhashNearDup(augmented(s, dir), "text", "doc_id", maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // Embedding near-dup, exact all-pairs baseline (oracled: quantized
    // integer cosine is engine-exact).
    "d4_embedding_neardup" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id"), col("embedding"))
      val a = e.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("cos", qcosine_sim(col("v_a"), col("v_b")))
        .filter(col("cos") >= 0.5)
        .select(col("id_a"), col("id_b"), floor(col("cos") * 1e6).as("cos_x1e6"))
        .orderBy("id_a", "id_b")
    }),

    // Brute-force cosine top-k (oracled): probe set = vec_id < 8, k = 10.
    "s1_knn_brute" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.bruteForceKnn(e, e.filter(col("vec_id") < 8), k = 10)
        .orderBy("query_id", "rank")
    }),

    // LSH-bucketed ANN (rows-only; recall vs brute force in SimilaritySpec).
    "s2_knn_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.lshKnn(e, e.filter(col("vec_id") < 8), k = 10, nBits = 6)
        .orderBy("query_id", "rank")
    }))

  private val augmentedSql =
    """aug AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000, text || ' appended tail marker words'
      |  FROM documents WHERE doc_id % 11 = 0)""".stripMargin

  private val qvecSql =
    """qv AS (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
      |  FROM embeddings)""".stripMargin

  /** Integer dot/norm of two quantized vectors via parallel unnest. */
  private def pairScoreSql(aCol: String, bCol: String): String =
    s"""(SELECT CAST(sum(x * y) AS DOUBLE) /
       |  (sqrt(CAST(sum(x * x) AS DOUBLE)) * sqrt(CAST(sum(y * y) AS DOUBLE)))
       | FROM (SELECT unnest($aCol) AS x, unnest($bCol) AS y))""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "t1_text_stats" ->
      """SELECT doc_id,
        |  length(text) AS n_chars,
        |  len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |  CAST(floor(10000.0 * length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        |    / length(text)) AS BIGINT) AS alpha_x10k,
        |  CAST(floor(100.0 * length(regexp_replace(text, '\s+', '', 'g'))
        |    / len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS avg_wordlen_x100
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t3_fingerprint_md5" ->
      """SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d1_dedup_exact" ->
      s"""WITH $augmentedSql
         |SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS digest,
         |  min(doc_id) AS canonical_id, count(*) AS n_copies
         |FROM aug GROUP BY 1 ORDER BY canonical_id""".stripMargin,
    "d4_embedding_neardup" ->
      s"""WITH $qvecSql,
         |scored AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    ${pairScoreSql("a.q", "b.q")} AS cos
         |  FROM qv a JOIN qv b ON a.vec_id < b.vec_id)
         |SELECT id_a, id_b, CAST(floor(cos * 1e6) AS BIGINT) AS cos_x1e6
         |FROM scored WHERE cos >= 0.5 ORDER BY id_a, id_b""".stripMargin,
    "s1_knn_brute" ->
      s"""WITH $qvecSql,
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |    ${pairScoreSql("q.q", "c.q")} AS score
         |  FROM qv q JOIN qv c ON q.vec_id < 8 AND c.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT query_id, cand_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, cand_id) AS rank
         |  FROM scored)
         |SELECT query_id, rank, cand_id,
         |  CAST(floor(score * 1e6) AS BIGINT) AS score_x1e6
         |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin)
}
