package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Deduplication operators for the training-data pipeline, all designed as
  * shuffle-once plans that survive a 100 TB corpus:
  *
  *  - exact: hash-groupBy on a normalized digest (one shuffle on the
  *    digest; map-side partial agg keeps it skew-tolerant).
  *  - MinHash + LSH: signature -> band keys -> explode -> groupBy band —
  *    candidate generation never compares all pairs, only same-bucket
  *    collisions (O(n·bands) shuffle rows, not O(n²)).
  *  - SimHash: 64-bit signature, candidates bucketed by 16-bit chunks
  *    (any pair within hamming distance 3 shares at least one of 4 chunks).
  *  - n-gram Jaccard: exact verification applied only to LSH candidates.
  *  - embedding near-dup: quantized-cosine over hyperplane-LSH buckets.
  */
object Dedup {

  /** Normalize + digest for exact dedup (md5 keeps the oracle portable). */
  def digest(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Exact dedup: one row per distinct normalized text with the canonical
    * (minimum) id and the duplicate count. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(digest(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** MinHash-LSH candidate pairs: k-minhash signature split into `bands`
    * bands of r rows; same band-hash => candidate. Returns (id_a, id_b)
    * with id_a < id_b, plus the estimated and exact similarities. */
  def minhashLsh(df: DataFrame, textCol: String, idCol: String,
                 k: Int = 32, bands: Int = 8): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val sig = df.select(col(idCol).as("id"), col(textCol).as("text"),
      min_hash(col(textCol), lit(k)).as("sig"))
    val banded = sig.select(col("id"), col("text"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * r + 1, lit(r)), b))).as(Seq("band", "bhash")))
    val a = banded.select(col("band"), col("bhash"),
      col("id").as("id_a"), col("text").as("text_a"))
    val b = banded.select(col("band"), col("bhash"),
      col("id").as("id_b"), col("text").as("text_b"))
    a.join(b, Seq("band", "bhash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("text_a"), col("text_b"))
      .distinct()
  }

  /** MinHash-LSH near-dup detection with exact n-gram-Jaccard verification
    * (verification touches only LSH candidates). */
  def nearDupJaccard(df: DataFrame, textCol: String, idCol: String,
                     threshold: Double = 0.7, k: Int = 32, bands: Int = 8): DataFrame = {
    val jac = udf((a: String, b: String) => graft.functions.TextOps.jaccard(a, b))
    minhashLsh(df, textCol, idCol, k, bands)
      .withColumn("jaccard", jac(col("text_a"), col("text_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** SimHash near-dup: pairs within `maxHamming` of each other. Candidate
    * buckets = the 4 16-bit chunks of the signature (pigeonhole: hamming
    * <= 3 => at least one identical chunk). */
  def simhashNearDup(df: DataFrame, textCol: String, idCol: String,
                     maxHamming: Int = 3): DataFrame = {
    val sig = df.select(col(idCol).as("id"), sim_hash(col(textCol)).as("sig"))
    val chunked = sig.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("sig"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk", "ckey")))
    val a = chunked.select(col("chunk"), col("ckey"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = chunked.select(col("chunk"), col("ckey"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    val ham = udf((x: Long, y: Long) => java.lang.Long.bitCount(x ^ y))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), ham(col("sig_a"), col("sig_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup via quantized cosine over hyperplane-LSH buckets:
    * only same-bucket pairs are scored (bucket count 2^nBits bounds the
    * join fan-out); exact for same-bucket pairs, approximate overall. */
  def embeddingNearDup(df: DataFrame, vecCol: String, idCol: String,
                       threshold: Double = 0.90, nBits: Int = 8): DataFrame = {
    val withB = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      vec_lsh_bucket(col(vecCol), lit(nBits)).as("bucket"))
    val a = withB.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = withB.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", qcosine_sim(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), floor(col("cos") * 1e6).as("cos_x1e6"))
      .distinct()
  }
}
