package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextOps

/** Training-data pipeline operators: language-ID, SimHash, MinHash/LSH,
  * winnowing, dedup and ANN similarity — correctness + recall. */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- text ops

  test("lang_id identifies fixture sentences per language") {
    assert(TextOps.langId("the cat sat on the mat and it is warm in here") == "en")
    assert(TextOps.langId("el perro corre en la calle y es un dia bonito") == "es")
    assert(TextOps.langId("der Hund und die Katze, das ist nicht ein Problem mit zu") == "de")
    assert(TextOps.langId("le chat est dans les jardins pour une promenade") == "fr")
    assert(TextOps.langId("今天天气很好我们去公园") == "zh")
    assert(TextOps.langId("xyzzy qwerty plugh") == "und")
    assert(TextOps.langId("") == "und")
  }

  test("simhash: identical texts collide, near texts are close, far texts far") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val b = a + " appended"
    val c = "totally different words about completely other topics entirely unrelated"
    assert(TextOps.hamming(TextOps.simHash(a), TextOps.simHash(a)) == 0)
    assert(TextOps.hamming(TextOps.simHash(a), TextOps.simHash(b)) <= 12)
    assert(TextOps.hamming(TextOps.simHash(a), TextOps.simHash(c)) >= 16)
  }

  test("minhash similarity approximates exact jaccard") {
    val a = (1 to 40).map(i => s"w$i").mkString(" ")
    val b = (1 to 40).map(i => if (i % 5 == 0) s"x$i" else s"w$i").mkString(" ")
    val exact = TextOps.jaccard(a, b)
    val est = TextOps.minHashSim(TextOps.minHash(a, 64), TextOps.minHash(b, 64))
    assert(math.abs(exact - est) < 0.25, s"exact=$exact est=$est")
    assert(TextOps.minHashSim(TextOps.minHash(a, 32), TextOps.minHash(a, 32)) == 1.0)
  }

  test("winnowing fingerprints: near-dup texts share most fingerprints") {
    val a = (1 to 60).map(i => s"tok$i").mkString(" ")
    val b = (1 to 60).map(i => if (i == 30) "EDITED" else s"tok$i").mkString(" ")
    val fa = TextOps.winnowFingerprint(a).toSet
    val fb = TextOps.winnowFingerprint(b).toSet
    val overlap = fa.intersect(fb).size.toDouble / math.max(fa.size, fb.size)
    assert(overlap >= 0.6, s"overlap=$overlap")
    // and an unrelated text shares ~none
    val fc = TextOps.winnowFingerprint((1 to 60).map(i => s"zzz$i").mkString(" ")).toSet
    assert(fa.intersect(fc).isEmpty)
  }

  // ---------------------------------------------------------------- dedup

  private lazy val docsAug = {
    val d = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    d.unionByName(d.filter($"doc_id" % 7 === 0)
        .select(($"doc_id" + 1000000).as("doc_id"), $"text"))
      .unionByName(d.filter($"doc_id" % 11 === 0)
        .select(($"doc_id" + 2000000).as("doc_id"),
          concat($"text", lit(" appended tail marker words")).as("text")))
      .cache()
  }

  test("exact dedup: every %7 doc collapses to its canonical id") {
    val res = Dedup.exact(docsAug, "text", "doc_id")
    val dups = res.filter($"n_copies" > 1)
    val nBase = spark.read.parquet(s"$sf/documents.parquet").count()
    val expected = (0L until nBase).count(_ % 7 == 0)
    assert(dups.count() == expected)
    assert(dups.filter($"canonical_id" >= 1000000).count() == 0) // canonical = original
  }

  test("minhash-LSH + jaccard verify finds exact and near duplicates") {
    val pairs = Dedup.nearDupJaccard(docsAug, "text", "doc_id", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").as[Long].collect()
    val wantExact = base.filter(_ % 7 == 0).map(i => (i, i + 1000000)).toSet
    val wantNear = base.filter(_ % 11 == 0).map(i => (i, i + 2000000)).toSet
    val foundExact = wantExact.intersect(pairs).size.toDouble / wantExact.size
    val foundNear = wantNear.intersect(pairs).size.toDouble / wantNear.size
    assert(foundExact == 1.0, s"exact-dup recall $foundExact")
    assert(foundNear >= 0.8, s"near-dup recall $foundNear")
  }

  test("simhash near-dup finds exact copies at hamming 0") {
    val pairs = Dedup.simhashNearDup(docsAug, "text", "doc_id", maxHamming = 3)
    // original -> its exact copy only (copy-of-copy pairs are separate)
    val exactPairs = pairs.filter($"hamming" === 0 &&
      $"id_a" < 1000000L && $"id_b" === $"id_a" + 1000000L)
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").as[Long].collect()
    assert(exactPairs.count() == base.count(_ % 7 == 0))
  }

  // ----------------------------------------------------------- similarity

  test("quantized cosine tracks float cosine within quantization error") {
    import graft.functions.GraftFunctions._
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
    val a = e.select($"vec_id".as("ia"), $"embedding".as("va"))
    val b = e.select($"vec_id".as("ib"), $"embedding".as("vb"))
    val rows = a.join(b, $"ia" < $"ib")
      .select(cosine_sim($"va", $"vb"), qcosine_sim($"va", $"vb"))
      .as[(Double, Double)].collect()
    rows.foreach { case (c, q) => assert(math.abs(c - q) < 0.01, s"$c vs $q") }
  }

  test("brute-force knn: top-1 matches a driver-side computation") {
    import graft.functions.GraftFunctions._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val got = Similarity.bruteForceKnn(e, e.filter($"vec_id" === 0), k = 1)
      .select("cand_id").as[Long].head()
    val vecs = e.select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val q = vecs.find(_._1 == 0L).get._2
    def qcos(a: Seq[Float], b: Seq[Float]): Double = {
      val qa = a.map(x => math.floor(x.toDouble * 10000).toLong)
      val qb = b.map(x => math.floor(x.toDouble * 10000).toLong)
      val dot = qa.zip(qb).map { case (x, y) => x * y }.sum
      val na = qa.map(x => x * x).sum; val nb = qb.map(x => x * x).sum
      if (na == 0 || nb == 0) 0.0 else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    val want = vecs.filter(_._1 != 0L)
      .map { case (id, v) => (id, qcos(q, v)) }
      .sortBy { case (id, s) => (-s, id) }.head._1
    assert(got == want)
  }

  /** embeddings + planted near-neighbors (sign-flip copies, cos ~0.84) —
    * the same construction DocQueries.augEmb uses for the s2 oracle. */
  private lazy val embAug = {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val probes = e.filter($"vec_id" < 8)
    val copies = (0 until 5).map { j =>
      probes.select(($"vec_id" + lit(10000L * (j + 1))).as("vec_id"),
        transform($"embedding",
          (x, i) => when(i % 13 === j, -x).otherwise(x)).as("embedding"))
    }.reduce(_ unionByName _)
    e.unionByName(copies).cache()
  }

  test("multi-table LSH kNN returns the exact brute-force top-5 on planted neighbors") {
    val queries = embAug.filter($"vec_id" < 8)
    val brute = Similarity.bruteForceKnn(embAug, queries, k = 5)
      .select("query_id", "rank", "cand_id").as[(Long, Int, Long)].collect().toSet
    val lsh = Similarity.lshKnnTables(embAug, queries, k = 5, nBits = 6, nTables = 24)
      .select("query_id", "rank", "cand_id").as[(Long, Int, Long)].collect().toSet
    assert(brute.size == 40)
    assert(lsh == brute)
  }

  test("multi-table embedding near-dup finds every planted pair (recall 1.0 at threshold)") {
    val pairs = Dedup.embeddingNearDup(embAug, "embedding", "vec_id",
      threshold = 0.8, nBits = 4, nTables = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // ground truth: exact all-pairs qcosine over the SAME (tiny) planted
    // family — sign flips hit uneven component energy, so which pairs
    // clear 0.8 is data-dependent; derive it exactly instead of assuming
    import graft.functions.GraftFunctions._
    val fam = embAug.filter($"vec_id" % 10000 < 8)
    val a = fam.select($"vec_id".as("id_a"), $"embedding".as("va"))
    val b = fam.select($"vec_id".as("id_b"), $"embedding".as("vb"))
    val want = a.join(b, $"id_a" < $"id_b")
      .filter(qcosine_sim($"va", $"vb") >= 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(want.size >= 20, s"planted family too sparse: ${want.size}")
    assert(pairs == want,
      s"missing: ${want.diff(pairs)}, extra: ${pairs.diff(want)}")
  }

  test("IVF kNN returns the exact brute-force top-5 on planted neighbors") {
    val queries = embAug.filter($"vec_id" < 8)
    val cents = Ivf.fit(embAug, "embedding", nList = 32)
    assert(cents.length == 32 && cents.head.length == 64)
    // deterministic: refitting yields the identical quantizer
    val cents2 = Ivf.fit(embAug, "embedding", nList = 32)
    assert(cents.zip(cents2).forall { case (a, b) => a.sameElements(b) })
    val brute = Similarity.bruteForceKnn(embAug, queries, k = 5)
      .select("query_id", "rank", "cand_id").as[(Long, Int, Long)].collect().toSet
    val ivf = Ivf.ivfKnn(embAug, queries, k = 5, cents, nProbe = 10)
      .select("query_id", "rank", "cand_id").as[(Long, Int, Long)].collect().toSet
    assert(ivf == brute)
    // and the candidate set is genuinely partial: nProbe/nList of cells
    val cells = embAug.select(Ivf.cellCol($"embedding", cents).as("cell"))
      .groupBy("cell").count().collect()
    assert(cells.length > 6, "quantizer collapsed - probing would be a full scan")
  }

  test("NearestCentroid(s) codegen is cluster-portable: serialization-" +
      "roundtripped expressions evaluate via GENERATED code (executor JVM sim)") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val cents = Ivf.fit(embAug, "embedding", nList = 8)
    def roundtrip[T <: AnyRef](t: T): T = {
      // how an expression actually reaches an executor: Java serialization
      // of the (bound) expression tree inside the serialized plan
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos); oos.writeObject(t); oos.close()
      new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bos.toByteArray))
        .readObject().asInstanceOf[T]
    }
    val in = BoundReference(0, ArrayType(FloatType, containsNull = false), nullable = false)
    val remote = roundtrip(NearestCentroid(in, cents): AnyRef)
      .asInstanceOf[NearestCentroid]
    val remoteN = roundtrip(NearestCentroids(in, cents, nProbe = 3): AnyRef)
      .asInstanceOf[NearestCentroids]
    // GenerateMutableProjection THROWS if codegen fails (no interpreted
    // fallback) — this is the path that broke with a process-local registry
    val proj = GenerateMutableProjection.generate(Seq(remote, remoteN))
    val vecs = embAug.select("embedding").limit(50).collect()
      .map(_.getSeq[Float](0).toArray)
    vecs.foreach { v =>
      val row = new GenericInternalRow(Array[Any](new GenericArrayData(v)))
      val out = proj(row)
      assert(out.getInt(0) == Ivf.nearestIdx(v, cents))
      assert(out.getArray(1).toIntArray().sameElements(Ivf.nearestIdxs(v, cents, 3)))
    }
  }

  test("LSH ANN recall vs brute force is usable and never scores cross-bucket") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = e.filter($"vec_id" < 20)
    val brute = Similarity.bruteForceKnn(e, queries, k = 10)
      .select("query_id", "cand_id").as[(Long, Long)].collect().groupBy(_._1)
    val lsh = Similarity.lshKnn(e, queries, k = 10, nBits = 4)
      .select("query_id", "cand_id").as[(Long, Long)].collect().groupBy(_._1)
    val recalls = brute.keys.toSeq.sorted.map { qid =>
      val b = brute(qid).map(_._2).toSet
      val l = lsh.getOrElse(qid, Array.empty[(Long, Long)]).map(_._2).toSet
      b.intersect(l).size.toDouble / b.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean recall@10 = $mean") // 4-bit LSH, 1/16 of pairs scored
  }
}
