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

  test("lang_id_ngram beats the marker heuristic on held-out sentences") {
    // Held-out sentences (disjoint from the embedded seed paragraphs),
    // including marker-free ones the stopword heuristic cannot classify.
    val heldOut: Seq[(String, String)] = Seq(
      "en" -> "my brother plays football every sunday afternoon near our house",
      "en" -> "green apples taste better when slightly cold",
      "en" -> "could you tell me where i might find a decent bookshop around here",
      "en" -> "strong coffee keeps me awake during long winter nights",
      "es" -> "mi hermano juega al fútbol todos los domingos por la tarde",
      "es" -> "las manzanas verdes saben mejor cuando están un poco frías",
      "es" -> "¿podría decirme dónde encuentro una buena librería por aquí?",
      "es" -> "el café fuerte me mantiene despierto durante las noches largas",
      "de" -> "mein bruder spielt jeden sonntagnachmittag fußball im park",
      "de" -> "grüne äpfel schmecken besser, wenn sie etwas kälter sind",
      "de" -> "könnten sie mir sagen, wo ich hier eine gute buchhandlung finde?",
      "de" -> "starker kaffee hält mich in langen winternächten wach",
      "fr" -> "mon frère joue au football tous les dimanches après-midi",
      "fr" -> "les pommes vertes ont meilleur goût quand elles sont fraîches",
      "fr" -> "pourriez-vous me dire où trouver une bonne librairie par ici ?",
      "fr" -> "un café fort me tient éveillé pendant les longues nuits d'hiver",
      "zh" -> "今天天气很好我们去公园散步吧",
      "ru" -> "сегодня хорошая погода и мы идём гулять в парк")
    val ngramRight = heldOut.count { case (l, s) => TextOps.langIdNgram(s) == l }
    val markerRight = heldOut.count { case (l, s) => TextOps.langId(s) == l }
    assert(ngramRight >= (heldOut.size * 0.9).toInt,
      s"ngram accuracy $ngramRight/${heldOut.size}: " +
        heldOut.map { case (l, s) => s"$l->${TextOps.langIdNgram(s)}" }.mkString(", "))
    assert(ngramRight > markerRight,
      s"ngram ($ngramRight) should beat markers ($markerRight) on held-out text")
    // degenerate inputs stay und
    assert(TextOps.langIdNgram("") == "und")
    assert(TextOps.langIdNgram("12345 --- !!!") == "und")
  }

  test("LangProfile.fit reproduces the embedded seed profiles bit-for-bit") {
    import graft.functions.TextOps.LangProfiles
    val seedsDf = LangProfiles.seedCorpus.toDF("lang", "text")
    val fitted = LangProfile.fit(seedsDf, "text", "lang")
    val got: Map[String, Map[String, Long]] = fitted
      .select("lang", "gram", "rank").as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val want: Map[String, Map[String, Long]] =
      LangProfiles.languages.zip(LangProfiles.profiles).map { case (l, p) =>
        import scala.jdk.CollectionConverters._
        l -> p.asScala.map { case (g, r) => g -> r.longValue() }.toMap
      }.toMap
    assert(got.keySet == want.keySet)
    for (l <- want.keySet)
      assert(got(l) == want(l), s"profile mismatch for $l")
  }

  test("LangProfile.classify matches langIdNgram on every sentence class") {
    import graft.functions.TextOps.LangProfiles
    val seedsDf = LangProfiles.seedCorpus.toDF("lang", "text")
    val fitted = LangProfile.fit(seedsDf, "text", "lang")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sentences = Seq(
      "my brother plays football every sunday afternoon near our house",
      "green apples taste better when slightly cold",
      "mi hermano juega al fútbol todos los domingos por la tarde",
      "las manzanas verdes saben mejor cuando están un poco frías",
      "mein bruder spielt jeden sonntagnachmittag fußball im park",
      "grüne äpfel schmecken besser, wenn sie etwas kälter sind",
      "mon frère joue au football tous les dimanches après-midi",
      "les pommes vertes ont meilleur goût quand elles sont fraîches",
      "今天天气很好我们去公园散步吧",           // CJK pre-gate
      "сегодня хорошая погода и мы идём гулять в парк", // Cyrillic pre-gate
      "",                                       // empty -> und
      "12345 --- !!!",                          // no letters -> und
      "ab",                                     // <3 letters -> und
      "xq zq jq vq kq wq")                      // letters but out-of-profile
    val docs = sentences.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("sid", "text")
    val preds = LangProfile.classify(docs, "text", "sid", fitted,
        langPriority = LangProfiles.languages.toSeq)
      .as[(Long, String)].collect().toMap
    sentences.zipWithIndex.foreach { case (s, i) =>
      assert(preds(i.toLong) == TextOps.langIdNgram(s),
        s"'$s': classify=${preds(i.toLong)} langIdNgram=${TextOps.langIdNgram(s)}")
    }
    // and the distributed path is deterministic under partitioning
    val again = LangProfile.classify(docs.repartition(5), "text", "sid",
        fitted, langPriority = LangProfiles.languages.toSeq)
      .as[(Long, String)].collect().toMap
    assert(again == preds)
    fitted.unpersist()
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

  test("components: chains collapse to the min id; clusters stay separate") {
    // a 5-node chain (diameter test: the min must walk the whole chain),
    // a triangle, an isolated pair — all in one pair list
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L), (5L, 4L), // chain 1-2-3-4-5
      (10L, 11L), (11L, 12L), (10L, 12L),     // triangle
      (20L, 21L)                              // pair
    ).toDF("id_a", "id_b")
    val got = Dedup.components(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    // deterministic under partitioning
    val again = Dedup.components(pairs.repartition(7))
      .as[(Long, Long)].collect().toMap
    assert(again == got)
    // a diameter beyond maxIters fails loudly instead of returning a
    // half-propagated labeling
    val longChain = (1L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      Dedup.components(longChain, maxIters = 3).collect()
    }
    assert(Dedup.components(longChain, maxIters = 40)
      .as[(Long, Long)].collect().forall(_._2 == 1L))
  }

  test("components: convergence count rides the checkpoint job (1 job/round)") {
    // r4 paid 2 ACTIONS per round (eager localCheckpoint + a cached-scan
    // count()); the Observation now carries the changed-count on the
    // checkpoint action itself. Raw Spark-job counts are AQE-stage
    // granular (one propagation round materializes several query-stage
    // jobs), so the crisp regression guard is: components must run ZERO
    // `count` actions — counted via a QueryExecutionListener, which fires
    // once per Dataset action with its name.
    val counts = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        if (funcName == "count") counts.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      val longChain = (1L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      val got = Dedup.components(longChain, maxIters = 40)
        .as[(Long, Long)].collect()
      assert(got.forall(_._2 == 1L))
      Thread.sleep(1500) // listener bus is async
      assert(counts.get() == 0, s"components ran ${counts.get()} count " +
        s"actions over ~29 rounds — the per-round convergence count is back")
    } finally spark.listenerManager.unregister(l)
  }

  test("componentsStar: same labeling as components; log rounds on a deep chain") {
    // identical output contract on the mixed fixture (chain + triangle +
    // isolated pair), deterministic under partitioning
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L), (5L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("id_a", "id_b")
    val want = Dedup.components(pairs).as[(Long, Long)].collect().toMap
    val got = Dedup.componentsStar(pairs).as[(Long, Long)].collect().toMap
    assert(got == want)
    val again = Dedup.componentsStar(pairs.repartition(7))
      .as[(Long, Long)].collect().toMap
    assert(again == got)
    // the algorithmic claim, asserted through the loud-convergence guard:
    // a 64-node chain is diameter 63 (min-label needs 63 rounds — the
    // existing components test shows maxIters=3 fails a 29-chain), but
    // star contraction must finish within 10 rounds (~log2 + slack)
    val chain64 = (1L until 64L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val starLabels = Dedup.componentsStar(chain64, maxIters = 10)
      .as[(Long, Long)].collect()
    assert(starLabels.length == 64 && starLabels.forall(_._2 == 1L))
    assert(Dedup.components(chain64, maxIters = 70)
      .as[(Long, Long)].collect().toMap == starLabels.toMap)
    // self-pairs are dropped, not self-edges in the contraction
    val selfy = Seq((7L, 7L), (8L, 9L)).toDF("id_a", "id_b")
    assert(Dedup.componentsStar(selfy).as[(Long, Long)].collect().toMap ==
      Map(8L -> 8L, 9L -> 8L))
  }

  test("componentsStar: agrees with components on the real near-dup pair graph") {
    val pairs = Dedup.nearDupJaccard(docsAug, "text", "doc_id", threshold = 0.5)
    val a = Dedup.components(pairs).as[(Long, Long)].collect().toMap
    val b = Dedup.componentsStar(pairs).as[(Long, Long)].collect().toMap
    assert(a.nonEmpty && b == a)
  }

  test("hashNearDup salted cell pairing: identical output on a hot-bucket corpus") {
    // exact-dup-heavy corpus: 80 rows share ONE signature (the hot
    // bucket the ROADMAP flagged for image corpora), 40 rows are random
    val hot = (0L until 80L).map(i => (f"h$i%03d", 0x5A5A5A5A5A5AL))
    val rnd = (0L until 40L).map(i =>
      (f"r$i%03d", graft.audio.AudioSynth.mix64(0xFACE + i)))
    val sigs = (hot ++ rnd).toDF("id", "sig")
    val plain = Dedup.hashNearDup(sigs, maxHamming = 3)
      .as[(String, String, Int)].collect().toSet
    val salted = Dedup.hashNearDup(sigs, maxHamming = 3, salts = 8)
      .as[(String, String, Int)].collect().toSet
    assert(plain.nonEmpty && salted == plain,
      s"missing: ${plain.diff(salted).take(5)}, extra: ${salted.diff(plain).take(5)}")
    // hot group of 80 pairs all-to-all: 3160 pairs at hamming 0
    assert(plain.count(_._3 == 0) == 80 * 79 / 2)
    // the candidate aggregation is keyed by the salt cells
    val aggs = Dedup.hashNearDup(sigs, maxHamming = 3, salts = 8)
      .queryExecution.analyzed.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.groupingExpressions.exists(_.references.exists(_.name == "_ca")) => a
      }
    assert(aggs.nonEmpty, "no cell-keyed candidate aggregation")
    // determinism under repartitioning
    val again = Dedup.hashNearDup(sigs.repartition(11), maxHamming = 3, salts = 8)
      .as[(String, String, Int)].collect().toSet
    assert(again == plain)
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

  test("incremental embedding near-dup == batch on delta-touching pairs (r6)") {
    // the d9 shape at unit scale: corpus buckets stored (materialized),
    // delta = exact + perturbed copies; incremental output must equal
    // the batch operator over the union, restricted to delta pairs
    val corpus = embAug
    val delta = embAug.filter($"vec_id" % 3 === 0)
      .select(($"vec_id" + 500000).as("vec_id"), $"embedding")
    val corpusBuckets = Dedup.embeddingBuckets(corpus, "embedding", "vec_id",
      nBits = 4, nTables = 16).localCheckpoint(true)
    val inc = Dedup.embeddingNearDupIncremental(corpusBuckets, corpus, delta,
      "embedding", "vec_id", threshold = 0.8, nBits = 4, nTables = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val batch = Dedup.embeddingNearDup(corpus.unionByName(delta),
      "embedding", "vec_id", threshold = 0.8, nBits = 4, nTables = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      .filter(p => p._1 >= 500000 || p._2 >= 500000)
    assert(inc.nonEmpty)
    assert(inc == batch, s"missing: ${batch.diff(inc)}, extra: ${inc.diff(batch)}")
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

  test("bulk IVF kNN (shuffled joins) matches the broadcast variant exactly") {
    // ivfKnnBulk must be a pure plan-shape change: same index, same probe
    // and re-rank semantics, bit-identical output — here on a query set
    // 6x the broadcast test's (every planted-family vector).
    val queries = embAug.filter($"vec_id" < 8 || $"vec_id" >= 10000)
    val cents = Ivf.fit(embAug, "embedding", nList = 32)
    val bulk = Ivf.ivfKnnBulk(embAug, queries, k = 5, cents, nProbe = 10)
      .select("query_id", "rank", "cand_id", "score_x1e6")
      .as[(Long, Int, Long, Long)].collect().toSet
    val bcast = Ivf.ivfKnn(embAug, queries, k = 5, cents, nProbe = 10)
      .select("query_id", "rank", "cand_id", "score_x1e6")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(bulk == bcast)
    assert(bulk.map(_._1).size == 48, "expected all 48 family queries answered")
  }

  test("persisted IVF index: search matches the in-memory path bit-for-bit, bulk included") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    val cents = Ivf.fit(embAug, "embedding", nList = 32)
    val written = IvfIndex.write(embAug, dir, nList = 32)
    assert(written.cents.zip(cents).forall { case (a, b) => a.sameElements(b) },
      "persisted quantizer differs from the deterministic fit")
    val idx = IvfIndex.open(spark, dir)
    assert(idx.nList == 32)
    assert(idx.cents.zip(cents).forall { case (a, b) => a.sameElements(b) },
      "reopened centroids differ from the written ones")

    val queries = embAug.filter($"vec_id" < 8)
    val want = Ivf.ivfKnn(embAug, queries, k = 5, cents, nProbe = 10)
      .select("query_id", "rank", "cand_id", "score_x1e6")
      .as[(Long, Int, Long, Long)].collect().toSet
    val got = IvfIndex.knn(spark, idx, queries, k = 5, nProbe = 10)
      .select("query_id", "rank", "cand_id", "score_x1e6")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(got == want)
    val bulk = IvfIndex.knnBulk(spark, idx, queries, k = 5, nProbe = 10)
      .select("query_id", "rank", "cand_id", "score_x1e6")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(bulk == want)
  }

  test("persisted IVF index: micro-batch append == from-scratch assignment of the union") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx_app").toString
    val base = embAug.filter($"vec_id" % 3 =!= 0)
    val idx = IvfIndex.write(base, dir, nList = 32)
    // three micro-batch appends under the frozen quantizer — the
    // foreachBatch streaming-ingest shape
    Seq(0, 3, 6).foreach { r =>
      IvfIndex.append(idx, embAug.filter($"vec_id" % 9 === r))
    }
    val queries = embAug.filter($"vec_id" < 8)
    // ground truth: the in-memory path over the FULL union with the
    // SAME (base-fitted) centroids — append must be invisible to search
    val want = Ivf.ivfKnn(embAug, queries, k = 5, idx.cents, nProbe = 10)
      .select("query_id", "rank", "cand_id", "score_x1e6")
      .as[(Long, Int, Long, Long)].collect().toSet
    val got = IvfIndex.knn(spark, IvfIndex.open(spark, dir), queries,
        k = 5, nProbe = 10)
      .select("query_id", "rank", "cand_id", "score_x1e6")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(got == want)
    assert(got.map(_._1).size == 8)
  }

  test("persisted IVF index: probes read ONLY probed partitions (pruned scan, by metric)") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec        => q +: allNodes(q.plan)
      case other                    => other +: other.children.flatMap(allNodes)
    }
    val dir = java.nio.file.Files.createTempDirectory("ivfidx_prune").toString
    IvfIndex.write(embAug, dir, nList = 32)
    val idx = IvfIndex.open(spark, dir)
    // one query, three probes: at most 3 of the >6 non-empty cells read
    val one = embAug.filter($"vec_id" === 0)
    val cents = idx.cents
    val want = Ivf.ivfKnn(embAug, one, k = 5, cents, nProbe = 3)
      .select("query_id", "rank", "cand_id", "score_x1e6")
      .as[(Long, Int, Long, Long)].collect().toSet
    val df = IvfIndex.knn(spark, idx, one, k = 5, nProbe = 3)
    val got = df.select("query_id", "rank", "cand_id", "score_x1e6")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(got == want)

    val cellDirs = new java.io.File(s"$dir/cells").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).length
    assert(cellDirs > 6, s"quantizer collapsed: $cellDirs cell dirs")
    val totalFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/cells"))
      .filter(p => p.toString.endsWith(".parquet")).count()
    val scans = allNodes(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("ivfidx_prune")) => f
    }
    // both index reads (candidate formation + vector rehydration) prune
    assert(scans.size >= 2, s"expected 2 index scans, got ${scans.size}")
    scans.foreach { f =>
      assert(f.partitionFilters.nonEmpty,
        s"no partition filter pushed into the index scan:\n$f")
      assert(f.metrics("numFiles").value < totalFiles,
        s"scan read ${f.metrics("numFiles").value} of $totalFiles files — pruning vacuous")
    }
  }

  test("Tuning: helper-chosen parameters meet their target recall on the planted fixture") {
    // analytic S-curves: monotone in the amplification parameter and
    // consistent with the stated formula at the endpoints
    assert(Tuning.minhashRecall(1.0, 32, 8) == 1.0)
    assert(Tuning.minhashRecall(0.7, 32, 16) > Tuning.minhashRecall(0.7, 32, 8))
    assert(Tuning.hyperplaneRecall(0.9, 4, 16) > Tuning.hyperplaneRecall(0.9, 4, 8))

    // MinHash: chosen bands must clear the target at the threshold and the
    // next-more-selective divisor must not (the choice is tight)
    val bands = Tuning.minhashBandsFor(k = 32, threshold = 0.7, targetRecall = 0.95)
    assert(Tuning.minhashRecall(0.7, 32, bands) >= 0.95)
    val tighter = (1 until bands).filter(32 % _ == 0)
    assert(tighter.forall(b => Tuning.minhashRecall(0.7, 32, b) < 0.95),
      s"bands=$bands not minimal")

    // Hyperplane LSH: chosen tables recover EVERY planted embedding pair
    // at the d4 threshold (planted cosines ~0.84-0.9; ask for recall at
    // threshold 0.8 => per-pair candidate prob >= 0.95, and the exact
    // verify keeps precision)
    val nTables = Tuning.hyperplaneTablesFor(nBits = 4, threshold = 0.85,
      targetRecall = 0.97)
    assert(Tuning.hyperplaneRecall(0.85, 4, nTables) >= 0.97)
    val pairs = Dedup.embeddingNearDup(embAug, "embedding", "vec_id",
      threshold = 0.8, nBits = 4, nTables = nTables)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    import graft.functions.GraftFunctions._
    val fam = embAug.filter($"vec_id" % 10000 < 8)
    val a = fam.select($"vec_id".as("id_a"), $"embedding".as("va"))
    val b = fam.select($"vec_id".as("id_b"), $"embedding".as("vb"))
    val want = a.join(b, $"id_a" < $"id_b")
      .filter(qcosine_sim($"va", $"vb") >= 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // amplified OR-recall 0.97/pair on ~30 pairs: tolerate at most one miss
    assert(want.diff(pairs).size <= math.max(1, (want.size * 0.03).toInt),
      s"missed ${want.diff(pairs).size} of ${want.size} planted pairs with $nTables tables")

    // IVF: empirically chosen nProbe recovers the true top-1 for >= 95%
    // of the sampled queries when actually probing
    val cents = Ivf.fit(embAug, "embedding", nList = 32)
    val corpus = embAug.orderBy("vec_id").limit(400)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val queries = embAug.filter($"vec_id" < 8)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val nProbe = Tuning.ivfProbesFor(corpus, queries, cents, targetRecall = 0.95)
    assert(nProbe >= 1 && nProbe <= 32)
    val hits = queries.count { q =>
      val probed = Ivf.nearestIdxs(q, cents, nProbe).toSet
      var best: Array[Float] = null; var bestC = -2.0
      corpus.foreach { v =>
        if (!java.util.Arrays.equals(v, q)) {
          val c = {
            var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
            while (i < v.length) {
              dot += q(i).toDouble * v(i); na += q(i).toDouble * q(i)
              nb += v(i).toDouble * v(i); i += 1
            }
            if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
          }
          if (c > bestC) { bestC = c; best = v }
        }
      }
      probed.contains(Ivf.nearestIdx(best, cents))
    }
    assert(hits >= math.ceil(queries.length * 0.95).toInt,
      s"nProbe=$nProbe recovered only $hits/${queries.length} true top-1 cells")
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

  test("PQ: compressed ADC top-k == brute force; deterministic; codegen-portable") {
    val queries = embAug.filter($"vec_id" < 8)
    val books = Pq.fit(embAug, "embedding", m = 8, k = 16)
    // deterministic codebooks: same fit twice is bit-identical
    val books2 = Pq.fit(embAug, "embedding", m = 8, k = 16)
    assert(books.flatten.flatten.toSeq == books2.flatten.flatten.toSeq)

    val pq = Pq.adcKnn(embAug, queries, k = 5, books, topC = 128)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val brute = Similarity.bruteForceKnn(embAug, queries, k = 5)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(pq == brute, "PQ+re-rank diverged from exact brute force")
    // stable under repartitioning
    val again = Pq.adcKnn(embAug.repartition(9), queries, k = 5, books,
      topC = 128).orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(again == pq)

    // hand math: encode/lut/adc agree — ADC(v, v) is the quantization
    // distortion, which must be the MINIMUM over all corpus codes for
    // most vectors (sanity of the table construction)
    val v = embAug.orderBy("vec_id").limit(1).select("embedding")
      .collect().head.getSeq[Float](0).toArray
    val codes = Pq.encode(v, books)
    assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 16))
    val lut = Pq.lut(v, books)
    assert(lut.length == 8 * 16)
    val self = Pq.adc(codes, lut)
    val manual = (0 until 8).map(b => lut(b * 16 + codes(b))).sum
    assert(math.abs(self - manual) < 1e-6)

    // cluster portability: the codebooks ride a serialization roundtrip
    // and still evaluate via GENERATED code
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def roundtrip[T <: AnyRef](t: T): T = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos); oos.writeObject(t); oos.close()
      new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bos.toByteArray))
        .readObject().asInstanceOf[T]
    }
    val in = BoundReference(0, ArrayType(FloatType, containsNull = false), nullable = false)
    val remote = roundtrip(PqEncode(in, books): AnyRef).asInstanceOf[PqEncode]
    val proj = GenerateMutableProjection.generate(Seq(remote))
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(v.map(x => x: Any))))
    val out = proj(row).getArray(0).toIntArray()
    assert(out.toSeq == codes.toSeq)
  }

  test("IVF-PQ: composed coarse+compressed path == brute force, deterministic") {
    val queries = embAug.filter($"vec_id" < 8)
    val cents = Ivf.fit(embAug, "embedding", nList = 32)
    val books = Pq.fit(embAug, "embedding", m = 8, k = 16)
    val ivfpq = Pq.ivfPqKnn(embAug, queries, k = 5, cents, books,
      nProbe = 10, topC = 128)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val brute = Similarity.bruteForceKnn(embAug, queries, k = 5)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(ivfpq == brute, "IVF-PQ diverged from exact brute force")
    val again = Pq.ivfPqKnn(embAug.repartition(7), queries, k = 5, cents,
      books, nProbe = 10, topC = 128)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(again == ivfpq)
  }

  test("componentsIncremental == full recompute over the union edge set") {
    def pairsOf(ps: Seq[(Long, Long)]) = ps.toDF("id_a", "id_b")
    // old world: {1,2,3} (canon 1), {10,11} (canon 10), {20,21} (canon 20)
    val oldPairs = pairsOf(Seq((1L,2L), (2L,3L), (10L,11L), (20L,21L)))
    val labels = Dedup.components(oldPairs)
    // delta exercises every topology at once:
    //  - merge two existing clusters          (3,10)
    //  - brand-new cluster of unseen ids      (100,101)
    //  - new id joins an existing cluster     (21,200)
    //  - internal edge (no-op)                (1,3)
    val delta = pairsOf(Seq((3L,10L), (100L,101L), (21L,200L), (1L,3L)))
    val inc = Dedup.componentsIncremental(labels, delta)
      .as[(Long, Long)].collect().toMap
    val full = Dedup.components(oldPairs.unionByName(delta))
      .as[(Long, Long)].collect().toMap
    assert(inc == full, s"inc=$inc full=$full")
    assert(inc(11L) == 1L && inc(200L) == 20L && inc(100L) == 100L)
    // no-op delta (all edges internal) returns the labeling unchanged
    val noop = Dedup.componentsIncremental(labels, pairsOf(Seq((1L,2L))))
      .as[(Long, Long)].collect().toMap
    assert(noop == labels.as[(Long, Long)].collect().toMap)
    // determinism under repartitioning
    val again = Dedup.componentsIncremental(labels, delta.repartition(5))
      .as[(Long, Long)].collect().toMap
    assert(again == inc)
    // and the real near-dup graph: split d2's pair set in half, fold the
    // second half incrementally — equal to the full labeling
    val allPairs = Dedup.nearDupJaccard(docsAug, "text", "doc_id", threshold = 0.5)
      .select("id_a", "id_b").localCheckpoint(true)
    val half = allPairs.filter(xxhash64(col("id_a"), col("id_b")) % 2 === 0)
    val rest = allPairs.exceptAll(half)
    val incReal = Dedup.componentsIncremental(
      Dedup.components(half), rest).as[(Long, Long)].collect().toMap
    val fullReal = Dedup.components(allPairs).as[(Long, Long)].collect().toMap
    assert(incReal == fullReal)
  }
}
