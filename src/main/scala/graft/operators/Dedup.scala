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

  /** How candidate pairs get their payloads (text/vector) back after the
    * id-only candidate generation:
    *
    *  - [[Rehydration.Direct]]: plain id-equi-joins of the pair set with
    *    the payload table — ONE pass over the corpus, but the payload
    *    column rides the join shuffle. Right when the corpus comfortably
    *    fits a shuffle (fixture/small scale).
    *  - [[Rehydration.SemiJoin]]: broadcast semi-join reduction — the
    *    candidate ID set (tiny) is broadcast to filter the payload in its
    *    scan stage, so only candidate rows' payload ever reaches a join.
    *    Costs two extra payload scans + a persisted candidate stage;
    *    the ONLY shape that survives a 100 TB corpus (a direct join there
    *    is a corpus-sized payload exchange per side — it filled this
    *    sandbox's disk at sf1 in r3).
    *  - [[Rehydration.Auto]] (default): Direct when the payload side's
    *    plan-stats size is at most [[DirectRehydrateMaxBytes]], SemiJoin
    *    otherwise. Output is IDENTICAL either way (parity-tested); only
    *    the execution shape differs.
    *
    * CACHE LIFECYCLE (shared by nearDupJaccard / embeddingNearDup /
    * audioNearDupShift / the incremental variants): the SemiJoin path
    * persists the candidate pair set (referenced three times — without
    * the stage boundary each reference would re-run the whole
    * signature/DSP scan). By default the persist's lifetime is the
    * caller's — MEMORY_AND_DISK entries are LRU-evicted and recompute
    * correctly, so repeated calls in a long-lived session cost cache
    * metadata, not correctness. A long-lived curation SERVICE wraps each
    * pass in [[withCandidates]], which unpersists every candidate stage
    * registered during the pass on exit (CacheLifecycleSpec pins that
    * nothing survives). The Direct path persists nothing. */
  sealed trait Rehydration
  object Rehydration {
    case object Auto extends Rehydration
    case object Direct extends Rehydration
    case object SemiJoin extends Rehydration
  }

  /** SCOPED cache lifecycle (r6, upgrading the documented LRU-only
    * policy): every candidate-stage persist created while a
    * [[withCandidates]] scope is active is registered with the scope and
    * unpersisted when it exits — a long-lived curation service wraps
    * each pass and leaves the block manager exactly as it found it
    * (CacheLifecycleSpec pins that). Outside a scope the behavior is
    * unchanged (caller-owned lifetime, LRU eviction, documented above).
    * Actions on the returned frames must run INSIDE the scope: after
    * exit they stay CORRECT but recompute the candidate stage. */
  private val cacheScope =
    new scala.util.DynamicVariable[Option[scala.collection.mutable.ArrayBuffer[DataFrame]]](None)

  private def persistCandidates(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cacheScope.value.foreach(_ += p)
    p
  }

  def withCandidates[T](f: => T): T = {
    val buf = scala.collection.mutable.ArrayBuffer[DataFrame]()
    try cacheScope.withValue(Some(buf))(f)
    finally buf.foreach(_.unpersist(blocking = false))
  }

  /** Auto threshold: payloads up to this plan-stats size rehydrate by
    * direct join. 1 GiB — a trivially cheap shuffle on any cluster, far
    * below any size where the semi-join reduction's two extra scans pay
    * for themselves. */
  val DirectRehydrateMaxBytes: Long = 1L << 30

  private def choosesDirect(payload: DataFrame, strategy: Rehydration): Boolean =
    strategy match {
      case Rehydration.Direct => true
      case Rehydration.SemiJoin => false
      case Rehydration.Auto =>
        payload.queryExecution.optimizedPlan.stats.sizeInBytes
          .isValidLong && payload.queryExecution.optimizedPlan.stats.sizeInBytes
          .toLong <= DirectRehydrateMaxBytes
    }

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
                 k: Int = 32, bands: Int = 16): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    // Band on (id, bhash) ONLY — document text must never ride the LSH
    // candidate shuffle (at 100 TB that is `bands`× copies of the corpus
    // through one exchange); texts are joined back by id afterwards.
    val banded = df
      .select(col(idCol).as("id"), min_hash(col(textCol), lit(k)).as("sig"))
      .select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * r + 1, lit(r)), b))).as(Seq("band", "bhash")))
    // GroupBy-bucket pairing instead of a banded self-join: one min_hash
    // scan of the corpus (the join form signed every document twice and
    // re-evaluated the signature in inferred IsNotNull filters — see
    // audioNearDupShift), and the per-bucket pair semantics are identical.
    banded.groupBy(col("band"), col("bhash"))
      .agg(collect_list(col("id")).as("xs"))
      .select(col("bhash"), explode(col("xs")).as("id_a"), col("xs"))
      .select(col("id_a"), explode(filter(col("xs"), y =>
        col("bhash").isNotNull && col("id_a") < y)).as("id_b"))
      .distinct()
  }

  /** MinHash-LSH near-dup detection with exact n-gram-Jaccard verification.
    * Verification touches only the deduplicated LSH candidate PAIRS: texts
    * are rehydrated by two id-joins after the candidate set is distinct, so
    * the only exchanges carrying text are keyed by id (size O(corpus)), not
    * by band (size O(corpus x bands)).
    *
    * PRECONDITION: `idCol` must be unique per row (duplicate ids would
    * multiply rehydrated pairs). The rehydration side is defensively
    * deduplicated so a violated precondition degrades to arbitrary-text-
    * per-id rather than duplicated output rows.
    *
    * Output schema note (changed in r2, kept stable since): the verified
    * similarity column is `jaccard_x1e4` (floored long; integer-exact
    * across engines) and the default is bands=16 — callers of the r1
    * `jaccard` double column / bands=8 default must update. */
  def nearDupJaccard(df: DataFrame, textCol: String, idCol: String,
                     threshold: Double = 0.7, k: Int = 32, bands: Int = 16,
                     rehydration: Rehydration = Rehydration.Auto): DataFrame = {
    val texts = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .dropDuplicates("id")
    val direct = choosesDirect(texts, rehydration)
    // SemiJoin: materialized stage boundary + broadcast semi-join
    // reduction — only candidate rows' text ever reaches a join (a direct
    // join at corpus scale shuffles+sorts the whole text column for a
    // dup-rate-sized pair set), and without the persist the three
    // references below would re-run the signature scan. Direct: the pair
    // set is referenced once, so no persist and one corpus pass total
    // (see [[Rehydration]] for the trade and the cache lifecycle).
    val pairs0 = minhashLsh(df, textCol, idCol, k, bands)
    val pairs = if (direct) pairs0 else persistCandidates(pairs0)
    // r7: semi path reduces ONCE on both sides' ids (one corpus pass, not
    // one per side — the audioNearDupShift one-pass-hydration rationale)
    val hydrated = if (direct) texts else persistCandidates(
      texts.join(broadcast(pairs.select(col("id_a").as("id"))
          .unionByName(pairs.select(col("id_b").as("id"))).distinct()),
        Seq("id"), "leftsemi"))
    def side(s: String, out: String) =
      hydrated.select(col("id").as(s), col("text").as(out))
    pairs
      .join(side("id_a", "text_a"), "id_a")
      .join(side("id_b", "text_b"), "id_b")
      .withColumn("jaccard", jaccard_sim(col("text_a"), col("text_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"),
        floor(col("jaccard") * 1e4).cast("long").as("jaccard_x1e4"))
  }

  /** INCREMENTAL near-dup: the pairs a DELTA introduces against an
    * existing corpus — the append-only case (a daily ingest batch checked
    * against everything already ingested) where re-pairing corpus x
    * corpus would redo quadratic work for a sliver of new rows. The
    * corpus pays ONE signature scan; candidates come from joining the
    * banded buckets against the BROADCAST banded delta (delta-sized,
    * never corpus-sized), so corpus-corpus pairs cannot form. The verify
    * stage is [[nearDupJaccard]]'s exact-Jaccard on rehydrated candidate
    * texts (always the semi-join reduction: the corpus here is by
    * definition the big side). On a corpus whose every duplicate involves
    * the delta, the output equals the batch operator's — exactly what the
    * d8 oracle states. */
  def nearDupJaccardIncremental(corpus: DataFrame, delta: DataFrame,
      textCol: String, idCol: String, threshold: Double = 0.7,
      k: Int = 32, bands: Int = 16): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    def banded(df: DataFrame) = df
      .select(col(idCol).as("id"), min_hash(col(textCol), lit(k)).as("sig"))
      .select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * r + 1, lit(r)), b)))
          .as(Seq("band", "bhash")))
    val db = banded(delta)
    val cands0 = banded(corpus).unionByName(db)
      .join(broadcast(db.withColumnRenamed("id", "id_d")), Seq("band", "bhash"))
      .filter(col("id") =!= col("id_d"))
      // delta-delta pairs arise in both join orders: normalize + distinct
      .select(least(col("id"), col("id_d")).as("id_a"),
        greatest(col("id"), col("id_d")).as("id_b"))
      .distinct()
    val texts = corpus.select(col(idCol).as("id"), col(textCol).as("text"))
      .unionByName(delta.select(col(idCol).as("id"), col(textCol).as("text")))
      .dropDuplicates("id")
    // r7: the Rehydration.Auto discipline, extended to the incremental
    // path — a tiny corpus (fixture scale) takes the DIRECT join (no
    // persist, no broadcast id set; the pair set is referenced once), a
    // real corpus takes the semi-join reduction with ONE-PASS hydration
    // (one corpus text scan for both pair sides instead of one per
    // side — see audioNearDupShift). Output identical either way, like
    // nearDupJaccard's own Auto switch.
    val direct = choosesDirect(texts, Rehydration.Auto)
    val cands = if (direct) cands0 else persistCandidates(cands0)
    val hydrated = if (direct) texts else persistCandidates(
      texts.join(broadcast(cands.select(col("id_a").as("id"))
          .unionByName(cands.select(col("id_b").as("id"))).distinct()),
        Seq("id"), "leftsemi"))
    def side(s: String, out: String) =
      hydrated.select(col("id").as(s), col("text").as(out))
    cands
      .join(side("id_a", "text_a"), "id_a")
      .join(side("id_b", "text_b"), "id_b")
      .withColumn("jaccard", jaccard_sim(col("text_a"), col("text_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"),
        floor(col("jaccard") * 1e4).cast("long").as("jaccard_x1e4"))
  }

  /** Duplicate-CLUSTER canonicalization: connected components over an
    * undirected near-dup pair list — every id is assigned the MINIMUM id
    * reachable through the pair graph, i.e. the canonical representative
    * a curation pass keeps (pairs alone don't answer "which copy
    * survives?" once duplicates chain A~B~C).
    *
    * Iterative min-label propagation, the standard Spark shape for
    * components (GraphX/GraphFrames do the same under the hood): each
    * round joins the edge list with current labels and takes the
    * neighborhood minimum — O(E) shuffle per round, rounds bounded by the
    * component diameter (dup clusters are shallow; for DEEP graphs use
    * [[componentsStar]], whose round count is logarithmic in component
    * size instead of linear in diameter; `maxIters` guards
    * pathological chains and non-convergence FAILS loudly rather than
    * returning a half-propagated labeling). Deterministic: min() over a
    * set has no ordering sensitivity. Intermediate labels are persisted
    * per round and unpersisted eagerly.
    *
    * Output: (id, canonical_id) for every id that appears in a pair —
    * rows not in any pair are their own canonical id by definition and
    * are not emitted (join the corpus with a coalesce to materialize the
    * full keep-list). */
  /** Quality-aware canonical selection — the step between clustering and
    * dropping that a real pipeline runs: per duplicate cluster
    * ([[components]]/[[componentsStar]] output), keep the member with the
    * HIGHEST quality score (ties -> lowest id), not the lowest id. Two
    * bounded shuffles on the cluster label (per-cluster argmax + the
    * mapping join); quality rides a plain id join, so any scoring column
    * (length, language confidence, model score) plugs in. Returns
    * (id, keep_id) for every clustered id. */
  def keepBest(labels: DataFrame, quality: DataFrame, idCol: String,
               qualityCol: String, labelCol: String = "canonical_id"): DataFrame = {
    val withQ = labels
      .join(quality.select(col(idCol).as("id"), col(qualityCol).as("_q")), "id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(labelCol)).orderBy(col("_q").desc, col("id"))
    val best = withQ.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(labelCol), col("id").as("keep_id"))
    withQ.join(best, labelCol).select(col("id"), col("keep_id"))
  }

  /** INCREMENTAL cluster maintenance — the companion of the incremental
    * near-dup operators: fold a batch of NEW pairs into an existing
    * (id, canonical_id) labeling without re-running components over the
    * full (corpus-sized) edge set. New edges are projected onto the
    * QUOTIENT graph — endpoints replaced by their current labels,
    * unlabeled ids standing for themselves — components runs on that
    * graph (sized by the TOUCHED clusters plus the delta, never the
    * corpus), and the relabeling composes back over the old labeling
    * with one label-keyed join. Because every old canonical is its
    * cluster's minimum and quotient components takes the min of mins,
    * the result equals [[components]] over the UNION edge set
    * (spec-pinned equality on merge/new/join-existing topologies). */
  def componentsIncremental(labels: DataFrame, newPairs: DataFrame,
      idA: String = "id_a", idB: String = "id_b",
      maxIters: Int = 25): DataFrame = {
    def lab(side: String) = labels
      .select(col("id").as(side), col("canonical_id").as(side + "_l"))
    val quotientPairs = newPairs
      .join(lab(idA), Seq(idA), "left")
      .join(lab(idB), Seq(idB), "left")
      .select(coalesce(col(idA + "_l"), col(idA)).as("id_a"),
        coalesce(col(idB + "_l"), col(idB)).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .localCheckpoint(true) // referenced by components' rounds AND below
    // all new pairs internal to existing clusters: nothing to relabel
    if (quotientPairs.isEmpty) return labels
    val q = components(quotientPairs, maxIters = maxIters)
    val relabeled = labels
      .join(q.select(col("id").as("canonical_id"),
        col("canonical_id").as("_newc")), Seq("canonical_id"), "left")
      .select(col("id"), coalesce(col("_newc"), col("canonical_id")).as("canonical_id"))
    // ids that first appear in the delta: their quotient node is the id
    // itself; absent from the quotient result => their own canonical
    val newIds = newPairs.select(col(idA).as("id"))
      .unionByName(newPairs.select(col(idB).as("id")))
      .distinct()
      .join(labels.select("id"), Seq("id"), "left_anti")
    val newRows = newIds
      .join(q, Seq("id"), "left")
      .select(col("id"), coalesce(col("canonical_id"), col("id")).as("canonical_id"))
    relabeled.unionByName(newRows)
  }

  def components(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
                 maxIters: Int = 25): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
      .persist(lvl)
    // Each round's plan references the previous labels TWICE (the
    // neighbor join and the convergence compare), so the LOGICAL PLAN
    // doubles per round — persist caches data but not lineage, and by
    // round ~25 plan analysis alone OOMs. localCheckpoint materializes
    // AND truncates lineage each round (the standard iterative-graph
    // idiom; block-manager storage, ContextCleaner reclaims superseded
    // rounds when their references drop).
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("label")).as("nlabel"))
      // the convergence count rides the CHECKPOINT JOB itself via an
      // Observation (CollectMetrics): one job per round total, where the
      // r4 form paid a second (cached-scan count) job per round. The
      // eager localCheckpoint is a Dataset action, so the observed
      // metric is complete when it returns.
      val obs = org.apache.spark.sql.Observation(s"components-round-$i")
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"),
          (coalesce(col("nlabel"), col("label")) < col("label")).as("_changed"))
        .observe(obs, sum(when(col("_changed"), 1L).otherwise(0L)).as("n_changed"))
        .localCheckpoint(true)
      changed = obs.get("n_changed") match {
        case null => 0L // empty round (no labels at all)
        case n: java.lang.Long => n.longValue()
        case other => other.toString.toLong
      }
      labels = next.drop("_changed")
      i += 1
    }
    edges.unpersist()
    require(changed == 0,
      s"components did not converge in $maxIters rounds — component diameter exceeds the bound; raise maxIters")
    labels.select(col("id"), col("label").as("canonical_id"))
  }

  /** Connected components in O(log n)-ish ROUNDS: alternating
    * large-star / small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC 2014 — public algorithm,
    * re-derived here on DataFrames). Same output contract as
    * [[components]]: (id, canonical_id = minimum id reachable) for every
    * id appearing in a pair.
    *
    * Why a second shape: [[components]] (min-label propagation) pays one
    * O(E) round per unit of component DIAMETER — the right trade for dup
    * clusters, which are shallow, and cheaper per round (one join). A
    * graph with deep chains (link graphs, session stitching, transitive
    * reference closure) makes diameter the bottleneck at 10^12 edges;
    * star contraction converges in O(log^2 n) rounds worst-case
    * (O(log n) observed) regardless of diameter, at ~2x the per-round
    * shuffle cost. Pick by graph shape; both are loud on non-convergence.
    *
    * Each round (edges kept oriented hi > lo, distinct):
    *  - large-star: every node u connects its LARGER neighbors to
    *    m(u) = min(neighborhood of u, u itself);
    *  - small-star: every node u connects its smaller neighbors and
    *    itself to the minimum of its smaller neighborhood.
    * Both steps preserve connectivity and never create self-edges; the
    * unique fixed point is disjoint stars centered at component minima.
    *
    * Convergence is detected by an edge-set signature (count + XOR of
    * per-edge hashes, riding the round's localCheckpoint action via
    * Observation — zero extra jobs), and then PROVEN by a final
    * certificate: every id carries exactly one label and every ORIGINAL
    * pair's endpoints agree — a labeling that passes is a single star per
    * component, centered at the component min (the min can never be a
    * leaf: it would have to be the `hi` of an oriented edge). A signature
    * collision or an early stop cannot slip through the certificate. */
  def componentsStar(pairs: DataFrame, idA: String = "id_a",
                     idB: String = "id_b", maxIters: Int = 25): DataFrame = {
    val orig = pairs
      .select(col(idA).as("a"), col(idB).as("b"))
      .filter(col("a") =!= col("b"))
    def sigOf(i: Int): (org.apache.spark.sql.Observation,
        Column, Column) = {
      val obs = org.apache.spark.sql.Observation(s"components-star-$i")
      (obs, count(lit(1)).as("n_edges"),
        expr("bit_xor(xxhash64(hi, lo))").as("x_edges"))
    }
    def readSig(obs: org.apache.spark.sql.Observation): (Long, Long) = {
      def l(v: Any): Long = v match {
        case null => 0L
        case n: java.lang.Long => n.longValue()
        case other => other.toString.toLong
      }
      (l(obs.get("n_edges")), l(obs.get("x_edges")))
    }
    val (obs0, n0, x0) = sigOf(0)
    var edges = orig
      .select(greatest(col("a"), col("b")).as("hi"),
        least(col("a"), col("b")).as("lo"))
      .distinct()
      .observe(obs0, n0, x0)
      .localCheckpoint(true)
    var sig = readSig(obs0)
    var prev = (-1L, -1L)
    var i = 0
    while (sig != prev && i < maxIters) {
      prev = sig
      // large-star: process every edge from BOTH endpoints; from node u,
      // each strictly larger neighbor v re-attaches to m(u). v > u >= m(u)
      // keeps the (hi, lo) orientation strict with no self-edges.
      val und = edges.select(col("hi").as("u"), col("lo").as("v"))
        .union(edges.select(col("lo").as("u"), col("hi").as("v")))
      val mins = und.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val large = und.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
      // small-star: node hi's smaller neighborhood {lo...} re-attaches
      // (hi included) to its minimum; lo > m on every emitted edge.
      val smins = large.groupBy("hi").agg(min(col("lo")).as("m"))
      val small = large.join(smins, "hi")
        .filter(col("lo") =!= col("m"))
        .select(col("lo").as("hi"), col("m").as("lo"))
        .union(smins.select(col("hi"), col("m").as("lo")))
      val (obs, n, x) = sigOf(i + 1)
      edges = small.distinct().observe(obs, n, x).localCheckpoint(true)
      sig = readSig(obs)
      i += 1
    }
    require(sig == prev,
      s"componentsStar did not converge in $maxIters rounds; raise maxIters")
    val labels = edges.select(col("hi").as("id"), col("lo").as("label"))
      .union(edges.select(col("lo").as("id"), col("lo").as("label")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Fixpoint certificate (two bounded end-of-run jobs, not per-round):
    // unique label per id + label agreement across every original pair.
    val nMulti = labels.groupBy("id").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    val nSplit = orig
      .join(labels.select(col("id").as("a"), col("label").as("la")), "a")
      .join(labels.select(col("id").as("b"), col("label").as("lb")), "b")
      .filter(col("la") =!= col("lb")).count()
    require(nMulti == 0 && nSplit == 0,
      s"componentsStar certificate failed ($nMulti multi-labeled ids, " +
        s"$nSplit split pairs) — converged state is not a star labeling")
    // the persist only serves the certificate's two jobs; the caller's
    // action recomputes labels from the CHECKPOINTED star edges (one tiny
    // distinct) — nothing accumulates in the cache across calls.
    labels.unpersist(false)
    labels.select(col("id"), col("label").as("canonical_id"))
  }

  /** SimHash near-dup: pairs within `maxHamming` of each other. Candidate
    * buckets = the 4 16-bit chunks of the signature (pigeonhole: hamming
    * <= 3 => at least one identical chunk). */
  def simhashNearDup(df: DataFrame, textCol: String, idCol: String,
                     maxHamming: Int = 3): DataFrame =
    hashNearDup(
      df.select(col(idCol).as("id"), sim_hash(col(textCol)).as("sig")),
      maxHamming)

  /** Near-dup pairs over ANY 64-bit signature column (`sigs` = (id, sig))
    * within `maxHamming` bits — shared by text SimHash (d3), image dHash
    * (i4) and video frame-hash (v3). The exact hamming filter inside the
    * group provides precision; candidate generation is complete and never
    * all-pairs, with the bucketing scheme chosen by radius:
    *
    *  - maxHamming <= 4 (SINGLE-CHUNK pigeonhole): buckets are the
    *    maxHamming+1 chunks of the signature — any pair within hamming h
    *    differs in at most h chunks, so shares at least one. Chunk width
    *    >= 12 bits here, so organic (near-uniform) occupancy is n/4096
    *    per bucket and candidate volume stays ~n²·(h+1)/2^13 — fine.
    *
    *  - maxHamming >= 5 (COMBINATION-CHUNK keys, r6 — the i4 scale fix):
    *    the single-chunk scheme degrades as chunks narrow (at h=8, 9
    *    chunks of <= 8 bits give only ~2,300 buckets TOTAL, and the 9th
    *    chunk has width ZERO — a degenerate bucket holding the whole
    *    corpus, i.e. organic candidate growth is literally n²/2). Split
    *    the signature into c = maxHamming+4 chunks instead and key on
    *    every 4-SUBSET of chunk values: a pair within hamming h differs
    *    in at most h chunks, so shares >= c-h = 4 identical chunks, so
    *    some 4-subset key matches — recall stays pigeonhole-complete.
    *    Keys carry 4*(64/c) >= 21 bits (h=8: ~2.6M values per combo), so
    *    expected organic candidate volume drops from ~n²/2 to
    *    ~C(c,4)·n²/2^22 (h=8: ~1e-4·n², a >5000x cut), at the price of
    *    C(c,4) emissions per row (h=8: 495) — a LINEAR-in-n shuffle of
    *    tiny (id, sig, key) rows, the right trade at any corpus size.
    *    Occupancy/volume math is pinned by HashNearDupScaleSpec.
    *
    * One signature scan, one key-shuffle of (id, sig) rows — the payload
    * the signature came from never rides anything. */
  /** The candidate-key columns for a given radius — shared by the batch
    * pairing, the stored key table ([[hashKeys]]) and the incremental
    * path. See [[hashNearDup]] for the scheme and its scale math. */
  private def hashKeyCols(maxHamming: Int): Seq[Column] = {
    val nChunks = maxHamming + 1
    val w = (64 + nChunks - 1) / nChunks
    (0 until nChunks).map { i =>
      val width = math.min(w, 64 - i * w)
      shiftrightunsigned(col("sig"), i * w)
        .bitwiseAND(lit(if (width >= 64) -1L else (1L << width) - 1))
    }
  }

  /** The EXPLODED candidate-key table of a signature set: (id, sig,
    * chunk, ckey) — what a pipeline stores NEXT TO the signatures at
    * ingest (the audioFingerprints discipline applied to hash keys), so
    * every later incremental batch joins against stored columns without
    * recomputing a single key. C(maxHamming+4, 4) rows per signature at
    * wide radii — linear, scan-only, parquet-compressed.
    *
    * The wide-radius (>= 5) combination keys come from the native
    * `hash_comb_keys` kernel (r7): identical key values to the former
    * C(c,4)-element expression tree, but one small codegen'd call instead
    * of ~10k expression nodes — the tree form dominated i4/v3/v4's time
    * in optimizer walks and produced projection methods far past the JIT
    * compile threshold (see [[graft.functions.HashCombKeysKernel]]). */
  def hashKeys(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 31,
      s"maxHamming must be in [0, 31], got $maxHamming")
    val keysArray =
      if (maxHamming <= 4) array(hashKeyCols(maxHamming): _*)
      else graft.functions.GraftFunctions.toColumn(
        graft.functions.HashCombKeys(
          graft.functions.GraftFunctions.toExpr(col("sig")), maxHamming))
    // NULL signatures (a hash kernel's null for a corrupt payload)
    // contribute NO candidate keys at either radius — normalized
    // explicitly because the two branches would otherwise disagree (the
    // expression array yields null ELEMENTS, the null-intolerant kernel
    // call a null ARRAY). Pairing never consumed null-key rows anyway
    // (the in-group filters drop them); this pins the stored-key-table
    // row contract to the same rule.
    sigs.filter(col("sig").isNotNull)
      .select(col("id"), col("sig"),
        posexplode(keysArray).as(Seq("chunk", "ckey")))
  }

  /** INCREMENTAL hash near-dup — the i4/v3/d3 analog of
    * [[audioNearDupIncremental]]: a DELTA of new signatures pairs against
    * a corpus whose candidate keys are already materialized
    * ([[hashKeys]], stored at ingest). The corpus pays ONE scan of its
    * stored key table (zero key recomputation, zero decode); candidates
    * come from joining it against the BROADCAST chunk-keyed delta
    * (delta-sized), so corpus-corpus pairs cannot form. Delta-internal
    * pairs come from the batch operator over the delta alone. On a
    * corpus whose every qualifying pair touches the delta the output
    * equals the batch operator's (spec-pinned, and the v4 oracle states
    * it on planted video twins).
    *
    * CONTRACT: `corpusKeys` must be MATERIALIZED columns (a stored
    * table / checkpoint) — the same inferred-IsNotNull rationale as
    * [[audioNearDupIncremental]]'s fingerprint contract. */
  def hashNearDupIncremental(corpusKeys: DataFrame, deltaSigs: DataFrame,
                             maxHamming: Int = 3): DataFrame = {
    val delta = deltaSigs.select(col("id"), col("sig")).localCheckpoint(true)
    val dKeys = hashKeys(delta, maxHamming)
      .select(col("id").as("id_d"), col("sig").as("sig_d"), col("chunk"), col("ckey"))
    val cross = corpusKeys
      .join(broadcast(dKeys), Seq("chunk", "ckey"))
      .filter(col("id") =!= col("id_d"))
      .select(least(col("id"), col("id_d")).as("id_a"),
        greatest(col("id"), col("id_d")).as("id_b"),
        bit_count(col("sig").bitwiseXOR(col("sig_d"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    cross.unionByName(hashNearDup(delta, maxHamming)).distinct()
  }

  def hashNearDup(sigs: DataFrame, maxHamming: Int = 3,
                  salts: Int = 1): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val chunked = hashKeys(sigs, maxHamming)
    // GroupBy-bucket pairing (single signature scan — see minhashLsh).
    // `salts` > 1 engages hot-bucket CELL pairing — a corpus with many
    // identical signatures (exact-dup images, boilerplate text) funnels
    // one (chunk, ckey) bucket into a single task; the cell construction
    // spreads it over salts(salts+1)/2 tasks with a provably identical
    // pair set (see audioNearDupShift, same scheme, AudioSkewSpec).
    val pairs =
      if (salts == 1)
        chunked.groupBy(col("chunk"), col("ckey"))
          .agg(collect_list(struct(col("id"), col("sig"))).as("xs"))
          .select(col("ckey"), explode(col("xs")).as("x"), col("xs"))
          .select(col("x"), explode(filter(col("xs"), y =>
            col("ckey").isNotNull && col("x.id") < y("id"))).as("y"))
          .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
            bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).cast("int").as("hamming"))
      else {
        val withCells = chunked
          .withColumn("_s", pmod(hash(col("id")), lit(salts)).cast("int"))
          .withColumn("_cell", explode(concat(
            transform(sequence(col("_s"), lit(salts - 1)),
              j => struct(col("_s").as("a"), j.as("b"))),
            transform(
              when(col("_s") > 0, sequence(lit(0), col("_s") - 1))
                .otherwise(array().cast("array<int>")),
              i => struct(i.as("a"), col("_s").as("b"))))))
          .withColumn("_ca", col("_cell.a"))
          .withColumn("_cb", col("_cell.b"))
        withCells.groupBy(col("chunk"), col("ckey"), col("_ca"), col("_cb"))
          .agg(collect_list(struct(col("id"), col("sig"), col("_s"))).as("xs"))
          .select(col("ckey"), col("_ca"), col("_cb"),
            explode(col("xs")).as("x"), col("xs"))
          .filter(col("x._s") === col("_ca"))
          .select(col("x"), explode(filter(col("xs"), y =>
            col("ckey").isNotNull &&
              y("_s") === col("_cb") &&
              (col("_ca") =!= col("_cb") || col("x.id") < y("id")))).as("y"))
          .select(least(col("x.id"), col("y.id")).as("id_a"),
            greatest(col("x.id"), col("y.id")).as("id_b"),
            bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).cast("int").as("hamming"))
      }
    pairs.distinct().filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup via quantized cosine over MULTI-TABLE hyperplane-
    * LSH buckets: `nTables` independent tables of `nBits` hyperplanes;
    * candidates = pairs sharing a bucket in ANY table (OR-amplified recall,
    * AND-selective per-table buckets). Only (id, table, bucket) rides the
    * candidate shuffle — vectors are rehydrated by id AFTER the candidate
    * pair set is distinct, then scored exactly with the quantized cosine.
    * At 2^nBits buckets/table the scored-pair count is ~nTables·n²/2^nBits
    * in expectation — never all-pairs. */
  def embeddingNearDup(df: DataFrame, vecCol: String, idCol: String,
                       threshold: Double = 0.90, nBits: Int = 8,
                       nTables: Int = 16,
                       rehydration: Rehydration = Rehydration.Auto): DataFrame = {
    // PRECONDITION: idCol unique per row (see nearDupJaccard) — defended
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .dropDuplicates("id")
    val direct = choosesDirect(vecs, rehydration)
    val banded = vecs.select(col("id"),
      posexplode(vec_lsh_buckets(col("v"), lit(nBits), lit(nTables)))
        .as(Seq("table", "bucket")))
    // GroupBy-bucket pairing (single vec_lsh_buckets scan — see minhashLsh).
    val pairs0 = banded.groupBy(col("table"), col("bucket"))
      .agg(collect_list(col("id")).as("xs"))
      .select(col("bucket"), explode(col("xs")).as("id_a"), col("xs"))
      .select(col("id_a"), explode(filter(col("xs"), y =>
        col("bucket").isNotNull && col("id_a") < y)).as("id_b"))
      .distinct()
    // SemiJoin: only candidate rows' vectors reach a join, the persist is
    // the stage boundary the three references share. Direct: one pass, no
    // persist. See [[Rehydration]] for the switch and cache lifecycle.
    // r7: the semi path reduces ONCE on the union of both sides' ids and
    // persists the hydrated slice (one payload scan, not one per side —
    // the audioNearDupShift one-pass-hydration rationale).
    val pairs = if (direct) pairs0 else persistCandidates(pairs0)
    val hydrated = if (direct) vecs else persistCandidates(
      vecs.join(broadcast(pairs.select(col("id_a").as("id"))
          .unionByName(pairs.select(col("id_b").as("id"))).distinct()),
        Seq("id"), "leftsemi"))
    def side(s: String, out: String) =
      hydrated.select(col("id").as(s), col("v").as(out))
    pairs
      .join(side("id_a", "v_a"), "id_a")
      .join(side("id_b", "v_b"), "id_b")
      .withColumn("cos", qcosine_sim(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), floor(col("cos") * 1e6).as("cos_x1e6"))
  }

  /** The exploded hyperplane-LSH bucket table of a vector set:
    * (id, table, bucket) — stored next to the vectors at ingest (the
    * hashKeys/audioFingerprints discipline), so incremental batches join
    * against stored columns with zero bucket recomputation. */
  def embeddingBuckets(df: DataFrame, vecCol: String, idCol: String,
                       nBits: Int = 8, nTables: Int = 16): DataFrame =
    df.select(col(idCol).as("id"),
      posexplode(vec_lsh_buckets(col(vecCol), lit(nBits), lit(nTables)))
        .as(Seq("table", "bucket")))

  /** INCREMENTAL embedding near-dup — completes the incremental family
    * (text d8, audio c20, hash v4, embeddings here): a DELTA of new
    * vectors pairs against a corpus whose LSH buckets are already
    * materialized ([[embeddingBuckets]]). One stored-bucket scan on the
    * corpus, candidates from the BROADCAST bucketed delta (delta-sized,
    * corpus-corpus pairs cannot form), exact quantized-cosine verify on
    * vectors rehydrated by broadcast semi-join reduction, delta-internal
    * pairs via the batch operator. Same output schema as
    * [[embeddingNearDup]].
    *
    * CONTRACT: `corpusBuckets` must be MATERIALIZED columns (stored
    * table / checkpoint) — the audioNearDupIncremental rationale. */
  def embeddingNearDupIncremental(corpusBuckets: DataFrame, corpusVecs: DataFrame,
      delta0: DataFrame, vecCol: String, idCol: String,
      threshold: Double = 0.90, nBits: Int = 8, nTables: Int = 16): DataFrame = {
    val delta = delta0.select(col(idCol).as("id"), col(vecCol).as("v"))
      .localCheckpoint(true)
    val dBuckets = embeddingBuckets(delta, "v", "id", nBits, nTables)
      .withColumnRenamed("id", "id_d")
    val cross = corpusBuckets
      .join(broadcast(dBuckets), Seq("table", "bucket"))
      .filter(col("id") =!= col("id_d"))
      .select(least(col("id"), col("id_d")).as("id_a"),
        greatest(col("id"), col("id_d")).as("id_b"))
      .distinct()
      // eager: the two broadcast id-set subtrees below would otherwise
      // race the cache fill (the audioNearDupIncremental lesson)
      .localCheckpoint(true)
    val vecs = corpusVecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .unionByName(delta)
      .dropDuplicates("id")
    // r7: Rehydration.Auto discipline (see nearDupJaccardIncremental) —
    // direct join for tiny corpora, semi-join reduction with one-pass
    // hydration for real ones; output identical either way
    val hydrated = if (choosesDirect(vecs, Rehydration.Auto)) vecs
      else persistCandidates(
        vecs.join(broadcast(cross.select(col("id_a").as("id"))
            .unionByName(cross.select(col("id_b").as("id"))).distinct()),
          Seq("id"), "leftsemi"))
    def side(s: String, out: String) =
      hydrated.select(col("id").as(s), col("v").as(out))
    val crossVerified = cross
      .join(side("id_a", "v_a"), "id_a")
      .join(side("id_b", "v_b"), "id_b")
      .withColumn("cos", qcosine_sim(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), floor(col("cos") * 1e6).as("cos_x1e6"))
    crossVerified
      .unionByName(embeddingNearDup(delta, "v", "id", threshold, nBits, nTables))
      .distinct()
  }

  /** AUDIO near-dup: parametric acoustic fingerprints. Each clip is
    * reduced IN THE SCAN STAGE (decode+DSP runs once, bytes never reach a
    * shuffle) to (sr, n_samples, f1, f2) — `pcm_tone_pair` estimates the
    * two strongest tones to integer Hz. The same audio re-encoded through
    * another codec reproduces (sr, n, f1) EXACTLY (the dominant tone's
    * integer argmax has enormous noise margin) while the weaker second
    * tone can fall back to the chirp's swept band and jitter by a few Hz
    * across re-encodes — so the
    * plan joins exactly on (sr, n, f1) (one hash shuffle of tiny
    * fingerprint rows, Dedup.exact discipline; group sizes are bounded by
    * the key's cardinality) and verifies |Δf2| <= tolHz inside the group.
    * Spectrally-global features (band-energy vectors) provably CANNOT do
    * this: tones 1 Hz apart are identical at any fixed band resolution
    * (measured organic cosine 1.000000 at 64 bands). */
  /** TIME-SHIFT-ROBUST audio near-dup: recovers twins with up to `maxTrim`
    * leading samples trimmed (and/or a codec transcode).
    *
    * Two stages, both 100 TB-shaped:
    *
    *  1. CANDIDATES from fingerprints only (bytes never below the join):
    *     the tone estimates are shift-invariant (stationary tones keep
    *     their integer-Hz argmax under a phase shift), so the key is
    *     (sr, f1, duration-bucket) — `n` leaves the exact key (trim
    *     changes it) for a bucket of width > maxTrim, each row emitting
    *     buckets {n/B, n/B + 1} so any pair with |Δn| <= maxTrim shares a
    *     bucket. In-group filters: |Δn| <= maxTrim, |Δf2| <= tolHz (wider
    *     than audioNearDup's: a trim shifts the chirp band f2 falls back
    *     to by rate·trim/sr, up to ~7 Hz on the fixture).
    *  2. EXACT VERIFY on rehydrated candidate bytes: normalized cross-
    *     correlation aligned at the length difference
    *     (`pcm_aligned_corr` >= minCorr). True twins sit near 1 (bounded
    *     by G.711 round-trip SNR ≈ 30 dB => corr ≈ 0.999); unrelated
    *     signals near 0 — so PRECISION comes from the verify, not from
    *     hoping the fingerprint key is collision-free at corpus scale
    *     (expected organic (sr,f1,Δn,Δf2) collisions grow ~n² and WILL
    *     appear at 10^12 rows; each costs one bounded verify, not a wrong
    *     answer).
    *
    * Skew: group sizes are bounded by the (sr, f1, nb, f2b) key
    * cardinality; a corpus of near-identical tones hot-spots one key.
    * `salts` > 1 engages cell pairing (see the candidate-stage comment) —
    * identical output, hot group spread over S(S+1)/2 tasks
    * (AudioSkewSpec: planted one-key corpus, salted == unsalted).
    *
    * The SECOND tone also rides the candidate key as a bucket (width
    * tolHz, adjacent-bucket emission like nb — any |Δf2| <= tolHz pair
    * shares one): measured at sf1, (sr, f1, nb) alone let organic
    * collisions grow ~quadratically with corpus density (c15 scaled 14.7x
    * at 10x rows); the f2 bucket divides candidate groups by the second
    * tone's ~137-bucket cardinality while recall stays exact — the
    * in-group filters and the aligned-corr verify are unchanged, so the
    * OUTPUT is identical, only the pruned candidate volume differs. */
  def audioNearDupShift(clips: DataFrame, maxTrim: Int = 160, tolHz: Int = 16,
                        minCorr: Double = 0.8,
                        idCol: String = "clip_id", bytesCol: String = "bytes",
                        codecCol: String = "codec", srCol: String = "sr_hz",
                        salts: Int = 1): DataFrame = {
    require(maxTrim >= 0, s"maxTrim must be >= 0, got $maxTrim")
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val bucketW = math.max(256, maxTrim + 1)
    val f2W = math.max(tolHz, 1)
    val fp = clips.select(col(idCol).as("id"), col(srCol).as("sr"),
      pcm_sample_count(col(bytesCol), col(codecCol)).as("n"),
      pcm_tone_pair(col(bytesCol), col(codecCol), col(srCol)).as("tones"))
      .select(col("id"), col("sr"), col("n"),
        element_at(col("tones"), 1).as("f1"), element_at(col("tones"), 2).as("f2"))
      .select(col("id"), col("sr"), col("n"), col("f1"), col("f2"),
        explode(array((col("n") / bucketW).cast("int"),
          (col("n") / bucketW).cast("int") + 1)).as("nb"))
      .select(col("id"), col("sr"), col("n"), col("f1"), col("f2"), col("nb"),
        explode(array((col("f2") / f2W).cast("int"),
          (col("f2") / f2W).cast("int") + 1)).as("f2b"))
    // Candidate pairing as groupBy-bucket + in-group pair generation, NOT a
    // fingerprint self-join (ADVICE r3). A self-join runs the
    // pcm_tone_pair DSP scan — the dominant per-clip cost — once per
    // side, and its equi-keys make Catalyst infer IsNotNull constraints
    // that re-evaluate the kernel a second time per row INSIDE a filter
    // below each side (measured 4x total kernel cost). The groupBy form
    // scans the corpus once, shuffles only tiny fingerprint rows with no
    // inferred constraint filters, and pairs within each bucket (the
    // bucket IS the LSH bucket — group sizes carry the same documented
    // skew bound as the join's key groups). Null keys: a null n/f2 makes
    // the lambda predicate null (dropped, matching the join's null-key
    // semantics); null sr/f1 are guarded explicitly on the cheap
    // materialized group-key columns.
    // The candidate pair set is MATERIALIZED (persist) because the verify
    // stage references it three times (the pair probe + two broadcast id
    // sets): without a stage boundary each reference would re-run the
    // whole fingerprint pipeline including the DSP scan. This is the
    // natural two-phase shape of a petabyte near-dup job — candidates are
    // a stage output (a scratch table in a production pipeline); the set
    // is dup-rate-sized, so caching it is cheap at any corpus size.
    // Cache lifecycle: see [[Rehydration]] (shared note). This operator
    // always uses the semi-join reduction — its payload is the BINARY
    // byte column, the fattest in the engine, and the global plan gate
    // (PlanQualitySpec) structurally forbids un-reduced binary shuffles
    // at every scale.
    // `salts` > 1 engages the HOT-KEY path (the Salting discipline, wired
    // end-to-end for pairing): a near-constant-tone corpus concentrates
    // one (sr, f1, nb, f2b) key, and the single-cell groupBy would
    // collect that whole group into ONE task. Cell pairing spreads it:
    // each row (salt s = hash(id) mod S) is replicated into the S cells
    // {(s, j): j >= s} ∪ {(i, s): i < s}, the group key gains (cellA,
    // cellB), and within cell (a, b) pairs are generated with x from
    // salt a and y from salt b (triangular by id when a == b). Every
    // unordered pair lands in EXACTLY one cell — (min(sa,sb),
    // max(sa,sb)) — so the pair set is IDENTICAL to the unsalted plan
    // (spec-asserted) while a hot group of m rows is spread over
    // S(S+1)/2 tasks of ~2m/S rows each. Cost when engaged: S× the
    // (tiny) fingerprint shuffle volume — the payload never rides it.
    val candsRaw =
      if (salts == 1)
        fp.groupBy(col("sr"), col("f1"), col("nb"), col("f2b"))
          .agg(collect_list(struct(col("id"), col("n"), col("f2"))).as("xs"))
          .select(col("sr"), col("f1"), explode(col("xs")).as("x"), col("xs"))
          .select(col("x"), explode(filter(col("xs"), y =>
            col("sr").isNotNull && col("f1").isNotNull &&
              col("x.id") < y("id") &&
              abs(col("x.n") - y("n")) <= maxTrim &&
              abs(col("x.f2") - y("f2")) <= tolHz)).as("y"))
          .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      else {
        val fpS = fp
          .withColumn("_s", pmod(hash(col("id")), lit(salts)).cast("int"))
          .withColumn("_cell", explode(concat(
            transform(sequence(col("_s"), lit(salts - 1)),
              j => struct(col("_s").as("a"), j.as("b"))),
            transform(
              when(col("_s") > 0, sequence(lit(0), col("_s") - 1))
                .otherwise(array().cast("array<int>")),
              i => struct(i.as("a"), col("_s").as("b"))))))
          .withColumn("_ca", col("_cell.a"))
          .withColumn("_cb", col("_cell.b"))
        fpS.groupBy(col("sr"), col("f1"), col("nb"), col("f2b"),
            col("_ca"), col("_cb"))
          .agg(collect_list(struct(col("id"), col("n"), col("f2"), col("_s"))).as("xs"))
          .select(col("sr"), col("f1"), col("_ca"), col("_cb"),
            explode(col("xs")).as("x"), col("xs"))
          .filter(col("x._s") === col("_ca")) // x takes the left role
          .select(col("x"), explode(filter(col("xs"), y =>
            col("sr").isNotNull && col("f1").isNotNull &&
              y("_s") === col("_cb") &&
              (col("_ca") =!= col("_cb") || col("x.id") < y("id")) &&
              abs(col("x.n") - y("n")) <= maxTrim &&
              abs(col("x.f2") - y("f2")) <= tolHz)).as("y"))
          .select(least(col("x.id"), col("y.id")).as("id_a"),
            greatest(col("x.id"), col("y.id")).as("id_b"))
      }
    val cands = persistCandidates(candsRaw.distinct())
    // Rehydration via broadcast SEMI-JOIN REDUCTION, not a direct join of
    // the candidate set against the corpus: a plain join plans as a
    // sort-merge that hash-shuffles AND sorts the ENTIRE byte column to
    // serve a tiny candidate set (measured: filled the sandbox disk with
    // spill at sf1 — at 100 TB it is a corpus-sized shuffle per side).
    // Broadcasting the candidate ID set (ids only, tiny) filters the
    // payload in its scan stage; only the ~|cands| surviving rows' bytes
    // ever reach a join. For candidate sets too large to broadcast whole,
    // the storage-bucketed (SPJ-style) fallback is IMPLEMENTED as
    // ClipTable.readForKeys — per-bucket broadcasts of |cands|/numBuckets
    // each over dir-pruned bucket reads; candidate sets here are
    // dup-rate-sized by design, so the single broadcast is the default.
    val payload = clips.select(col(idCol).as("id"),
      col(bytesCol).as("pbytes"), col(codecCol).as("pcodec"))
    // ONE-PASS hydration (r7): the former per-side semi-join reduction
    // evaluated the payload subtree once per pair side — two full scans
    // of the fattest column in the engine to serve one dup-rate-sized
    // candidate set. Reduce ONCE on the union of both sides' ids and
    // persist the (tiny) hydrated slice; both sides then join against
    // cached blocks. Same rows reach the verify kernel — output
    // identical — at half the payload-scan cost (guide §2.4).
    val ids = cands.select(col("id_a").as("id"))
      .unionByName(cands.select(col("id_b").as("id"))).distinct()
    val hydrated = persistCandidates(
      payload.join(broadcast(ids), Seq("id"), "leftsemi"))
    cands
      .join(hydrated.select(col("id").as("id_a"),
        col("pbytes").as("bytes_a"), col("pcodec").as("codec_a")), "id_a")
      .join(hydrated.select(col("id").as("id_b"),
        col("pbytes").as("bytes_b"), col("pcodec").as("codec_b")), "id_b")
      .filter(pcm_aligned_corr(col("bytes_a"), col("codec_a"),
        col("bytes_b"), col("codec_b")) >= minCorr)
      .select(col("id_a"), col("id_b"))
  }

  /** Ingest-time acoustic fingerprint table: (id, sr, n, f1, f2) — ONE
    * DSP scan per clip, ever. A pipeline stores this next to the bytes at
    * ingest (the decode-once discipline) and every later incremental
    * batch pairs against the fingerprint TABLE without re-decoding a
    * corpus byte — see [[audioNearDupIncremental]]. */
  def audioFingerprints(clips: DataFrame, idCol: String = "clip_id",
      bytesCol: String = "bytes", codecCol: String = "codec",
      srCol: String = "sr_hz"): DataFrame =
    clips.select(col(idCol).as("id"), col(srCol).as("sr"),
        pcm_sample_count(col(bytesCol), col(codecCol)).as("n"),
        pcm_tone_pair(col(bytesCol), col(codecCol), col(srCol)).as("tones"))
      .select(col("id"), col("sr"), col("n"),
        element_at(col("tones"), 1).as("f1"), element_at(col("tones"), 2).as("f2"))

  /** INCREMENTAL audio near-dup (the c15 semantics for an append-only
    * corpus): a DELTA of new clips checked against an existing corpus
    * whose fingerprints are already materialized ([[audioFingerprints]]).
    * The corpus pays ZERO DSP this run — its (id, sr, n, f1, f2) rows
    * join as-is. Bucket adjacency is ONE-SIDED: the corpus keeps a single
    * primary (nb, f2b) bucket per clip and only the small delta emits the
    * 3x3 adjacent buckets {b-1, b, b+1} on BOTH axes — the corpus twin's
    * primary bucket can sit on EITHER side of the delta's (a delta clip
    * longer than its corpus twin across a bucket edge has n_c/W =
    * n_d/W - 1, and symmetrically for f2), so one-sided {b, b+1}
    * emission silently missed the longer-delta direction (ADVICE r5,
    * high; regression pinned by CurationPipelineSpec's longer-delta
    * case). Any pair within (maxTrim, tolHz) now shares a key while the
    * corpus side stays one row per clip (and the bucketed delta
    * broadcasts — the candidate join is delta-sized, 9 rows per clip).
    * Delta-internal pairs come from the batch operator over the delta
    * alone. Verify is the family's exact aligned cross-correlation with
    * bytes rehydrated by broadcast semi-join reduction — only candidate
    * rows' bytes are ever read off the corpus.
    *
    * CONTRACT: `corpusFp` must be MATERIALIZED columns (a table read /
    * checkpoint), which is what "fingerprints stored at ingest" means. A
    * kernel pipeline passed here still returns correct output but pays
    * the r4 inferred-constraint tax: the candidate join's keys would be
    * kernel-computed, and Catalyst's inferred IsNotNull filters re-run
    * the DSP per key column (measured ~5x on c20's first draft). */
  def audioNearDupIncremental(corpusFp: DataFrame, corpusClips: DataFrame,
      delta0: DataFrame, maxTrim: Int = 160, tolHz: Int = 16,
      minCorr: Double = 0.8, idCol: String = "clip_id",
      bytesCol: String = "bytes", codecCol: String = "codec",
      srCol: String = "sr_hz"): DataFrame = {
    require(maxTrim >= 0, s"maxTrim must be >= 0, got $maxTrim")
    // The delta is referenced several times below (its fingerprints, its
    // payload side, and the delta-internal batch pass) — materialize it
    // ONCE, eagerly: a lazy persist still races when the verify stage's
    // broadcast subtrees evaluate concurrently (each broadcast job is a
    // future; two of them can both compute the un-filled cache from
    // scratch, re-running whatever produced the delta — measured 3x cost
    // on c20's in-query twin construction). localCheckpoint(eager=true)
    // is the iterative-algorithm idiom ([[components]]): one job, then
    // every reference reads materialized blocks. Delta-sized by contract
    // (a micro-batch / daily ingest), so the blocks are small at any
    // corpus scale.
    val delta = delta0.localCheckpoint(true)
    val bucketW = math.max(256, maxTrim + 1)
    val f2W = math.max(tolHz, 1)
    val cFp = corpusFp.select(col("id"), col("sr"), col("n"), col("f1"), col("f2"),
      (col("n") / bucketW).cast("int").as("nb"),
      (col("f2") / f2W).cast("int").as("f2b"))
    val dFp = audioFingerprints(delta, idCol, bytesCol, codecCol, srCol)
      .select(col("id").as("id_d"), col("sr"), col("n").as("n_d"),
        col("f1"), col("f2").as("f2_d"))
      .withColumn("nb", explode(array((col("n_d") / bucketW).cast("int") - 1,
        (col("n_d") / bucketW).cast("int"),
        (col("n_d") / bucketW).cast("int") + 1)))
      .withColumn("f2b", explode(array((col("f2_d") / f2W).cast("int") - 1,
        (col("f2_d") / f2W).cast("int"),
        (col("f2_d") / f2W).cast("int") + 1)))
    val cross = cFp.join(broadcast(dFp), Seq("sr", "f1", "nb", "f2b"))
      .filter(col("id") =!= col("id_d") &&
        abs(col("n") - col("n_d")) <= maxTrim &&
        abs(col("f2") - col("f2_d")) <= tolHz)
      .select(least(col("id"), col("id_d")).as("id_a"),
        greatest(col("id"), col("id_d")).as("id_b"))
      .distinct()
      // eager for the same reason as the delta: the two broadcast id-set
      // subtrees below would otherwise race the cache fill and re-run the
      // corpus-fingerprint join each
      .localCheckpoint(true)
    // verify the cross pairs on rehydrated bytes (semi-join reduction:
    // only candidate rows' bytes leave either scan), then add the
    // delta-internal pairs from the batch operator over the small delta
    val payload = corpusClips.select(col(idCol).as("id"),
        col(bytesCol).as("pbytes"), col(codecCol).as("pcodec"))
      .unionByName(delta.select(col(idCol).as("id"),
        col(bytesCol).as("pbytes"), col(codecCol).as("pcodec")))
    // one-pass hydration on the union of both sides' ids — see
    // audioNearDupShift (identical rows reach the verify, one corpus
    // payload scan instead of two)
    val ids = cross.select(col("id_a").as("id"))
      .unionByName(cross.select(col("id_b").as("id"))).distinct()
    val hydrated = persistCandidates(
      payload.join(broadcast(ids), Seq("id"), "leftsemi"))
    val crossVerified = cross
      .join(hydrated.select(col("id").as("id_a"),
        col("pbytes").as("bytes_a"), col("pcodec").as("codec_a")), "id_a")
      .join(hydrated.select(col("id").as("id_b"),
        col("pbytes").as("bytes_b"), col("pcodec").as("codec_b")), "id_b")
      .filter(pcm_aligned_corr(col("bytes_a"), col("codec_a"),
        col("bytes_b"), col("codec_b")) >= minCorr)
      .select(col("id_a"), col("id_b"))
    crossVerified.unionByName(
        audioNearDupShift(delta, maxTrim, tolHz, minCorr,
          idCol, bytesCol, codecCol, srCol))
      .distinct()
  }

  def audioNearDup(clips: DataFrame, tolHz: Int = 8,
                   idCol: String = "clip_id", bytesCol: String = "bytes",
                   codecCol: String = "codec", srCol: String = "sr_hz"): DataFrame = {
    val fp = clips.select(col(idCol).as("id"), col(srCol).as("sr"),
      pcm_sample_count(col(bytesCol), col(codecCol)).as("n"),
      pcm_tone_pair(col(bytesCol), col(codecCol), col(srCol)).as("tones"))
      .select(col("id"), col("sr"), col("n"),
        element_at(col("tones"), 1).as("f1"), element_at(col("tones"), 2).as("f2"))
    // GroupBy-bucket pairing, one scan + one fingerprint shuffle — see the
    // audioNearDupShift comment for why this beats a fingerprint self-join
    // (ADVICE r3: single DSP scan, no inferred-constraint re-evaluation).
    fp.groupBy(col("sr"), col("n"), col("f1"))
      .agg(collect_list(struct(col("id"), col("f2"))).as("xs"))
      .select(col("sr"), col("n"), col("f1"), explode(col("xs")).as("x"), col("xs"))
      .select(col("x"), explode(filter(col("xs"), y =>
        col("sr").isNotNull && col("n").isNotNull && col("f1").isNotNull &&
          col("x.id") < y("id") &&
          abs(col("x.f2") - y("f2")) <= tolHz)).as("y"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
  }
}
