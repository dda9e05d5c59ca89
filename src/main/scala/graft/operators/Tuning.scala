package graft.operators

/** Recall-targeting parameter helpers for the LSH / IVF candidate
  * generators: given a similarity threshold and a target recall, choose
  * the cheapest (most selective) parameters whose theoretical or measured
  * recall meets the target. The analytic S-curves are the standard LSH
  * results (Indyk-Motwani / Charikar; see Mining of Massive Datasets
  * ch. 3); the IVF helper is empirical because cell geometry depends on
  * the corpus.
  *
  * At 100 TB these choices are the whole game: every extra band/table is
  * a full extra copy of the id stream through the candidate shuffle, and
  * every extra probe scans another ~1/nList of the corpus — so "smallest
  * parameters that still hit recall" is the right optimization direction.
  */
object Tuning {

  /** P(pair becomes a candidate | MinHash-estimated Jaccard `s`) under
    * banding: 1 - (1 - s^r)^b with r = k/bands rows per band. */
  def minhashRecall(s: Double, k: Int, bands: Int): Double = {
    require(bands >= 1 && k % bands == 0, s"bands=$bands must divide k=$k")
    val r = k / bands
    1.0 - math.pow(1.0 - math.pow(s, r), bands)
  }

  /** Fewest bands (longest rows => most selective buckets) whose recall at
    * `threshold` meets `targetRecall`. More bands always raise recall, so
    * the first divisor of k that clears the target is optimal. */
  def minhashBandsFor(k: Int, threshold: Double, targetRecall: Double): Int = {
    require(threshold > 0 && threshold <= 1 && targetRecall > 0 && targetRecall < 1)
    (1 to k).filter(k % _ == 0)
      .find(b => minhashRecall(threshold, k, b) >= targetRecall)
      .getOrElse(k)
  }

  /** P(pair becomes a candidate | cosine `c`) for `nTables` independent
    * tables of `nBits` hyperplanes: per-hyperplane agreement
    * p = 1 - acos(c)/pi (Charikar), per-table p^nBits, OR across tables. */
  def hyperplaneRecall(c: Double, nBits: Int, nTables: Int): Double = {
    val p = 1.0 - math.acos(math.max(-1.0, math.min(1.0, c))) / math.Pi
    1.0 - math.pow(1.0 - math.pow(p, nBits), nTables)
  }

  /** Fewest tables meeting `targetRecall` for pairs at cosine `threshold`
    * with `nBits`-bit tables (each table is a full copy of the id stream
    * through the candidate shuffle — fewer is cheaper). */
  def hyperplaneTablesFor(nBits: Int, threshold: Double, targetRecall: Double,
                          maxTables: Int = 1024): Int = {
    require(nBits >= 1 && nBits <= 31, s"nBits must be in [1, 31], got $nBits")
    require(targetRecall > 0 && targetRecall < 1)
    val pTable = math.pow(
      1.0 - math.acos(math.max(-1.0, math.min(1.0, threshold))) / math.Pi, nBits)
    if (pTable >= 1.0) 1
    else if (pTable <= 0.0) maxTables
    else math.min(maxTables,
      math.max(1, math.ceil(math.log1p(-targetRecall) / math.log1p(-pTable)).toInt))
  }

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Empirical nProbe for IVF: for each sampled query, find the cell of
    * its true (cosine) nearest neighbor and its rank in the query's
    * centroid-distance probe order; return the smallest nProbe covering
    * `targetRecall` of the sampled queries. Bounded driver-side sample by
    * design (same discipline as Ivf.fit — the corpus never moves). */
  def ivfProbesFor(sampleCorpus: Array[Array[Float]],
                   sampleQueries: Array[Array[Float]],
                   cents: Array[Array[Float]],
                   targetRecall: Double): Int = {
    require(sampleCorpus.nonEmpty && sampleQueries.nonEmpty)
    require(targetRecall > 0 && targetRecall <= 1)
    val order = sampleQueries.map { q =>
      var best: Array[Float] = null
      var bestC = -2.0
      var i = 0
      while (i < sampleCorpus.length) {
        val v = sampleCorpus(i)
        if (!(v eq q) && !java.util.Arrays.equals(v, q)) {
          val c = cos(q, v)
          if (c > bestC) { bestC = c; best = v }
        }
        i += 1
      }
      require(best != null,
        "ivfProbesFor: sample corpus has no vector distinct from a sampled " +
          "query — widen the sample (a degenerate all-identical corpus has " +
          "no recoverable neighbor structure to tune against)")
      val nnCell = Ivf.nearestIdx(best, cents)
      val probes = Ivf.nearestIdxs(q, cents, cents.length)
      probes.indexOf(nnCell) + 1
    }.sorted
    order(math.max(0, math.ceil(targetRecall * order.length).toInt - 1))
  }

  /** Capacity planning for [[Dedup.hashNearDup]]'s candidate stage at
    * corpus size `n` with near-uniform signatures: (emissions per row,
    * expected organic candidate pairs). Mirrors the operator's scheme
    * selection exactly — single-chunk pigeonhole for maxHamming <= 4,
    * 4-subset combination keys for >= 5 — and uses the balls-in-bins
    * expectation sum_buckets C(occ, 2) = K * C(n, 2) / B for K emissions
    * over B key values each. Recall is 1.0 by construction in both
    * schemes (pigeonhole), so this is the COST side only — the number a
    * 100 TB planner compares against its shuffle/compute budget
    * (HashNearDupScaleSpec validates the arithmetic against a measured
    * occupancy simulation). */
  def hashNearDupCost(n: Long, maxHamming: Int): (Long, Double) = {
    require(maxHamming >= 0 && maxHamming <= 31)
    val pairs = n.toDouble * (n - 1) / 2.0
    if (maxHamming <= 4) {
      val nChunks = maxHamming + 1
      val w = (64 + nChunks - 1) / nChunks
      // per chunk i of width w_i: B = 2^w_i key values
      val exp = (0 until nChunks).map { i =>
        val width = math.min(w, 64 - i * w)
        if (width <= 0) pairs // degenerate chunk: the whole corpus collides
        else pairs / math.pow(2.0, width)
      }.sum
      (nChunks.toLong, exp)
    } else {
      val c = maxHamming + 4
      val base = 64 / c
      val rem = 64 % c
      val widths = (0 until c).map(i => base + (if (i < rem) 1 else 0))
      val combos = (0 until c).combinations(4).toSeq
      val exp = combos.map(idx =>
        pairs / math.pow(2.0, idx.map(widths).sum)).sum
      (combos.size.toLong, exp)
    }
  }
}
