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
}
