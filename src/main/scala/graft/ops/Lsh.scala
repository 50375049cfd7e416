package graft.ops

/** LSH parameter selection from first principles: given a similarity
  * threshold and a target recall, pick the cheapest (rows/planes, bands)
  * whose S-curve meets the recall — callers stop hand-tuning band
  * layouts per threshold.
  */
object LshParams {

  /** MinHash banding: collision prob of a pair with Jaccard j under
    * (bands b, rows r) is 1-(1-j^r)^b. Returns the (rows, bands) with the
    * FEWEST total hashes meeting `targetRecall` at `threshold` while
    * keeping low-similarity noise (j = threshold/2) collisions under
    * `maxNoise`.
    */
  def minhash(threshold: Double, targetRecall: Double = 0.9,
              maxNoise: Double = 0.15, maxHashes: Int = 256): (Int, Int) = {
    def collide(j: Double, r: Int, b: Int) = 1.0 - math.pow(1.0 - math.pow(j, r), b)
    val candidates = for {
      r <- 1 to 16
      b <- 1 to maxHashes
      if r * b <= maxHashes
      if collide(threshold, r, b) >= targetRecall
      if collide(threshold / 2, r, b) <= maxNoise
    } yield (r, b)
    if (candidates.isEmpty) (4, 8) // fall back to the classic 32-hash layout
    else candidates.minBy { case (r, b) => r * b }
  }

  /** Hyperplane banding for TOP-K search: unlike threshold search there is
    * no wrong-pair risk (sub-threshold candidates just cost compute and
    * lose the rank), so the objective is pure selectivity — the LARGEST
    * planes-per-band (buckets per band = 2^planes, i.e. exponentially
    * smaller buckets) whose S-curve still recalls a true neighbor at
    * `neighborCosine` with probability ≥ `targetRecall`, then the fewest
    * bands that get there. Returns (planes, bands) with planes ≤ 64 (a
    * band key is one sketch word) and planes·bands ≤ `maxBits` — the
    * total sketch-compute budget; raise it past 64 to buy more selective
    * layouts at large corpus sizes (each band keys on its own plane
    * slice, see [[Similarity.lshTopKWith]]).
    */
  def hyperplaneTopK(neighborCosine: Double, targetRecall: Double = 0.9,
                     maxBits: Int = 64): (Int, Int) = {
    // loud bounds: a cosine or recall outside its domain is a caller bug
    // (e.g. legacy positional (planes, bands) ints widened into these
    // doubles) — silently proceeding would hand back a degenerate layout
    require(neighborCosine >= -1.0 && neighborCosine <= 1.0,
      s"neighborCosine must be in [-1, 1], got $neighborCosine")
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"targetRecall must be in (0, 1], got $targetRecall")
    val p = 1.0 - math.acos(neighborCosine) / math.Pi
    def collide(r: Int, b: Int) = 1.0 - math.pow(1.0 - math.pow(p, r), b)
    val layouts = for {
      r <- math.min(64, maxBits) to 1 by -1
      b = (1 to maxBits / r).find(collide(r, _) >= targetRecall)
      if b.isDefined
    } yield (r, b.get)
    // when no layout meets the target within the bit budget, return the
    // highest-recall one the budget allows (1 plane × maxBits bands) —
    // the documented recall contract is best-effort-maximal, never a
    // silent selectivity-first fallback
    layouts.headOption.getOrElse((1, math.min(512, maxBits)))
  }

  /** Hyperplane banding chosen for a KNOWN corpus size: among layouts
    * meeting the recall target at the threshold cosine, pick the one
    * minimizing expected WORK rather than sketch bits —
    *
    *   cost(r, b) ≈ b · n² · (1/2)^r   (band-join candidate pairs: a
    *                                    random near-orthogonal pair agrees
    *                                    on one hyperplane bit with
    *                                    probability ~1/2)
    *             + n · r · b           (sketch compute; marginal — the
    *                                    512-bit prefilter sketch usually
    *                                    covers the bits already)
    *
    * As n grows the argmin slides toward more planes per band (buckets
    * shrink exponentially) paid for with more bands (recall restored),
    * which is exactly the "one more plane per corpus doubling" rule. The
    * default budget of 512 bits matches the prefilter sketch the
    * embedding paths already compute, so wider layouts are free at the
    * sketch level; past the point where even 512 bits cannot hold the
    * recall target with acceptable selectivity (very low thresholds near
    * the random background), banding is the wrong tool and the IVF path
    * ([[graft.ops.Similarity.ivfTopK]]) with a √n centroid count is the
    * honest alternative — see SCALE.md.
    */
  def hyperplaneForCorpus(cosineThreshold: Double, corpusSize: Long,
                          targetRecall: Double = 0.9,
                          maxBits: Int = 512): (Int, Int) = {
    require(corpusSize > 0, s"corpusSize must be positive, got $corpusSize")
    val p = 1.0 - math.acos(math.max(-1.0, math.min(1.0, cosineThreshold))) / math.Pi
    def collide(q: Double, r: Int, b: Int) = 1.0 - math.pow(1.0 - math.pow(q, r), b)
    val n = corpusSize.toDouble
    val layouts = for {
      r <- 1 to 64
      // fewest bands reaching the recall target at this r, if any fit
      b <- (1 to maxBits / math.max(r, 1)).find(collide(p, r, _) >= targetRecall)
    } yield (r, b)
    if (layouts.isEmpty) hyperplane(cosineThreshold) // budget can't hold recall: legacy layout
    else layouts.minBy { case (r, b) =>
      b * n * n * math.pow(0.5, math.min(r, 62)) + n * r * b
    }
  }

  /** Hyperplane banding: per-plane agreement prob for cosine c is
    * 1 - acos(c)/π; same S-curve selection as [[minhash]].
    */
  def hyperplane(cosineThreshold: Double, targetRecall: Double = 0.9,
                 maxNoise: Double = 0.15, maxBits: Int = 64): (Int, Int) = {
    val p = 1.0 - math.acos(cosineThreshold) / math.Pi
    val pNoise = 1.0 - math.acos(math.max(-0.99, cosineThreshold / 2)) / math.Pi
    def collide(q: Double, r: Int, b: Int) = 1.0 - math.pow(1.0 - math.pow(q, r), b)
    val candidates = for {
      r <- 1 to 32
      b <- 1 to maxBits
      if r * b <= maxBits
      if collide(p, r, b) >= targetRecall
      if collide(pNoise, r, b) <= maxNoise
    } yield (r, b)
    if (candidates.isEmpty) (4, 8)
    else candidates.minBy { case (r, b) => r * b }
  }
}

/** Deterministic hyperplane generation (seeded 64-bit LCG → uniform in
  * [-1, 1]); same constants as java.util.Random's LCG — public domain
  * parameters, reproducible across runs and engines.
  */
object Hyperplanes {
  def generate(seed: Long, nPlanes: Int, dim: Int): Seq[Array[Double]] = {
    var s = seed
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Seq.fill(nPlanes)(Array.fill(dim)(next()))
  }
}
