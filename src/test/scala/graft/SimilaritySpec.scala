package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("kmeansStep assigns by max cosine and recomputes exact-decimal means") {
    // seeds 1 and 2 point along x and y; vectors 3-5 sit nearer one axis
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),   // seed A (x axis)
      (2L, Array(0.0f, 1.0f)),   // seed B (y axis)
      (3L, Array(2.0f, 0.5f)),   // → A
      (4L, Array(0.5f, 2.0f)),   // → B
      (5L, Array(3.0f, 1.0f)))   // → A
      .toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.kmeansStep(df, "vec_id", "embedding", Seq(1L, 2L))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // cluster 1 members: 1,3,5 → dim0 mean (1+2+3)/3 = 2, dim1 (0+0.5+1)/3 = 0.5
    assert(out((1L, 0L)).getLong(2) == 3L)
    assert(out((1L, 0L)).getDouble(3) == 2.0)
    assert(out((1L, 1L)).getDouble(3) == 0.5)
    // cluster 2 members: 2,4 → dim0 mean 0.25, dim1 1.5
    assert(out((2L, 0L)).getLong(2) == 2L)
    assert(out((2L, 0L)).getDouble(3) == 0.25)
    assert(out((2L, 1L)).getDouble(3) == 1.5)
  }

  test("native dotp is bit-identical to the HOF left-fold on fixture vectors") {
    val a = graft.sources.Tables.embeddings(spark, sf001).limit(200)
      .select(col("vec_id"), col("embedding").alias("a"))
    val pairs = a.crossJoin(graft.sources.Tables.embeddings(spark, sf001)
      .select(col("embedding").alias("b")).limit(5))
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val bits = pairs.select(
      VectorFunctions.dot(col("a"), col("b")).alias("native"), hof.alias("ref"))
      .collect()
    assert(bits.nonEmpty)
    bits.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("native dotp null semantics match the HOF form") {
    import spark.implicits._
    val df = Seq(
      (Seq(Float.box(1.0f), null.asInstanceOf[java.lang.Float]), Seq(Float.box(2.0f), Float.box(3.0f))),
      (Seq(Float.box(1.0f)), Seq(Float.box(2.0f), Float.box(3.0f))) // length mismatch
    ).toDF("a", "b")
    val out = df.select(VectorFunctions.dot(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("cosine HOF matches hand computation") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(3.0f, 2.0f, 1.0f))).toDF("a", "b")
    val got = df.select(VectorFunctions.cosine(col("a"), col("b"))).as[Double].head()
    val exp = (3.0 + 4.0 + 3.0) / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(got - exp) < 1e-12)
  }

  test("cosine of zero vector is null") {
    val df = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    assert(df.select(VectorFunctions.cosine(col("a"), col("b"))).head().isNullAt(0))
  }

  test("bruteForceTopK ranks an exact copy first") {
    val target = Seq(0.3f, -0.2f, 0.9f, 0.1f)
    val corpus = Seq(
      (10L, target),                                // exact copy → rank 1
      (11L, Seq(0.31f, -0.19f, 0.88f, 0.12f)),      // close → rank 2
      (12L, Seq(-0.9f, 0.8f, -0.7f, 0.6f))          // far
    ).toDF("vec_id", "embedding")
    val queries = Seq((1L, target)).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 2)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(10L, 11L))
    assert(math.abs(out(0).getDouble(2) - 1.0) < 1e-6)
  }

  test("lshTopK finds exact-copy neighbors (same bucket guaranteed) ") {
    // query == corpus vector ⇒ identical sketch ⇒ collides in every band
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val queries = emb.filter(col("vec_id") < 3)
    val corpus = emb // include the identical vectors themselves
    val out = Similarity.lshTopK(queries, corpus, "vec_id", "embedding", 1, dim = 64)
      .collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), "top-1 must be the identical vector")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-6)
    }
  }

  test("hyperplaneTopK maximizes selectivity subject to the recall target") {
    import graft.ops.LshParams
    def p(c: Double) = 1.0 - math.acos(c) / math.Pi
    def collide(c: Double, r: Int, b: Int) = 1.0 - math.pow(1.0 - math.pow(p(c), r), b)
    Seq(0.3, 0.5, 0.7, 0.9).foreach { c =>
      val (r, b) = LshParams.hyperplaneTopK(c)
      assert(r * b <= 64)
      assert(collide(c, r, b) >= 0.9, s"layout ($r,$b) misses recall at c=$c")
      // one more plane per band must be infeasible within the bit budget —
      // otherwise the layout isn't the most selective one
      val better = (1 to 64 / (r + 1)).exists(b2 => collide(c, r + 1, b2) >= 0.9)
      assert(!better, s"($r,$b) at c=$c: planes=${r + 1} would also meet recall")
    }
    // a larger sketch budget buys strictly more planes per band (smaller
    // buckets) at the same recall — the corpus-scaling knob
    val (r64, _) = LshParams.hyperplaneTopK(0.5, maxBits = 64)
    val (r128, b128) = LshParams.hyperplaneTopK(0.5, maxBits = 128)
    assert(r128 > r64, s"128-bit budget should out-select 64-bit: $r128 vs $r64")
    assert(r128 * b128 <= 128 && collide(0.5, r128, b128) >= 0.9)
  }

  test("lshTopKWith exhaustive layout equals brute force; auto layout recalls >= 0.9") {
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    val bruteRows = Similarity.bruteForceTopK(q, c, "vec_id", "embedding", 5).collect()
    val brute = bruteRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exhaustive = Similarity.lshTopKWith(q, c, "vec_id", "embedding", 5, dim = 64,
      planes = 0, bands = 1).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exhaustive == brute, "planes=0 single-bucket LSH must equal brute force")
    // the S-curve guarantee is per-pair AT the design cosine: design for
    // the weakest true neighbor actually present (near-orthogonal fixture:
    // top-5 cosines run well below the 0.5 default) with headroom
    val cMin = bruteRows.map(_.getDouble(2)).min
    val auto = Similarity.lshTopK(q, c, "vec_id", "embedding", 5, dim = 64,
      neighborCosine = cMin, targetRecall = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (auto intersect brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall below 0.9 (design cosine $cMin)")
  }

  test("lshTopKWith wide layout (128 bits, beyond one sketch word) stays correct") {
    // planes=16 × bands=8 = 128 plane bits — inexpressible under the old
    // one-word cap; exact copies still collide in every band (identical
    // per-band sketches) and every emitted cosine must match brute force
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val q = emb.filter(col("vec_id") < 3)
    val out = Similarity.lshTopKWith(q, emb, "vec_id", "embedding", 1, dim = 64,
      planes = 16, bands = 8).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), "top-1 must be the identical vector")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-6)
    }
    val brute = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 200)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    Similarity.lshTopKWith(q, emb, "vec_id", "embedding", 5, dim = 64,
      planes = 16, bands = 8).collect().foreach { r =>
      brute.get((r.getLong(0), r.getLong(1)))
        .foreach(exp => assert(math.abs(r.getDouble(2) - exp) < 1e-9))
    }
  }

  test("lshTopK results are a subset of brute-force candidates with correct cosines") {
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    val brute = Similarity.bruteForceTopK(q, c, "vec_id", "embedding", 50)
      .select("query_id", "neighbor_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshTopK(q, c, "vec_id", "embedding", 5, dim = 64).collect()
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(exp => assert(math.abs(r.getDouble(2) - exp) < 1e-9))
    }
  }

  /** Deterministic clustered corpus: `nClusters` unit anchor directions,
    * each point = anchor + small seeded noise. IVF's contract (nearby
    * points share a cell) is only testable on data that HAS cells.
    */
  private def clusteredCorpus(n: Int, nClusters: Int, dim: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(1234)
    val anchors = Array.fill(nClusters) {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / nrm).toFloat)
    }
    (0L until n.toLong).map { i =>
      val a = anchors((i % nClusters).toInt)
      val noisy = a.map(x => x + 0.08f * rnd.nextGaussian().toFloat)
      (i, noisy.toSeq)
    }
  }

  test("bruteForceTopKNative matches the window variant exactly") {
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val window = canon(Similarity.bruteForceTopK(q, c, "vec_id", "embedding", 7))
    val native = canon(Similarity.bruteForceTopKNative(q, c, "vec_id", "embedding", 7))
    assert(native == window)
    assert(native.nonEmpty)
  }

  test("TopKPairsAgg tolerates null scores and ties break by lower id") {
    import graft.functions.TopKPairsAgg
    val df = Seq(
      (1L, 10L, Double.box(0.5)), (1L, 11L, Double.box(0.5)), (1L, 12L, Double.box(0.9)),
      (1L, 13L, null.asInstanceOf[java.lang.Double]), (1L, 14L, Double.box(0.1))
    ).toDF("g", "id", "s")
    val out = df.groupBy("g").agg(TopKPairsAgg(col("id"), col("s"), 3).alias("top"))
      .select(explode(col("top")).alias("e"))
      .select(col("e.neighbor_id"), col("e.cosine")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq((12L, 0.9), (10L, 0.5), (11L, 0.5)))
  }

  test("quantizedTopK equals brute force with a rerank cushion") {
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val brute = canon(Similarity.bruteForceTopK(q, c, "vec_id", "embedding", 5))
    val quant = canon(Similarity.quantizedTopK(q, c, "vec_id", "embedding", 5, rerankK = 25))
    assert(quant == brute)
    assert(quant.nonEmpty)
  }

  test("fitCentroids is deterministic and returns unit-norm centroids") {
    val corpus = clusteredCorpus(400, 8, 16).toDF("vec_id", "embedding")
    val c1 = Similarity.fitCentroids(corpus, "embedding", 8, sampleSize = 256)
    val c2 = Similarity.fitCentroids(corpus, "embedding", 8, sampleSize = 256)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    c1.foreach { c =>
      val nrm = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-9)
    }
  }

  test("ivfTopK with k-means centroids: recall >= 0.9 vs brute force on clustered data") {
    val corpus = clusteredCorpus(600, 8, 16).toDF("vec_id", "embedding")
    val queries = clusteredCorpus(600, 8, 16).filter(_._1 % 40 == 0).toDF("vec_id", "embedding")
    val k = 5
    val brute = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(queries, corpus, "vec_id", "embedding", k,
      nCentroids = 8, nProbe = 2)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.9, s"IVF recall $recall < 0.9 (|brute|=${brute.size}, |ivf|=${ivf.size})")
  }

  test("ivfTopK cosines are exact and ranks are contiguous per query") {
    val corpus = clusteredCorpus(300, 4, 12).toDF("vec_id", "embedding")
    val queries = clusteredCorpus(300, 4, 12).filter(_._1 < 3).toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 300)
      .select("query_id", "neighbor_id", "cosine").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val out = Similarity.ivfTopK(queries, corpus, "vec_id", "embedding", 4,
      nCentroids = 4, nProbe = 2).collect()
    out.foreach { r =>
      val exp = brute((r.getLong(0), r.getLong(1)))
      assert(math.abs(r.getDouble(2) - exp) < 1e-9)
    }
    out.groupBy(_.getLong(0)).values.foreach { rows =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }

  test("contrastivePairs mines complete positives and the hardest negative per anchor") {
    import spark.implicits._
    // cluster A (seed 10): 1 is a positive of 10 (cos ≈ 0.9998 ≥ 0.99),
    // 2 sits below threshold against both; cluster B (seed 20): 3 is
    // below threshold against 20. Hard negative = highest sub-threshold
    // cluster-mate: 1→2 (0.939 beats nothing else), 2→1 (0.939 > 0.932
    // vs the seed), 10→2 (only 0.932 left after its positive).
    val df = Seq(
      10L -> Seq(1.0f, 0.0f, 0.0f, 0.0f),
      20L -> Seq(0.0f, 1.0f, 0.0f, 0.0f),
      1L -> Seq(1.0f, 0.02f, 0.0f, 0.0f),
      2L -> Seq(0.9f, 0.35f, 0.0f, 0.0f),
      3L -> Seq(0.0f, 1.0f, 0.25f, 0.0f)
    ).toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.contrastivePairs(
      df, "vec_id", "embedding", Seq(10L, 20L), 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSet
    val positives = out.filter(_._3).map(t => (t._1, t._2))
    val negatives = out.filterNot(_._3).map(t => (t._1, t._2))
    assert(positives == Set((1L, 10L), (10L, 1L)), s"positives: $positives")
    assert(negatives == Set((1L, 2L), (2L, 1L), (10L, 2L),
      (20L, 3L), (3L, 20L)), s"negatives: $negatives")
  }

  test("kmeansFit: one iteration equals kmeansStep; crafted clusters converge and stay") {
    import spark.implicits._
    // iters=1 must be EXACTLY the single EM step (same assignment, same
    // decimal mean, same quantization)
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val one = graft.ops.Similarity.kmeansFit(emb, "vec_id", "embedding",
      seedIds = (0L until 4L).toSeq, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val step = graft.ops.Similarity.kmeansStep(emb, "vec_id", "embedding",
      seedIds = (0L until 4L).toSeq)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(one == step)

    // two tight crafted clusters, seeds one per cluster: converged by
    // round 1, so round 3 centroids are the same cluster means (fixpoint)
    val pts = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0.95f, 0.05f)),
      (10L, Array(0.0f, 1.0f)), (11L, Array(0.1f, 0.9f)), (12L, Array(0.05f, 0.95f)))
      .toDF("vec_id", "embedding")
    val fit = graft.ops.Similarity.kmeansFit(pts, "vec_id", "embedding",
      seedIds = Seq(0L, 10L), iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // cluster 0 = {0,1,2}: dim-0 mean = (1.0+0.9+0.95)/3 = 0.95
    assert(fit((0L, 0L))._1 == 3L && math.abs(fit((0L, 0L))._2 - 0.95) < 1e-9)
    assert(fit((10L, 1L))._1 == 3L && math.abs(fit((10L, 1L))._2 - 0.95) < 1e-9)
  }

  test("kmeansInertia reports a non-increasing objective along the fit trajectory") {
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val rounds = graft.ops.Similarity.kmeansInertia(emb, "vec_id", "embedding",
      seedIds = (0L until 8L).toSeq, iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(rounds.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(rounds.forall(_._2._1 == rounds.head._2._1), "every round assigns every point")
    // Lloyd updates improve the objective on this fixture (cosine inertia
    // is not guaranteed monotone in general -- mean, not spherical mean --
    // so this pins the fixture trajectory, not a theorem)
    val inert = rounds.map(_._2._2)
    assert(inert(1) <= inert(0) && inert(2) <= inert(1), inert.mkString(","))
  }
  test("mmrRerank diversifies: an exact duplicate of the first pick loses to a distinct doc") {
    // query along x; a and its exact-direction duplicate b lead on
    // relevance, c is less relevant but orthogonal-ish. Plain top-2 is
    // [a, b]; MMR at lambda = 0.25 must pick [a, c] (b's duplicate
    // penalty of cos(b,a) = 1 kills it), while the first pick always
    // equals the relevance top-1.
    val queries = Seq((100L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (0L, Array(1.0f, 0.2f)),  // a: rel ~0.9806
      (1L, Array(2.0f, 0.4f)),  // b = 2a: identical direction, same rel
      (2L, Array(0.2f, 1.0f)))  // c: rel ~0.1961, cos(a,c) ~0.3846
      .toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(queries, corpus, "vec_id", "embedding",
      k = 2, topN = 3, lambda = 0.25)
      .orderBy("mmr_rank").collect()
    assert(out.map(_.getAs[Long]("selected_id")).toSeq == Seq(0L, 2L))
    val topk = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 2)
      .orderBy("rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(topk == Seq(0L, 1L), "plain top-k keeps the duplicate")
  }

  test("mmrRerank matches an independent Scala greedy referee on random vectors") {
    val rng = new scala.util.Random(42)
    val corpus = (0L until 20L).map(i =>
      (i, Array.fill(8)(rng.nextFloat() * 2 - 1))).toSeq
    val queries = Seq((100L, Array.fill(8)(rng.nextFloat() * 2 - 1)))
    val (k, topN, lam) = (5, 12, 0.5)
    val out = Similarity.mmrRerank(
      queries.toDF("vec_id", "embedding"), corpus.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k, topN, lam)
      .orderBy("mmr_rank").collect()
      .map(r => (r.getAs[Long]("selected_id"), r.getAs[Double]("mmr_score")))

    // referee: plain Scala greedy with the same fold orders + quantization
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val qv = queries.head._2
    val cand = corpus.map { case (id, v) => (id, v, cos(qv, v)) }
      .sortBy { case (id, _, c) => (-c, id) }.take(topN)
      .map { case (id, v, c) => (id, v, math.floor(c * 1e6 + 0.5) / 1e6) }
    // NOTE: rel uses round-half-up at 6 dp like the operator's round(,6);
    // for positive cosines floor(x*1e6+0.5)/1e6 is identical
    var sel = List((cand.head._1, cand.head._2))
    var expect = List((cand.head._1, q6(lam * cand.head._3)))
    for (_ <- 2 to k) {
      val scored = cand.filterNot(c => sel.exists(_._1 == c._1)).map { c =>
        val maxSim = sel.foldLeft(-1.0)((m, s) => math.max(m, cos(c._2, s._2)))
        (c._1, c._2, q6(lam * c._3 - (1 - lam) * maxSim))
      }
      val best = scored.minBy { case (id, _, sc) => (-sc, id) }
      sel = sel :+ ((best._1, best._2))
      expect = expect :+ ((best._1, best._3))
    }
    assert(out.toSeq == expect, s"spark ${out.toSeq} vs referee $expect")
  }

  test("retrievalEval: perfect retriever scores 1.0; a lost top-1 zeroes rr but not recall") {
    val truth = Seq((1L, 10L, 1L), (1L, 11L, 2L), (2L, 20L, 1L), (2L, 21L, 2L))
      .toDF("query_id", "neighbor_id", "rank")
    // query 1: approx == truth; query 2: top-1 lost, one stranger ranked first
    val approx = Seq((1L, 10L, 1L), (1L, 11L, 2L), (2L, 99L, 1L), (2L, 21L, 2L))
      .toDF("query_id", "neighbor_id", "rank")
    val out = Similarity.retrievalEval(truth, approx, k = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_hits") == 2L)
    assert(out(1L).getAs[Double]("recall_at_k") == 1.0)
    assert(out(1L).getAs[Double]("rr_top1") == 1.0)
    assert(out(2L).getAs[Long]("n_hits") == 1L)
    assert(out(2L).getAs[Double]("recall_at_k") == 0.5)
    assert(out(2L).getAs[Double]("rr_top1") == 0.0)
    // the q64 cushion form is provably exact on this fixture -> all 1.0
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val (q, c) = (emb.filter(col("vec_id") < 5), emb.filter(col("vec_id") >= 5))
    val cushioned = Similarity.retrievalEval(
      Similarity.bruteForceTopK(q, c, "vec_id", "embedding", 5),
      Similarity.quantizedTopK(q, c, "vec_id", "embedding", 5, rerankK = 25), 5)
      .collect()
    assert(cushioned.length == 5 &&
      cushioned.forall(r => r.getAs[Double]("recall_at_k") == 1.0 &&
        r.getAs[Double]("rr_top1") == 1.0))
  }

  test("mmrRerank: a query with fewer than k candidates emits its candidate count, no null picks") {
    // corpus of 2 (one of them zero-norm, so only ONE retrievable
    // candidate) with k = 3: the r12 ADVICE scenario where exhausted
    // greedy rounds produced null picks that poisoned later rounds
    val queries = Seq((100L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (0L, Array(1.0f, 0.1f)),
      (1L, Array(0.0f, 0.0f))) // zero-norm: dropped by retrieval
      .toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(queries, corpus, "vec_id", "embedding",
      k = 3, topN = 3, lambda = 0.5).orderBy("mmr_rank").collect()
    assert(out.length == 1, s"expected 1 row, got ${out.toSeq}")
    assert(out(0).getAs[Long]("mmr_rank") == 1L)
    assert(out(0).getAs[Long]("selected_id") == 0L)
    assert(!out(0).isNullAt(out(0).fieldIndex("mmr_score")))
    // two retrievable candidates, k = 3: ranks stay contiguous 1..2
    val corpus2 = Seq((0L, Array(1.0f, 0.1f)), (2L, Array(0.1f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out2 = Similarity.mmrRerank(queries, corpus2, "vec_id", "embedding",
      k = 3, topN = 3, lambda = 0.5).orderBy("mmr_rank").collect()
    assert(out2.map(_.getAs[Long]("mmr_rank")).toSeq == Seq(1L, 2L))
    assert(out2.forall(r => !r.isNullAt(r.fieldIndex("selected_id"))))
  }

  test("retrievalEval: a total-miss query appears with zero scores; short truth caps the denominator") {
    val truth = Seq((1L, 10L, 1L), (1L, 11L, 2L), (3L, 30L, 1L))
      .toDF("query_id", "neighbor_id", "rank")
    // query 3 is entirely absent from approx (total retrieval failure);
    // query 1's truth is complete; approx also has a truth-less query 9
    val approx = Seq((1L, 10L, 1L), (1L, 11L, 2L), (9L, 90L, 1L))
      .toDF("query_id", "neighbor_id", "rank")
    val out = Similarity.retrievalEval(truth, approx, k = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 3L, 9L), s"got ${out.keySet}")
    assert(out(3L).getAs[Long]("n_hits") == 0L)
    assert(out(3L).getAs[Double]("recall_at_k") == 0.0)
    assert(out(3L).getAs[Double]("rr_top1") == 0.0)
    // query 3's truth holds ONE row with k = 2: a retriever that finds it
    // scores recall 1.0 (denominator least(k, truth rows)), not 0.5
    val approx2 = Seq((3L, 30L, 1L)).toDF("query_id", "neighbor_id", "rank")
    val out2 = Similarity.retrievalEval(truth.filter(col("query_id") === 3L),
      approx2, k = 2).collect()
    assert(out2.length == 1 && out2(0).getAs[Double]("recall_at_k") == 1.0)
    assert(out2(0).getAs[Double]("rr_top1") == 1.0)
    // a truth-less approx query scores 0 hits / 0 recall, not a crash
    assert(out(9L).getAs[Long]("n_hits") == 0L)
    assert(out(9L).getAs[Double]("recall_at_k") == 0.0)
  }

  test("ivfIndexAppend: probe over build+append equals ivfTopK over the full corpus") {
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    val cents = Similarity.fitCentroids(c, "embedding", 8)
    val dir = new java.io.File("target/test_idx/ivf_append_spec").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    // build from the even half, append the odd half — the stored model
    // (not a refit) must assign the appended batch
    Similarity.ivfIndexBuild(c.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", dir, centroids = Some(cents))
    Similarity.ivfIndexAppend(spark, dir,
      c.filter(col("vec_id") % 2 === 1), "vec_id", "embedding")
    val probed = Similarity.ivfTopKAgainst(spark, dir, q, "vec_id", "embedding",
      5, nProbe = 2).collect().map(_.toSeq).toSet
    val inline = Similarity.ivfTopK(q, c, "vec_id", "embedding", 5,
      nCentroids = 8, nProbe = 2, centroids = Some(cents))
      .collect().map(_.toSeq).toSet
    assert(probed.nonEmpty)
    assert(probed == inline)
  }

  test("ivfTopKAgainst (persisted index) equals ivfTopK given the same model") {
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    val cents = Similarity.fitCentroids(c, "embedding", 8)
    val dir = new java.io.File("target/test_idx/ivf_spec").getAbsolutePath
    Similarity.ivfIndexBuild(c, "vec_id", "embedding", dir, centroids = Some(cents))
    // the coarse model round-trips bit-exactly through the parquet store
    val back = Similarity.ivfIndexCentroids(spark, dir)
    assert(back.length == cents.length)
    back.zip(cents).foreach { case (a, b) => assert(a.sameElements(b)) }
    val inline = Similarity.ivfTopK(q, c, "vec_id", "embedding", 5,
      nCentroids = 8, nProbe = 2, centroids = Some(cents))
      .collect().map(_.toSeq).toSet
    val probed = Similarity.ivfTopKAgainst(spark, dir, q, "vec_id", "embedding",
      5, nProbe = 2)
    val got = probed.collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got == inline)
  }
}
