package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{Aggregations, Validation}
import graft.functions.TextFunctions

/** Property-based checks of the fragile semantics (SURVEY §5: null-
  * skipping averages, decimal accumulation invariance, rule-conjunction
  * null handling, shingle-set equivalences) over generated data.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  // manual forAll: the scalatest<->scalacheck bridge artifact is not in the
  // offline dependency set, so drive generators directly (fixed seeds =
  // reproducible)
  private def forAll[T](gen: Gen[T], n: Int = 10)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(sys.error("gen failed")))
    }

  private val amounts: Gen[List[Option[Double]]] =
    Gen.listOfN(40, Gen.option(Gen.chooseNum(-1e6, 1e6).map(v => math.rint(v * 100) / 100)))

  test("exactSum is invariant under repartitioning (order independence)") {
    forAll(amounts) { xs =>
      val df = xs.map(x => Tuple1(x.map(Double.box).orNull)).toDF("v")
      def total(parts: Int): Option[Double] = {
        val r = df.repartition(parts).agg(Aggregations.exactSum(col("v"))).head()
        if (r.isNullAt(0)) None else Some(r.getDouble(0))
      }
      assert(total(1) == total(7))
      assert(total(7) == total(32))
    }
  }

  test("exactAvg skips nulls exactly like the reference's avg semantics") {
    forAll(amounts) { xs =>
      val df = xs.map(x => Tuple1(x.map(Double.box).orNull)).toDF("v")
      val r = df.agg(Aggregations.exactAvg(col("v"))).head()
      val present = xs.flatten
      if (present.isEmpty) assert(r.isNullAt(0))
      else {
        // independent exact reference via BigDecimal
        val exp = (present.map(BigDecimal(_)).sum.toDouble) / present.size
        assert(math.abs(r.getDouble(0) - exp) < 1e-9)
      }
    }
  }

  test("validate + rejects partition the input; null predicates count as failures") {
    forAll(amounts) { xs =>
      val df = xs.zipWithIndex
        .map { case (x, i) => (i.toLong, x.map(Double.box).orNull) }.toDF("id", "v")
      val rules = Seq(Validation.Rule("pos", col("v") > 0))
      val kept = Validation.validate(df, rules).count()
      val rejected = Validation.rejects(df, rules).count()
      assert(kept + rejected == xs.size) // nulls fall in rejects, never dropped silently
      assert(kept == xs.flatten.count(_ > 0))
    }
  }

  private val sentences: Gen[List[String]] = Gen.listOfN(8,
    Gen.listOf(Gen.oneOf("spark", "data", "join", "scan", "row", "fast", "query", "col"))
      .map(_.mkString(" ")))

  test("hashed shingle sets give the same Jaccard as string shingle sets") {
    forAll(sentences) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val both = df
        .withColumn("__th", TextFunctions.tokenHashes(TextFunctions.tokens(col("text"))))
        .select(col("id"),
          TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).alias("ss"),
          TextFunctions.shingleHashesFromTokenHashes(col("__th"), 3).alias("hs"))
      // same cardinalities row-wise ⇒ same Jaccard for every pair
      val bad = both.filter(size(col("ss")) =!= size(col("hs"))).count()
      assert(bad == 0)
      val pairs = both.alias("a").join(both.alias("b"), col("a.id") < col("b.id"))
        .select(
          size(array_intersect(col("a.ss"), col("b.ss"))).alias("si"),
          size(array_intersect(col("a.hs"), col("b.hs"))).alias("hi"))
        .filter(col("si") =!= col("hi")).count()
      assert(pairs == 0)
    }
  }

  test("pinnedFilter selects exactly the rows of a plain filter and leaves no helper column") {
    import graft.ops.Projections
    val docs = graft.sources.Tables.documents(spark, sf001)
    val cond = length(col("text")) > 200 && col("lang") =!= "de"
    val pinned = Projections.pinnedFilter(docs, cond)
    val plain = docs.filter(cond)
    assert(pinned.columns.toSeq == docs.columns.toSeq, "helper column leaked")
    assert(pinned.select("doc_id").exceptAll(plain.select("doc_id")).count() == 0)
    assert(plain.select("doc_id").exceptAll(pinned.select("doc_id")).count() == 0)
    assert(pinned.count() == plain.count() && pinned.count() > 0)
    // null-condition rows are dropped, like a plain filter
    val withNull = Seq((1L, "x"), (2L, null)).toDF("id", "s")
    assert(Projections.pinnedFilter(withNull, col("s") === "x").count() == 1)
  }

  test("int8 quantization reconstruction error is bounded by scale/2 for any vector") {
    import graft.functions.VectorFunctions
    import org.scalacheck.Gen
    val vectors = Gen.listOfN(5,
      Gen.nonEmptyListOf(Gen.chooseNum(-1e6f, 1e6f).suchThat(f => !f.isNaN)))
    forAll(vectors) { vs =>
      if (vs.nonEmpty && vs.forall(_.exists(_ != 0.0f))) {
        val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
        val scale = VectorFunctions.quantScale(col("v"))
        val out = df.withColumn("__s", scale)
          .withColumn("__q", VectorFunctions.quantizeInt8(col("v"), col("__s")))
          .select(
            VectorFunctions.quantMaxAbsError(col("v"), col("__q"), col("__s")).alias("err"),
            (col("__s") / 2.0).alias("bound"))
          .collect()
        out.foreach { r =>
          // float→double cast noise allows equality at the boundary
          assert(r.getDouble(0) <= r.getDouble(1) * (1 + 1e-12) + 1e-300,
            s"err ${r.getDouble(0)} > bound ${r.getDouble(1)}")
        }
      }
    }
  }

  test("redaction is complete: no rule pattern survives in scrubbed output") {
    import graft.ops.Redaction
    val word: Gen[String] = Gen.oneOf("alpha", "beta", "gamma", "delta", "x1", "data")
    val pii: Gen[String] = Gen.oneOf(
      Gen.chooseNum(1, 999999).map(n => s"user$n@mail.example.com"),
      Gen.chooseNum(1, 9999).map(n => s"https://ex.org/p/$n?q=$n"),
      for (a <- Gen.chooseNum(0, 255); b <- Gen.chooseNum(0, 255)) yield s"10.$a.$b.7",
      Gen.chooseNum(0, 9999).map(n => f"555-$n%04d"))
    val doc: Gen[String] =
      Gen.listOfN(12, Gen.frequency(3 -> word, 2 -> pii)).map(_.mkString(" "))
    forAll(Gen.listOfN(20, doc)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = Redaction.scrub(df, "doc_id", "text")
      // after scrubbing, no rule's pattern may match anywhere
      val leftovers = Redaction.rules.map { case (name, re, _) =>
        name -> out.filter(regexp_count(col("redacted"), lit(re)) > 0).count()
      }.filter(_._2 > 0)
      assert(leftovers.isEmpty, s"unredacted PII remains: $leftovers")
      // every doc is preserved and counts are consistent with injections
      assert(out.count() == texts.size)
    }
  }

  test("packConcatSplit bins are contiguous, start at 0, and cover every doc") {
    import graft.ops.Packing
    val sizes: Gen[List[Int]] =
      Gen.listOfN(60, Gen.chooseNum(1, 40))
    forAll(sizes) { ns =>
      val df = ns.zipWithIndex
        .map { case (n, i) => (i.toLong * 3 + 1, (1 to n).map(j => s"t$j").mkString(" ")) }
        .toDF("doc_id", "text")
      val out = Packing.packConcatSplit(df, "doc_id", "text", budget = 64, buckets = 7)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(out.length == ns.size, "every doc packed exactly once")
      val bins = out.map(_._3)
      assert(bins.min == 0L, "first bin must be 0")
      val distinct = bins.distinct.sorted
      assert(distinct.zip(distinct.tail).forall { case (a, b) => b == a + 1 },
        s"bin ids must be contiguous: ${distinct.toList}")
      // total layout: last bin index == floor((total_tokens - last_doc)/budget)
      val total = out.map(_._2).sum
      assert(bins.max <= total / 64, "bin index beyond the token stream length")
    }
  }
}
