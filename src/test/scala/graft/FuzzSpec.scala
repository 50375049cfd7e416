package graft

/** Differential fuzzing of the core relational surface: 230 seeded random
  * plans (filter / project incl. guarded modulo / inner+left+right+full
  * join / semi+anti join / union / intersect+except in BOTH distinct and
  * ALL forms / agg / rollup+cube with grouping_id / having / distinct /
  * window functions with bounded ROWS and value RANGE frames, incl.
  * explicit NULLS FIRST|LAST ordering over a manufactured nullable key /
  * type-coercing positional union (long widened to double) /
  * order-by-limit over customer⋈orders⋈nation) evaluated through Spark
  * AND through [[Fuzz]]'s naive SQL-semantics interpreter, compared as
  * canonical multisets.
  *
  * The seed corpus is `1 to 230` with [[Fuzz.Gen]]'s deterministic
  * derivation — committing the generator commits the corpus, so a
  * regression reproduces with `new Gen(seed)` alone. Any disagreement is a
  * real semantic bug on one side: the interpreter shares no code with
  * Spark (three-valued logic, null-skipping aggregates, left-join padding
  * and NULLS FIRST ordering are re-derived from SQL semantics directly).
  */
class FuzzSpec extends SparkSpec {
  import Fuzz._

  // GRAFT_FUZZ_SEEDS widens the corpus for local shake-outs (e.g. 1000);
  // the committed gate stays at 230 so CI time is bounded (200 through
  // round 15; widened to 230 in round 16 when the subquery nodes
  // reshuffled the seed corpus and pushed the first modulo-arith plan to
  // seed 223)
  private val nSeeds = sys.env.getOrElse("GRAFT_FUZZ_SEEDS", "230").toInt

  test("230 seeded random plans agree with the naive interpreter (multiset-exact)") {
    val tables = loadTables(spark, sf001)
    val failures = (1 to nSeeds).iterator.flatMap { seed =>
      val rel = new Gen(seed.toLong).gen()
      val sparkM = sparkMultiset(toDF(spark, sf001, rel))
      val naiveM = naiveMultiset(schemaOf(rel).map(_._1), evalRel(tables, rel))
      if (sparkM == naiveM) None
      else {
        val onlySpark = (sparkM.keySet -- naiveM.keySet).take(2)
        val onlyNaive = (naiveM.keySet -- sparkM.keySet).take(2)
        val countDiff = sparkM.keySet.intersect(naiveM.keySet)
          .filter(k => sparkM(k) != naiveM(k)).take(2)
        Some(s"seed=$seed sparkRows=${sparkM.values.sum} naiveRows=${naiveM.values.sum}" +
          s" onlySpark=$onlySpark onlyNaive=$onlyNaive countDiff=$countDiff\n  rel=$rel")
      }
    }.toSeq
    assert(failures.isEmpty, s"${failures.size} seeds diverged:\n" +
      failures.take(3).mkString("\n"))
  }

  test("the generated corpus exercises every operator of the surface") {
    // guards against a generator regression that silently stops producing
    // some operator (the differential test would then vacuously pass on it)
    def predFeats(p: Pred): Set[String] = p match {
      case Cmp(_, ColRef(_), ColRef(_)) => Set("colcolcmp")
      case Cmp(_, _, _)                 => Set.empty
      case And(a, b)                    => predFeats(a) ++ predFeats(b)
      case Or(a, b)                     => predFeats(a) ++ predFeats(b)
      case Not(a)                       => predFeats(a)
      case InList(_, _)                 => Set("inlist")
      case LikeP(_, _)                  => Set("like")
    }
    def ops(r: Rel): Set[String] = r match {
      case Base(_)              => Set("base")
      case FilterR(in, p)       => ops(in) + "filter" ++ predFeats(p)
      case ProjectR(in, cs)     => ops(in) + "project" ++
        (if (cs.exists(_._2.isInstanceOf[CaseW])) Set("caseexpr") else Set.empty) ++
        (if (cs.exists(_._2.isInstanceOf[Coalesce2])) Set("coalesce") else Set.empty) ++
        (if (cs.exists(_._2.isInstanceOf[NullIfE])) Set("nullif") else Set.empty) ++
        (if (cs.exists(_._2.isInstanceOf[Upper])) Set("upperfn") else Set.empty) ++
        (if (cs.exists(_._2.isInstanceOf[Substr])) Set("substrfn") else Set.empty) ++
        (if (cs.exists(_._2.isInstanceOf[Concat2])) Set("concatfn") else Set.empty) ++
        (if (cs.exists(_._2 match { case Arith('%', _, _) => true; case _ => false }))
          Set("modarith") else Set.empty)
      case JoinR(l, rr, _, _, jt) => ops(l) ++ ops(rr) + s"${jt}join"
      case SemiR(l, rr, _, _, anti) =>
        ops(l) ++ ops(rr) + (if (anti) "antijoin" else "semijoin")
      case UnionR(a, b)         => ops(a) ++ ops(b) + "union"
      case SetR(a, b, except, all) =>
        ops(a) ++ ops(b) + ((except, all) match {
          case (true, false)  => "except"
          case (false, false) => "intersect"
          case (true, true)   => "exceptall"
          case (false, true)  => "intersectall"
        })
      case AggR(in, _, aggs)    =>
        ops(in) + "agg" ++
          (if (aggs.exists(_._2.isInstanceOf[AvgL])) Set("avg") else Set.empty)
      case RollupR(in, _, _, _, cube) =>
        ops(in) + (if (cube) "cube" else "rollup")
      case DistinctR(in)        => ops(in) + "distinct"
      case WindowR(in, _, _, _) => ops(in) + "window"
      case WinSumR(in, _, _, _, _) => ops(in) + "winsum"
      case WinFrameR(in, _, _, _, _, _, _, fn) =>
        ops(in) + "windowframe" + s"frame_$fn"
      case WinRangeR(in, _, _, _, _, _) => ops(in) + "rangeframe"
      case SortLimitR(in, _)    => ops(in) + "sortlimit"
      case WinNullsR(in, _, _, _, nl) =>
        ops(in) + (if (nl) "winnullslast" else "winnullsfirst")
      case UnionCoerceR(a, b)   => ops(a) ++ ops(b) + "unioncoerce"
      case ExistsR(o, i, _, _, ip, ineq, anti) =>
        ops(o) ++ ops(i) + (if (anti) "antiexistssubq" else "existssubq") ++
          (if (ineq.isDefined) Set("existsineq") else Set.empty) ++
          ip.map(predFeats).getOrElse(Set.empty)
      case ScalarSubqR(o, i, _, _, fn) =>
        ops(o) ++ ops(i) + "scalarsubq" ++
          (if (fn == CountStar) Set("scalarsubqcount") else Set.empty)
    }
    val seen = (1 to 230).foldLeft(Set.empty[String]) { (acc, seed) =>
      acc ++ ops(new Gen(seed.toLong).gen())
    }
    val expected = Set("base", "filter", "project", "innerjoin", "leftjoin",
      "rightjoin", "fulljoin", "semijoin", "antijoin", "union", "intersect",
      "except", "exceptall", "intersectall", "agg", "avg", "distinct",
      "window", "winsum", "windowframe",
      "frame_sum", "frame_min", "frame_max", "frame_cnt",
      "rangeframe", "sortlimit", "rollup", "cube",
      "colcolcmp", "caseexpr", "inlist", "coalesce", "nullif",
      "upperfn", "substrfn", "like", "modarith", "concatfn",
      // round-13 seams: explicit null ordering inside window specs (both
      // placements) and positional-union type coercion
      "winnullsfirst", "winnullslast", "unioncoerce",
      // round-16 seams: correlated subqueries through the DataFrame
      // subquery API — predicate decorrelation (EXISTS / NOT EXISTS,
      // incl. a non-equi correlated inequality) and the scalar-subquery
      // left-outer rewrite with COUNT's empty-group zero
      "existssubq", "antiexistssubq", "existsineq",
      "scalarsubq", "scalarsubqcount")
    assert(expected.subsetOf(seen), s"missing operators: ${expected -- seen}")
  }
}
