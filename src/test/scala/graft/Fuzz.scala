package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Random-plan differential fuzzer: seeded generator over the core
  * relational surface (filter / project incl. guarded modulo /
  * inner+left+right+full join / semi + anti join / union / intersect +
  * except in distinct AND ALL forms / aggregate / rollup + cube with
  * grouping_id / having / distinct / window: row_number, running sum,
  * bounded ROWS frames, value-based RANGE frames / order-by-limit),
  * evaluated twice —
  *
  *  1. through Spark (DataFrame API → Catalyst → Tungsten), and
  *  2. through a NAIVE Scala-collections interpreter written against SQL
  *     semantics directly (three-valued predicate logic, null-skipping
  *     aggregates, left-join null padding),
  *
  * then compared as multisets. The interpreter shares no code with Spark,
  * so any disagreement is a real semantic bug in one of them; 200 seeds
  * cover operator compositions the hand-written registry cannot.
  *
  * Determinism rules that make bit-exact comparison sound:
  *  - integral arithmetic is promoted to Long on BOTH sides (no int
  *    wraparound divergence, no ANSI overflow: the generator additionally
  *    forbids '*' over already-derived operands, bounding magnitudes);
  *  - double arithmetic uses the same IEEE ops in the same tree order on
  *    both sides (+, -, * only — no division, no re-association), and
  *    -0.0 is normalized to 0.0 at production and rendering on both sides
  *    (mirroring Spark's NormalizeFloatingNumbers on grouping keys);
  *  - window ordering always carries a unique tiebreak key;
  *  - canonical rows join values with a "\u0001" separator no fixture value
  *    contains, so renderings cannot alias across column boundaries.
  */
object Fuzz {

  // ---- tiny relational AST ----------------------------------------------

  sealed trait Typ
  case object TLong extends Typ
  case object TDouble extends Typ
  case object TString extends Typ

  sealed trait Expr
  final case class ColRef(name: String) extends Expr
  final case class LitL(v: Long) extends Expr
  final case class LitD(v: Double) extends Expr
  final case class LitS(v: String) extends Expr
  /** op ∈ + - * % ; integral operands promoted to Long, any double →
    * double. '%' is generated over LONG operands only and renders with a
    * zero-divisor guard (NULL, never an ANSI error): Java sign semantics
    * (sign of the dividend) on both sides.
    */
  final case class Arith(op: Char, a: Expr, b: Expr) extends Expr
  /** CASE WHEN p THEN t ELSE e END. Generator invariant: both branches
    * resolve to the SAME type, so neither engine inserts a numeric
    * promotion the other might state differently. Three-valued predicate
    * semantics: an UNKNOWN condition takes the ELSE branch — the exact
    * place engines historically disagree with hand-rolled interpreters.
    */
  final case class CaseW(p: Pred, t: Expr, e: Expr) extends Expr
  final case class Coalesce2(a: Expr, b: Expr) extends Expr // same-typed pair
  final case class Upper(a: Expr) extends Expr               // string → string
  /** string concatenation; SQL semantics: NULL if either side is NULL */
  final case class Concat2(a: Expr, b: Expr) extends Expr
  final case class Substr(a: Expr, pos: Int, len: Int) extends Expr // 1-based, pos/len >= 1
  final case class NullIfE(a: Expr, b: Expr) extends Expr   // same-typed pair

  sealed trait Pred
  final case class Cmp(op: String, a: Expr, b: Expr) extends Pred // < <= = != > >=
  final case class And(a: Pred, b: Pred) extends Pred
  final case class Or(a: Pred, b: Pred) extends Pred
  final case class Not(a: Pred) extends Pred
  /** `c IN (v1, ..)` over non-null literals of the column's kind. 3VL: a
    * null probe is UNKNOWN (so `NOT (x IN ...)` with null x filters the
    * row too — the classic NOT IN trap, here with literal lists).
    */
  final case class InList(c: ColRef, vs: Seq[Expr]) extends Pred
  final case class LikeP(c: ColRef, pattern: String) extends Pred // SQL LIKE, % and _ only

  sealed trait AggFn
  case object CountStar extends AggFn
  final case class SumL(col: String) extends AggFn   // Long column sums only
  final case class MinC(col: String) extends AggFn
  final case class MaxC(col: String) extends AggFn
  /** avg over a LONG column only: Spark's `Average` over integral input
    * accumulates an exact Long sum and divides once at the end
    * (`sum.toDouble / count`), which is exactly what the interpreter
    * computes — one identical IEEE division on both sides. (A double
    * column's sum is order-dependent across partitions — never fuzzable.)
    */
  final case class AvgL(col: String) extends AggFn

  sealed trait Rel
  final case class Base(name: String) extends Rel
  final case class FilterR(in: Rel, p: Pred) extends Rel
  final case class ProjectR(in: Rel, cols: Seq[(String, Expr)]) extends Rel
  /** Key-equality join; `jt` ∈ inner | left | right | full. Outer-join
    * null padding × three-valued logic is where engines genuinely
    * disagree (round-8 verdict #5), so all four types are fuzzed. Sides
    * always have disjoint column names (generator invariant), so the
    * interpreter's map-merge equals Spark's positional schema concat.
    */
  final case class JoinR(l: Rel, r: Rel, lk: String, rk: String, jt: String) extends Rel
  /** left-semi (anti = false) / left-anti (anti = true) on key equality;
    * output schema is the LEFT side only. SQL semantics: a null left key
    * matches nothing, so semi drops it and anti keeps it.
    */
  final case class SemiR(l: Rel, r: Rel, lk: String, rk: String, anti: Boolean) extends Rel
  /** bag-semantics positional union of two same-schema relations */
  final case class UnionR(a: Rel, b: Rel) extends Rel
  /** SET-semantics INTERSECT / EXCEPT (DISTINCT forms — what Spark's
    * `intersect`/`except` implement): distinct rows of `a` present
    * (resp. absent) in `b`, with NULL-SAFE row equality — unlike the
    * `=` of a join predicate, two all-NULL rows compare EQUAL here.
    */
  /** `all = true` switches to BAG semantics (EXCEPT ALL / INTERSECT
    * ALL): per canonical row, except-all keeps max(0, n_a - n_b) copies
    * and intersect-all min(n_a, n_b) — the multiset corner the
    * distinct forms never touch.
    */
  final case class SetR(a: Rel, b: Rel, except: Boolean,
                        all: Boolean = false) extends Rel
  final case class AggR(in: Rel, key: String, aggs: Seq[(String, AggFn)]) extends Rel
  /** GROUP BY ROLLUP(k1, k2) with grouping_id(): the (k1,k2) detail level
    * ++ the (k1) subtotal (k2 rolled to NULL) ++ the grand total — `gid`
    * ∈ {0,1,3} is what distinguishes a REAL NULL key value from a
    * rolled-up one (the q216 semantic, now under differential fuzz).
    * `cube = true` adds the (k2) level (gid 2) — full GROUP BY CUBE.
    */
  final case class RollupR(in: Rel, k1: String, k2: String,
                           aggs: Seq[(String, AggFn)],
                           cube: Boolean = false) extends Rel
  final case class DistinctR(in: Rel) extends Rel
  /** row_number() over (partition by part order by ord, tiebreak) */
  final case class WindowR(in: Rel, part: String, ord: String, tiebreak: String) extends Rel
  /** sum(`valCol`) over (partition by part order by ord, tiebreak
    * ROWS UNBOUNDED PRECEDING..CURRENT ROW) as "runsum" — exercises
    * running-frame aggregation semantics (null-skipping inside the
    * frame, Long accumulation) that row_number cannot. The ordering
    * carries the tiebreak so the frame contents are total.
    */
  final case class WinSumR(in: Rel, part: String, ord: String, tiebreak: String,
                           valCol: String) extends Rel
  /** sum(`valCol`) over (partition by part order by ord, tiebreak
    * ROWS BETWEEN lo PRECEDING AND hi FOLLOWING) as "fsum" — the bounded
    * SLIDING frame [[WinSumR]]'s running frame cannot reach: frame
    * contents depend on physical neighbors, so the order must be TOTAL
    * ((ord, tiebreak) unique), which the generator guarantees by only
    * emitting this over a base table with its primary key as tiebreak.
    */
  final case class WinFrameR(in: Rel, part: String, ord: String,
                             tiebreak: String, valCol: String,
                             lo: Int, hi: Int,
                             fn: String = "sum") extends Rel
  // fn ∈ sum | min | max | cnt over the frame ("fsum" stays the output
  // name); valCol is always a Long column by generator contract. cnt is
  // the non-null COUNT — the one frame aggregate that yields 0, not
  // null, on an empty/all-null frame.
  /** sum(`valCol`) over (partition by part order by ord
    * RANGE BETWEEN lo PRECEDING AND hi FOLLOWING) as "rsum" — VALUE-based
    * frames: all PEERS of a bound enter the frame together, so no
    * tiebreak is needed for determinism even under ties (the semantic
    * difference from ROWS that makes range frames fuzz-worthy). The
    * generator only emits a non-null Long `ord` (a base key column), so
    * null-ordering peer-group rules never enter the comparison.
    */
  final case class WinRangeR(in: Rel, part: String, ord: String,
                             valCol: String, lo: Long, hi: Long) extends Rel
  /** ORDER BY every column (schema order, ASC NULLS FIRST) + LIMIT n —
    * the TakeOrderedAndProject path. The full-column sort is total up to
    * exact duplicate rows, and ties among exact duplicates cannot change
    * the result MULTISET, so the comparison stays sound without a unique
    * key.
    */
  final case class SortLimitR(in: Rel, n: Int) extends Rel
  /** row_number() over (partition by part order by <nullable ord> ASC
    * NULLS FIRST|LAST, tiebreak) — EXPLICIT null ordering inside a window
    * spec, one of the two SQL seams hand-rolled engines most often get
    * wrong (round-12 verdict stretch). The fixture key columns are
    * non-null, so the nullable ordering key is MANUFACTURED: every `ord`
    * value divisible by 3 becomes NULL (on both sides identically). The
    * tiebreak keeps the order total WITHIN the null peer group, so row
    * numbers stay deterministic under either null placement.
    */
  final case class WinNullsR(in: Rel, part: String, ord: String,
                             tiebreak: String, nullsLast: Boolean) extends Rel
  /** Positional UNION ALL of two same-arity projections whose column
    * types DIFFER at ≥1 position (long vs double) — the type-COERCION
    * seam plain [[UnionR]] never touches: Spark's WidenSetOperationTypes
    * widens the union schema to double, and the interpreter re-derives
    * the same positional widening (long values render as doubles).
    * Output column names are the LEFT side's (Spark's rule).
    */
  final case class UnionCoerceR(a: Rel, b: Rel) extends Rel
  /** Correlated [NOT] EXISTS filter: keeps outer rows o for which (NOT)
    * ∃ inner row i with i.`ik` = o.`ok`, i satisfying `innerPred`, and —
    * when `ineq` = Some((in, on)) — i.`in` > o.`on` (a NON-equi
    * correlated predicate). Semantically this overlaps [[SemiR]], which
    * is the point: the Spark side goes through `Dataset.exists()` +
    * `Column.outer()` — a SubqueryExpression the analyzer must
    * DECORRELATE (RewritePredicateSubquery → semi/anti join with the
    * correlated predicates as join conditions), a seam previously
    * exercised only by hand-written TPC-H registry shapes (q65-q67, q75,
    * q78, q107) — while the interpreter evaluates the definition
    * directly, per outer row. Any disagreement is a decorrelation bug.
    */
  final case class ExistsR(outer: Rel, inner: Rel, ok: String, ik: String,
                           innerPred: Option[Pred],
                           ineq: Option[(String, String)],
                           anti: Boolean) extends Rel
  /** Correlated SCALAR subquery projected as a column: for each outer
    * row, `fn` over the inner rows with i.`ik` = o.`ok`, as "sc". The
    * Spark side is `Dataset.scalar()` — RewriteCorrelatedScalarSubquery
    * turns it into a left-outer join + aggregate, and the empty
    * correlation group is where engines historically break: COUNT must
    * yield 0 for unmatched outer rows (the classic decorrelation "count
    * bug"), every other aggregate NULL. The interpreter states the
    * definition directly.
    */
  final case class ScalarSubqR(outer: Rel, inner: Rel, ok: String, ik: String,
                               fn: AggFn) extends Rel

  // ---- schemas of the three fuzz tables ---------------------------------

  val schemas: Map[String, Seq[(String, Typ)]] = Map(
    "customer" -> Seq("c_custkey" -> TLong, "c_nationkey" -> TLong,
      "c_acctbal" -> TDouble, "c_mktsegment" -> TString),
    "orders" -> Seq("o_orderkey" -> TLong, "o_custkey" -> TLong,
      "o_totalprice" -> TDouble, "o_orderstatus" -> TString),
    "nation" -> Seq("n_nationkey" -> TLong, "n_name" -> TString,
      "n_regionkey" -> TLong))

  /** Type of `e` resolved against the input schema (needed because ColRef
    * and Arith carry no type of their own).
    */
  def resolveType(e: Expr, schema: Seq[(String, Typ)]): Typ = e match {
    case ColRef(n) => schema.find(_._1 == n)
      .getOrElse(sys.error(s"unbound column $n"))._2
    case _: LitL => TLong
    case _: LitD => TDouble
    case _: LitS => TString
    case Arith(_, a, b) =>
      if (resolveType(a, schema) == TDouble || resolveType(b, schema) == TDouble)
        TDouble
      else TLong
    case CaseW(_, t, _) => resolveType(t, schema) // branches same-typed
    case Coalesce2(a, _) => resolveType(a, schema)
    case Upper(_)        => TString
    case Concat2(_, _)   => TString
    case Substr(_, _, _) => TString
    case NullIfE(a, _)   => resolveType(a, schema)
  }

  private def aggTyp(fn: AggFn, inSchema: Seq[(String, Typ)]): Typ = fn match {
    case CountStar | SumL(_) => TLong
    case AvgL(_)             => TDouble
    case MinC(c)             => inSchema.find(_._1 == c).get._2
    case MaxC(c)             => inSchema.find(_._1 == c).get._2
  }

  def schemaOf(r: Rel): Seq[(String, Typ)] = r match {
    case Base(n)          => schemas(n)
    case FilterR(in, _)   => schemaOf(in)
    case ProjectR(in, cs) =>
      val inSchema = schemaOf(in)
      cs.map { case (n, e) => n -> resolveType(e, inSchema) }
    case JoinR(l, rr, _, _, _) => schemaOf(l) ++ schemaOf(rr)
    case SemiR(l, _, _, _, _)  => schemaOf(l)
    case UnionR(a, _)          => schemaOf(a)
    case SetR(a, _, _, _)      => schemaOf(a)
    case AggR(in, k, aggs) =>
      val inSchema = schemaOf(in)
      val kt = inSchema.find(_._1 == k).get._2
      (k -> kt) +: aggs.map { case (n, fn) => n -> aggTyp(fn, inSchema) }
    case RollupR(in, k1, k2, aggs, _) =>
      val inSchema = schemaOf(in)
      def kt(k: String) = inSchema.find(_._1 == k).get._2
      Seq(k1 -> kt(k1), k2 -> kt(k2), ("gid", TLong): (String, Typ)) ++
        aggs.map { case (n, fn) => n -> aggTyp(fn, inSchema) }
    case DistinctR(in)    => schemaOf(in)
    case WindowR(in, _, _, _) => schemaOf(in) :+ ("rn" -> TLong)
    case WinSumR(in, _, _, _, _) => schemaOf(in) :+ ("runsum" -> TLong)
    case WinFrameR(in, _, _, _, _, _, _, _) => schemaOf(in) :+ ("fsum" -> TLong)
    case WinRangeR(in, _, _, _, _, _) => schemaOf(in) :+ ("rsum" -> TLong)
    case SortLimitR(in, _) => schemaOf(in)
    case WinNullsR(in, _, _, _, _) => schemaOf(in) :+ ("rn" -> TLong)
    case UnionCoerceR(a, b) =>
      // positional widening: double wins over long; names from the left
      schemaOf(a).zip(schemaOf(b)).map { case ((n, ta), (_, tb)) =>
        n -> (if (ta == TDouble || tb == TDouble) TDouble else ta)
      }
    case ExistsR(outer, _, _, _, _, _, _) => schemaOf(outer)
    case ScalarSubqR(outer, inner, _, _, fn) =>
      schemaOf(outer) :+ ("sc" -> aggTyp(fn, schemaOf(inner)))
  }

  // ---- Spark evaluation --------------------------------------------------

  /** `schema` is the schema of the relation the expression is evaluated
    * over — needed so integral columns (possibly Int32 in parquet) are
    * promoted to Long exactly when the interpreter promotes, and double
    * columns are NEVER cast (a blanket long cast would truncate).
    */
  def toColumn(e: Expr, schema: Seq[(String, Typ)]): Column = e match {
    case ColRef(n) =>
      if (resolveType(e, schema) == TLong) col(n).cast("long") else col(n)
    case LitL(v)        => lit(v)
    case LitD(v)        => lit(v)
    case LitS(v)        => lit(v)
    case Arith(op, a, b) =>
      val (ca, cb) = (toColumn(a, schema), toColumn(b, schema))
      op match {
        case '+' => ca + cb
        case '-' => ca - cb
        case '*' => ca * cb
        // NULL on zero divisor, stated in the PLAN (when guards the %
        // from ever executing) so ANSI mode cannot throw
        case '%' => when(cb === 0, lit(null)).otherwise(ca % cb)
      }
    case CaseW(p, t, e2) =>
      when(toSparkPred(p, schema), toColumn(t, schema))
        .otherwise(toColumn(e2, schema))
    case Coalesce2(a, b) => coalesce(toColumn(a, schema), toColumn(b, schema))
    case Upper(a)          => upper(toColumn(a, schema))
    case Concat2(a, b)     => concat(toColumn(a, schema), toColumn(b, schema))
    case Substr(a, p, l)   => substring(toColumn(a, schema), p, l)
    case NullIfE(a, b) =>
      // SQL NULLIF(a, b): NULL when a = b is TRUE; a otherwise —
      // including when the comparison is UNKNOWN (a NULL operand)
      val (ca, cb) = (toColumn(a, schema), toColumn(b, schema))
      when(ca === cb, lit(null)).otherwise(ca)
  }

  def toSparkPred(p: Pred, schema: Seq[(String, Typ)]): Column = p match {
    case Cmp(op, a, b) =>
      val (ca, cb) = (toColumn(a, schema), toColumn(b, schema))
      op match {
        case "<" => ca < cb;  case "<=" => ca <= cb
        case "=" => ca === cb; case "!=" => ca =!= cb
        case ">" => ca > cb;  case ">=" => ca >= cb
      }
    case And(a, b) => toSparkPred(a, schema) && toSparkPred(b, schema)
    case Or(a, b)  => toSparkPred(a, schema) || toSparkPred(b, schema)
    case Not(a)    => !toSparkPred(a, schema)
    case LikeP(c, pattern) => toColumn(c, schema).like(pattern)
    case InList(c, vs) =>
      toColumn(c, schema).isin(vs.map {
        case LitL(v) => v; case LitD(v) => v; case LitS(v) => v
        case other   => sys.error(s"non-literal IN value: $other")
      }: _*)
  }

  def toDF(spark: SparkSession, sfDir: String, r: Rel): DataFrame = r match {
    case Base(n) =>
      graft.sources.Tables.table(spark, sfDir, n)
        .select(schemas(n).map { case (c, _) => col(c) }: _*)
    case FilterR(in, p)  =>
      toDF(spark, sfDir, in).filter(toSparkPred(p, schemaOf(in)))
    case ProjectR(in, cs) =>
      val inSchema = schemaOf(in)
      toDF(spark, sfDir, in)
        .select(cs.map { case (n, e) => toColumn(e, inSchema).alias(n) }: _*)
    case JoinR(l, rr, lk, rk, jt) =>
      val (dl, dr) = (toDF(spark, sfDir, l), toDF(spark, sfDir, rr))
      dl.join(dr, dl(lk) === dr(rk), jt)
    case SemiR(l, rr, lk, rk, anti) =>
      val (dl, dr) = (toDF(spark, sfDir, l), toDF(spark, sfDir, rr))
      dl.join(dr, dl(lk) === dr(rk), if (anti) "left_anti" else "left_semi")
    case UnionR(a, b) => toDF(spark, sfDir, a).union(toDF(spark, sfDir, b))
    case SetR(a, b, except, all) =>
      val (da, db) = (toDF(spark, sfDir, a), toDF(spark, sfDir, b))
      (except, all) match {
        case (true, false)  => da.except(db)
        case (false, false) => da.intersect(db)
        case (true, true)   => da.exceptAll(db)
        case (false, true)  => da.intersectAll(db)
      }
    case AggR(in, k, aggs) =>
      toDF(spark, sfDir, in).groupBy(col(k)).agg(
        aggCol(aggs.head._1, aggs.head._2),
        aggs.tail.map { case (n, fn) => aggCol(n, fn) }: _*)
    case RollupR(in, k1, k2, aggs, cube) =>
      val grouped =
        if (cube) toDF(spark, sfDir, in).cube(col(k1), col(k2))
        else toDF(spark, sfDir, in).rollup(col(k1), col(k2))
      grouped.agg(
        grouping_id().cast("long").alias("gid"),
        aggs.map { case (n, fn) => aggCol(n, fn) }: _*)
    case DistinctR(in)   => toDF(spark, sfDir, in).distinct()
    case WindowR(in, part, ord, tb) =>
      import org.apache.spark.sql.expressions.Window
      toDF(spark, sfDir, in).withColumn("rn",
        row_number().over(Window.partitionBy(col(part)).orderBy(col(ord), col(tb)))
          .cast("long"))
    case WinSumR(in, part, ord, tb, v) =>
      import org.apache.spark.sql.expressions.Window
      toDF(spark, sfDir, in).withColumn("runsum",
        sum(col(v).cast("long")).over(
          Window.partitionBy(col(part)).orderBy(col(ord), col(tb))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    case WinFrameR(in, part, ord, tb, v, lo, hi, fn) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col(part)).orderBy(col(ord), col(tb))
        .rowsBetween(-lo.toLong, hi.toLong)
      val agg = fn match {
        case "sum" => sum(col(v).cast("long")).over(w)
        case "min" => min(col(v)).over(w).cast("long")
        case "max" => max(col(v)).over(w).cast("long")
        case "cnt" => count(col(v)).over(w)
      }
      toDF(spark, sfDir, in).withColumn("fsum", agg)
    case WinRangeR(in, part, ord, v, lo, hi) =>
      import org.apache.spark.sql.expressions.Window
      toDF(spark, sfDir, in).withColumn("rsum",
        sum(col(v).cast("long")).over(
          Window.partitionBy(col(part)).orderBy(col(ord).cast("long"))
            .rangeBetween(-lo, hi)))
    case SortLimitR(in, n) =>
      val cols = schemaOf(in).map { case (c, _) => col(c).asc_nulls_first }
      toDF(spark, sfDir, in).orderBy(cols: _*).limit(n)
    case WinNullsR(in, part, ord, tb, nl) =>
      import org.apache.spark.sql.expressions.Window
      val key = when(col(ord).cast("long") % 3 === 0, lit(null))
        .otherwise(col(ord).cast("long"))
      val o = if (nl) key.asc_nulls_last else key.asc_nulls_first
      toDF(spark, sfDir, in).withColumn("rn",
        row_number().over(Window.partitionBy(col(part)).orderBy(o, col(tb)))
          .cast("long"))
    case UnionCoerceR(a, b) =>
      // no explicit casts: the coercion under test is Spark's own
      // WidenSetOperationTypes on the union node
      toDF(spark, sfDir, a).union(toDF(spark, sfDir, b))
    case ExistsR(outer, inner, ok, ik, ip, ineq, anti) =>
      // col(ok).outer() marks the OUTER reference inside the subquery
      // plan (names are disjoint across the fuzz tables, so resolution is
      // unambiguous); everything else resolves against the inner relation
      val douter = toDF(spark, sfDir, outer)
      val corrEq = col(ik) === col(ok).outer()
      val corr = ineq.foldLeft(
        ip.foldLeft(corrEq)((c, p) => c && toSparkPred(p, schemaOf(inner)))) {
        case (c, (in, on)) => c && (col(in) > col(on).outer())
      }
      val ex = toDF(spark, sfDir, inner).filter(corr).exists()
      douter.filter(if (anti) !ex else ex)
    case ScalarSubqR(outer, inner, ok, ik, fn) =>
      // Dataset-API `.scalar()` cannot resolve a lazy `.outer()` reference
      // BELOW the subquery's aggregate in Spark 4.1 (probed: the same
      // reference under `.exists()` resolves; under `.agg(..).scalar()`
      // it fails analysis), so this node enters through the SQL front
      // door — the analyzer seam under test
      // (RewriteCorrelatedScalarSubquery) is identical.
      val (on, in) = (outer, inner) match {
        case (Base(a), Base(b)) => (a, b)
        case other => sys.error(s"ScalarSubqR over non-base relations: $other")
      }
      Seq(on, in).foreach { n =>
        graft.sources.Tables.table(spark, sfDir, n).createOrReplaceTempView(n)
      }
      val fnSql = fn match {
        case CountStar => "count(1)"
        case SumL(c)   => s"sum(cast($c as bigint))"
        case AvgL(c)   => s"avg(cast($c as bigint))"
        case MinC(c)   => s"min($c)"
        case MaxC(c)   => s"max($c)"
      }
      val outerCols = schemas(on).map { case (c, _) => s"o.$c" }.mkString(", ")
      spark.sql(
        s"SELECT $outerCols, (SELECT $fnSql FROM $in i WHERE i.$ik = o.$ok) AS sc " +
          s"FROM $on o")
  }

  private def aggCol(name: String, fn: AggFn): Column = fn match {
    case CountStar => count(lit(1)).alias(name)
    case SumL(c)   => sum(col(c).cast("long")).alias(name)
    case MinC(c)   => min(col(c)).alias(name)
    case MaxC(c)   => max(col(c)).alias(name)
    case AvgL(c)   => avg(col(c).cast("long")).alias(name)
  }

  // ---- naive interpreter -------------------------------------------------

  /** A row is column-name → value; null is represented as Java null. */
  type NRow = Map[String, Any]

  def evalExpr(e: Expr, row: NRow): Any = e match {
    case ColRef(n) => row(n)
    case LitL(v)   => v
    case LitD(v)   => v
    case LitS(v)   => v
    case Arith(op, a, b) =>
      val (va, vb) = (evalExpr(a, row), evalExpr(b, row))
      if (va == null || vb == null) null
      else (va, vb) match {
        case (x: Double, y) => darith(op, x, toD(y))
        case (x, y: Double) => darith(op, toD(x), y)
        case (x, y)         =>
          if (op == '%' && toL(y) == 0L) null
          else larith(op, toL(x), toL(y))
      }
    case CaseW(p, t, e2) =>
      // SQL: only a TRUE condition takes the THEN branch; FALSE and
      // UNKNOWN both fall to ELSE
      if (evalPred(p, row).contains(true)) evalExpr(t, row)
      else evalExpr(e2, row)
    case Coalesce2(a, b) =>
      val va = evalExpr(a, row)
      if (va == null) evalExpr(b, row) else va
    case Upper(a) =>
      val va = evalExpr(a, row)
      if (va == null) null else va.asInstanceOf[String].toUpperCase(java.util.Locale.ROOT)
    case Concat2(a, b) =>
      val (va, vb) = (evalExpr(a, row), evalExpr(b, row))
      if (va == null || vb == null) null
      else va.asInstanceOf[String] + vb.asInstanceOf[String]
    case Substr(a, p, l) =>
      // SQL substring with 1-based pos >= 1: past-the-end is empty, the
      // slice clamps to the string's length (fixture strings are ASCII,
      // so code-unit slicing == codepoint slicing on both sides)
      val va = evalExpr(a, row)
      if (va == null) null
      else {
        val str = va.asInstanceOf[String]
        val st = p - 1
        if (st >= str.length) "" else str.substring(st, math.min(st + l, str.length))
      }
    case NullIfE(a, b) =>
      // NULL only when a = b is TRUE; a NULL operand makes the
      // comparison UNKNOWN and the result is `a` unchanged
      val (va, vb) = (evalExpr(a, row), evalExpr(b, row))
      if (va == null || vb == null) va
      else {
        val eq = (va, vb) match {
          case (x: String, y: String) => x == y
          case (x, y) if x.isInstanceOf[Double] || y.isInstanceOf[Double] =>
            toD(x) == toD(y)
          case (x, y) => toL(x) == toL(y)
        }
        if (eq) null else va
      }
  }

  private def toD(v: Any): Double = v match {
    case d: Double => d; case l: Long => l.toDouble; case i: Int => i.toDouble
    case other => sys.error(s"not numeric: $other")
  }
  private def toL(v: Any): Long = v match {
    case l: Long => l; case i: Int => i.toLong
    case other => sys.error(s"not integral: $other")
  }
  /** -0.0 → 0.0 so the interpreter never materializes a negative zero:
    * Spark's primitive double comparisons treat them as equal and
    * NormalizeFloatingNumbers scrubs them from grouping keys, so a raw
    * -0.0 on one side only would alias rows differently.
    */
  private def darith(op: Char, a: Double, b: Double): Double = {
    val r = op match { case '+' => a + b; case '-' => a - b; case '*' => a * b }
    if (r == 0.0) 0.0 else r
  }
  private def larith(op: Char, a: Long, b: Long): Long =
    op match { case '+' => a + b; case '-' => a - b; case '*' => a * b
               case '%' => a % b } // Java sign semantics, matching Spark

  /** SQL three-valued logic: None = UNKNOWN. */
  def evalPred(p: Pred, row: NRow): Option[Boolean] = p match {
    case Cmp(op, a, b) =>
      val (va, vb) = (evalExpr(a, row), evalExpr(b, row))
      if (va == null || vb == null) None
      else {
        val c = (va, vb) match {
          case (x: String, y: String) => x.compareTo(y)
          case (x, y) if x.isInstanceOf[Double] || y.isInstanceOf[Double] =>
            java.lang.Double.compare(toD(x), toD(y))
          case (x, y) => java.lang.Long.compare(toL(x), toL(y))
        }
        Some(op match {
          case "<" => c < 0;  case "<=" => c <= 0
          case "=" => c == 0; case "!=" => c != 0
          case ">" => c > 0;  case ">=" => c >= 0
        })
      }
    case And(a, b) => (evalPred(a, row), evalPred(b, row)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true))            => Some(true)
      case _                                   => None
    }
    case Or(a, b) => (evalPred(a, row), evalPred(b, row)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false))        => Some(false)
      case _                                 => None
    }
    case Not(a) => evalPred(a, row).map(!_)
    case LikeP(c, pattern) =>
      val v = evalExpr(c, row)
      if (v == null) None
      else {
        // LIKE → anchored regex: % = .*, _ = ., \x = literal x (Spark's
        // escape char), everything else literal. (?s) = DOTALL so a
        // newline inside a fixture string still matches %/_ the way
        // Spark's like() does.
        val sb = new StringBuilder("(?s)")
        var i = 0
        while (i < pattern.length) {
          pattern(i) match {
            case '\\' if i + 1 < pattern.length =>
              sb.append(java.util.regex.Pattern.quote(pattern(i + 1).toString))
              i += 1
            case '%' => sb.append(".*")
            case '_' => sb.append(".")
            case ch  => sb.append(java.util.regex.Pattern.quote(ch.toString))
          }
          i += 1
        }
        Some(v.asInstanceOf[String].matches(sb.toString))
      }
    case InList(c, vs) =>
      val v = evalExpr(c, row)
      if (v == null) None
      else Some(vs.exists { lv =>
        val w = evalExpr(lv, row)
        (v, w) match {
          case (x: String, y: String) => x == y
          case (x, y) if x.isInstanceOf[Double] || y.isInstanceOf[Double] =>
            toD(x) == toD(y)
          case (x, y) => toL(x) == toL(y)
        }
      })
  }

  /** Null-skipping aggregate evaluation shared by [[AggR]] and [[RollupR]]
    * (empty input: count 0, every other aggregate null).
    */
  private def aggValues(aggs: Seq[(String, AggFn)], rows: Seq[NRow]): Map[String, Any] =
    aggs.map { case (n, fn) =>
      n -> (fn match {
        case CountStar => rows.size.toLong
        case SumL(c) =>
          val vs = rows.map(_(c)).filter(_ != null).map(toL)
          if (vs.isEmpty) null else vs.sum
        case MinC(c) => minMax(rows.map(_(c)).filter(_ != null), isMin = true)
        case MaxC(c) => minMax(rows.map(_(c)).filter(_ != null), isMin = false)
        case AvgL(c) =>
          val vs = rows.map(_(c)).filter(_ != null).map(toL)
          if (vs.isEmpty) null else vs.sum.toDouble / vs.size
      })
    }.toMap

  def evalRel(tables: Map[String, Seq[NRow]], r: Rel): Seq[NRow] = r match {
    case Base(n)        => tables(n)
    case FilterR(in, p) => evalRel(tables, in).filter(evalPred(p, _).contains(true))
    case ProjectR(in, cs) =>
      evalRel(tables, in).map(row => cs.map { case (n, e) => n -> evalExpr(e, row) }.toMap)
    case JoinR(l, rr, lk, rk, jt) =>
      val lrows = evalRel(tables, l)
      val rrows = evalRel(tables, rr)
      val leftSchema = schemaOf(l).map(_._1)
      val rightSchema = schemaOf(rr).map(_._1)
      val byKey = rrows.filter(_(rk) != null).groupBy(_(rk))
      // matched pairs + left padding (a null left key matches nothing;
      // under left/full it surfaces once with a null-padded right side)
      val leftPart = lrows.flatMap { lr =>
        val k = lr(lk)
        val matches = if (k == null) Seq.empty else byKey.getOrElse(k, Seq.empty)
        if (matches.nonEmpty) matches.map(lr ++ _)
        else if (jt == "left" || jt == "full")
          Seq(lr ++ rightSchema.map(_ -> (null: Any)).toMap)
        else Seq.empty
      }
      // right padding: right rows whose key is null or unmatched by any
      // left key surface once with a null-padded left side
      val rightPad =
        if (jt == "right" || jt == "full") {
          val lKeys = lrows.map(_(lk)).filter(_ != null).toSet
          rrows.filter(r0 => r0(rk) == null || !lKeys.contains(r0(rk)))
            .map(r0 => leftSchema.map(_ -> (null: Any)).toMap ++ r0)
        } else Seq.empty
      leftPart ++ rightPad
    case AggR(in, k, aggs) =>
      evalRel(tables, in).groupBy(_(k)).map { case (kv, rows) =>
        Map[String, Any](k -> kv) ++ aggValues(aggs, rows)
      }.toSeq
    case RollupR(in, k1, k2, aggs, cube) =>
      val rows = evalRel(tables, in)
      def level(keys: Seq[String], gid: Long): Seq[NRow] =
        rows.groupBy(r => keys.map(r(_))).map { case (_, rs) =>
          Map[String, Any](
            k1 -> (if (keys.contains(k1)) rs.head(k1) else null),
            k2 -> (if (keys.contains(k2)) rs.head(k2) else null),
            "gid" -> gid) ++ aggValues(aggs, rs)
        }.toSeq
      // SPARK semantic, found BY this fuzzer: rollup/cube over an EMPTY
      // input yields ZERO rows — standard SQL (and DuckDB) emit one
      // grand-total row (count 0) because the empty grouping set
      // aggregates like an ungrouped query. The differential gate mirrors
      // Spark; the cross-engine divergence is recorded in DECISIONS.md
      // (oracle queries over possibly-empty inputs must not end in a
      // bare ROLLUP/CUBE).
      level(Seq(k1, k2), 0L) ++ level(Seq(k1), 1L) ++
        (if (cube) level(Seq(k2), 2L) else Seq.empty) ++
        level(Seq.empty, 3L)
    case SemiR(l, rr, lk, rk, anti) =>
      val keys = evalRel(tables, rr).map(_(rk)).filter(_ != null).toSet
      evalRel(tables, l).filter { row =>
        val k = row(lk)
        val matched = k != null && keys.contains(k)
        if (anti) !matched else matched
      }
    case UnionR(a, b) => evalRel(tables, a) ++ evalRel(tables, b)
    case SetR(a, b, except, all) =>
      // NULL-safe row equality via the canonical rendering (the same one
      // the multiset compare uses). Distinct forms: distinct rows of a,
      // kept by presence (intersect) or absence (except) in b. ALL forms
      // are per-key COUNT arithmetic: except-all keeps max(0, n_a - n_b)
      // copies, intersect-all min(n_a, n_b).
      val cols = schemaOf(a).map(_._1)
      val bCounts = evalRel(tables, b).groupBy(r => canon(cols, r(_)))
        .map { case (k, rs) => k -> rs.size }
      evalRel(tables, a)
        .groupBy(r => canon(cols, r(_))).toSeq
        .flatMap { case (k, rs) =>
          val nb = bCounts.getOrElse(k, 0)
          if (all) {
            val keep = if (except) math.max(0, rs.size - nb)
                       else math.min(rs.size, nb)
            rs.take(keep)
          } else if ((nb > 0) != except) rs.headOption.toSeq
          else Seq.empty
        }
    case DistinctR(in) => evalRel(tables, in).distinct
    case SortLimitR(in, n) =>
      val cols = schemaOf(in).map(_._1)
      evalRel(tables, in).sortWith { (a, b) =>
        val it = cols.iterator.map(c => cmpNullsFirst(a(c), b(c))).dropWhile(_ == 0)
        it.hasNext && it.next() < 0
      }.take(n)
    case WindowR(in, part, ord, tb) =>
      evalRel(tables, in).groupBy(_(part)).values.flatMap { grp =>
        grp.sortWith { (a, b) =>
          val c = cmpNullsFirst(a(ord), b(ord))
          if (c != 0) c < 0 else cmpNullsFirst(a(tb), b(tb)) < 0
        }.zipWithIndex.map { case (row, i) => row + ("rn" -> ((i + 1).toLong: Any)) }
      }.toSeq
    case WinSumR(in, part, ord, tb, v) =>
      evalRel(tables, in).groupBy(_(part)).values.flatMap { grp =>
        val sorted = grp.sortWith { (a, b) =>
          val c = cmpNullsFirst(a(ord), b(ord))
          if (c != 0) c < 0 else cmpNullsFirst(a(tb), b(tb)) < 0
        }
        // SQL running sum: nulls inside the frame are skipped; a frame of
        // only-null values yields null (sum over empty set)
        var acc: Any = null
        sorted.map { row =>
          row(v) match {
            case null => ()
            case x    => acc = (if (acc == null) 0L else toL(acc)) + toL(x)
          }
          row + ("runsum" -> acc)
        }
      }.toSeq
    case WinFrameR(in, part, ord, tb, v, lo, hi, fn) =>
      evalRel(tables, in).groupBy(_(part)).values.flatMap { grp =>
        val sorted = grp.sortWith { (a, b) =>
          val c = cmpNullsFirst(a(ord), b(ord))
          if (c != 0) c < 0 else cmpNullsFirst(a(tb), b(tb)) < 0
        }.toIndexedSeq
        sorted.zipWithIndex.map { case (row, i) =>
          // physical frame [i-lo, i+hi] clamped to the partition; SQL
          // null-skipping aggregate — empty/all-null frame yields null,
          // except cnt which is the 0-valued non-null count
          val vs = (math.max(0, i - lo) to math.min(sorted.size - 1, i + hi))
            .map(j => sorted(j)(v)).filter(_ != null)
          val out: Any = fn match {
            case "cnt" => vs.size.toLong
            case _ if vs.isEmpty => null
            case "sum" => vs.map(toL).sum
            case "min" => vs.map(toL).min
            case "max" => vs.map(toL).max
          }
          row + ("fsum" -> out)
        }
      }.toSeq
    case WinRangeR(in, part, ord, v, lo, hi) =>
      evalRel(tables, in).groupBy(_(part)).values.flatMap { grp =>
        grp.map { row =>
          // value-based frame: every row whose ord lies in
          // [cur - lo, cur + hi] — peers enter together, no tiebreak.
          // (The generator guarantees a non-null Long ord.)
          val cur = toL(row(ord))
          val vs = grp.filter { r =>
            val x = toL(r(ord)); x >= cur - lo && x <= cur + hi
          }.map(_(v)).filter(_ != null)
          row + ("rsum" -> (if (vs.isEmpty) null
                            else (vs.map(toL).sum: Any)))
        }
      }.toSeq
    case WinNullsR(in, part, ord, tb, nl) =>
      // identical null manufacture as the Spark side: multiples of 3 → NULL
      def nkey(r: NRow): Any = r(ord) match {
        case null => null
        case v    => val l = toL(v); if (l % 3 == 0) null else (l: Any)
      }
      // explicit placement: NULLS LAST puts null after every value,
      // NULLS FIRST before (Spark's ASC default)
      def cmpN(a: Any, b: Any): Int = (a, b) match {
        case (null, null) => 0
        case (null, _)    => if (nl) 1 else -1
        case (_, null)    => if (nl) -1 else 1
        case _            => cmpNullsFirst(a, b)
      }
      evalRel(tables, in).groupBy(_(part)).values.flatMap { grp =>
        grp.sortWith { (x, y) =>
          val c = cmpN(nkey(x), nkey(y))
          if (c != 0) c < 0 else cmpNullsFirst(x(tb), y(tb)) < 0
        }.zipWithIndex.map { case (row, i) => row + ("rn" -> ((i + 1).toLong: Any)) }
      }.toSeq
    case UnionCoerceR(a, b) =>
      // re-derive Spark's positional widening: a long value at a position
      // whose union type is double is widened (exact below 2^53 — the
      // fixture keys are tiny); names come from the left side
      val (sa, sb) = (schemaOf(a), schemaOf(b))
      val out = sa.zip(sb).map { case ((n, ta), (_, tb2)) =>
        (n, if (ta == TDouble || tb2 == TDouble) TDouble else ta)
      }
      def conv(row: NRow, s: Seq[(String, Typ)]): NRow =
        out.indices.map { i =>
          val (on, ot) = out(i)
          val v = row(s(i)._1)
          on -> (if (v == null) null
                 else if (ot == TDouble && s(i)._2 == TLong) (toD(v): Any)
                 else v)
        }.toMap
      evalRel(tables, a).map(conv(_, sa)) ++ evalRel(tables, b).map(conv(_, sb))
    case ExistsR(outer, inner, ok, ik, ip, ineq, anti) =>
      // the DEFINITION, per outer row: ∃ inner row with key equality
      // (NULL on either side is UNKNOWN → no match), innerPred TRUE, and
      // the correlated inequality TRUE — no decorrelation on this side
      val innerRows = evalRel(tables, inner)
        .filter(r => ip.forall(evalPred(_, r).contains(true)))
      evalRel(tables, outer).filter { orow =>
        val k = orow(ok)
        val matched = k != null && innerRows.exists { irow =>
          irow(ik) == k && ineq.forall { case (in, on) =>
            val (vi, vo) = (irow(in), orow(on))
            vi != null && vo != null && toD(vi) > toD(vo)
          }
        }
        if (anti) !matched else matched
      }
    case ScalarSubqR(outer, inner, ok, ik, fn) =>
      val byKey = evalRel(tables, inner).filter(_(ik) != null).groupBy(_(ik))
      evalRel(tables, outer).map { orow =>
        val grp =
          if (orow(ok) == null) Seq.empty
          else byKey.getOrElse(orow(ok), Seq.empty)
        // empty correlation group: COUNT is 0 (the decorrelation "count
        // bug" seam), every other aggregate NULL — aggValues states both
        orow + ("sc" -> aggValues(Seq("sc" -> fn), grp)("sc"))
      }
  }

  private def minMax(vs: Seq[Any], isMin: Boolean): Any =
    if (vs.isEmpty) null
    else vs.reduce { (a, b) => if ((cmpNullsFirst(a, b) < 0) == isMin) a else b }

  /** Spark's default ascending null ordering is NULLS FIRST. */
  private def cmpNullsFirst(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _)    => -1
    case (_, null)    => 1
    case (x: String, y: String) => x.compareTo(y)
    case (x, y) if x.isInstanceOf[Double] || y.isInstanceOf[Double] =>
      java.lang.Double.compare(toD(x), toD(y))
    case (x, y) => java.lang.Long.compare(toL(x), toL(y))
  }

  // ---- canonical multiset comparison ------------------------------------

  /** Canonical row rendering: integral → Long decimal, double →
    * Double.toString of the -0.0-normalized value (exact shortest repr —
    * identical bits render identically), null marker distinct from any
    * value, "\u0001" separator so values cannot alias across columns.
    */
  def canon(colNames: Seq[String], value: String => Any): String =
    colNames.sorted.map { c =>
      value(c) match {
        case null      => " NULL"
        case d: Double => java.lang.Double.toString(if (d == 0.0) 0.0 else d)
        case l: Long   => l.toString
        case i: Int    => i.toString
        case s         => s.toString
      }
    }.mkString("\u0001")

  def sparkMultiset(df: DataFrame): Map[String, Int] = {
    val names = df.columns.toSeq
    df.collect().toSeq
      .map(row => canon(names, c => row.get(row.fieldIndex(c))))
      .groupBy(identity).map { case (k, v) => k -> v.size }
  }

  def naiveMultiset(colNames: Seq[String], rows: Seq[NRow]): Map[String, Int] =
    rows.map(r => canon(colNames, r(_)))
      .groupBy(identity).map { case (k, v) => k -> v.size }

  /** Load the fuzz tables through Spark ONCE into plain Scala rows for the
    * interpreter, promoting integrals to Long so interpreter values are
    * uniformly typed regardless of the parquet physical type.
    */
  def loadTables(spark: SparkSession, sfDir: String): Map[String, Seq[NRow]] =
    schemas.map { case (name, schema) =>
      val df = graft.sources.Tables.table(spark, sfDir, name)
        .select(schema.map { case (c, _) => col(c) }: _*)
      val rows = df.collect().toSeq.map { row =>
        schema.map { case (c, t) =>
          val v = row.get(row.fieldIndex(c))
          c -> ((v, t) match {
            case (null, _)          => null
            case (n: Number, TLong) => n.longValue(): Any
            case (other, _)         => other
          })
        }.toMap
      }
      name -> rows
    }

  // ---- seeded generator --------------------------------------------------

  final class Gen(seed: Long) {
    // java.util.Random's first power-of-2-bounded nextInt draws from the
    // TOP bits of one LCG step, which barely vary across small sequential
    // raw seeds (every seed in 1..200 put the first nextInt(8) in {5,6});
    // finalize the seed with a splitmix64 round so the corpus spreads.
    private def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    private val rnd = new scala.util.Random(mix(seed))
    private var derivedN = 0
    private def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.size))

    private def litFor(c: String): Expr = c match {
      case "c_custkey" | "o_custkey"   => LitL(rnd.nextInt(400).toLong)
      case "o_orderkey"                => LitL(rnd.nextInt(4000).toLong)
      case "c_nationkey" | "n_nationkey" | "n_regionkey" => LitL(rnd.nextInt(25).toLong)
      case "c_acctbal"                 => LitD(rnd.nextInt(20000) / 2.0 - 1000.0)
      case "o_totalprice"              => LitD(rnd.nextInt(400000) / 2.0)
      case "o_orderstatus"             => LitS(pick(Seq("O", "F", "P")))
      case "c_mktsegment"              => LitS(pick(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")))
      case "n_name"                    => LitS("NATION_" + rnd.nextInt(25))
      case _                           => LitL(rnd.nextInt(1000).toLong)
    }

    /** Literal for column `c` of type `t`: value-shaped for base columns,
      * TYPE-shaped for derived ones (litFor's LitL fallback would
      * type-clash a derived string column — CaseW projections create
      * those).
      */
    private def litTyped(c: String, t: Typ): Expr =
      if (schemas.values.flatten.exists(_._1 == c)) litFor(c)
      else t match {
        case TLong   => LitL(rnd.nextInt(1000).toLong)
        case TDouble => LitD(rnd.nextInt(20000) / 2.0)
        case TString => LitS(pick(Seq("O", "F", "AUTOMOBILE", "NATION_1", "ZZZ")))
      }

    private def genPred(schema: Seq[(String, Typ)], depth: Int): Pred = {
      if (depth > 0 && rnd.nextInt(3) == 0) {
        val (a, b) = (genPred(schema, depth - 1), genPred(schema, depth - 1))
        rnd.nextInt(3) match {
          case 0 => And(a, b); case 1 => Or(a, b); case 2 => Not(a)
        }
      } else {
        val (c, t) = pick(schema)
        // 1-in-5 leaves are IN-lists of 2-4 literals (often negated by the
        // surrounding Not production — the null-probe NOT IN trap)
        if (t == TString && rnd.nextInt(5) == 0) {
          // LIKE leaf: prefix / suffix / infix pattern over a plausible
          // value fragment (the predicate-pushdown shapes q132 pins)
          val seed = litTyped(c, t) match {
            case LitS(v) => v; case _ => "Customer"
          }
          val frag = seed.take(1 + rnd.nextInt(math.max(1, math.min(4, seed.length))))
          val pattern = rnd.nextInt(3) match {
            case 0 => frag + "%"
            case 1 => "%" + frag
            case 2 => "%" + frag + "%"
          }
          LikeP(ColRef(c), pattern)
        } else if (rnd.nextInt(5) == 0) {
          InList(ColRef(c), (0 until 2 + rnd.nextInt(3)).map(_ => litTyped(c, t)))
        } else {
          // 1-in-4 leaves compare two COLUMNS of the same kind (numeric with
          // numeric, string with string) instead of a literal: long-vs-double
          // is safe because both sides promote via exact toDouble (fixture
          // longs are far below 2^53)
          val sameKind = schema.filter { case (c2, t2) =>
            c2 != c && ((t2 == TString) == (t == TString))
          }
          val rhs: Expr =
            if (sameKind.nonEmpty && rnd.nextInt(4) == 0) ColRef(pick(sameKind)._1)
            else litTyped(c, t)
          Cmp(pick(Seq("<", "<=", "=", "!=", ">", ">=")), ColRef(c), rhs)
        }
      }
    }

    /** 0-2 stacked filters / projections / distinct over `in`. */
    private def stack(in: Rel, n: Int): Rel =
      (0 until n).foldLeft(in) { (r, _) =>
        val schema = schemaOf(r)
        rnd.nextInt(4) match {
          case 0 => FilterR(r, genPred(schema, 2))
          case 1 =>
            // keep a random non-empty column subset plus one derived
            // arithmetic column when two numerics exist; derived names are
            // unique per plan so stacked projections never collide
            val keep = rnd.shuffle(schema).take(1 + rnd.nextInt(schema.size))
            val numerics = schema.filter(t => t._2 == TLong || t._2 == TDouble)
            val derived =
              if (numerics.size >= 2 && rnd.nextBoolean()) {
                val (a, b) = (pick(numerics), pick(numerics))
                // '*' only over base columns: a product of already-derived
                // longs could exceed Long range, which throws under ANSI
                // on the Spark side but wraps in the interpreter
                val isDerived = (c: String) => c.startsWith("derived")
                // '%' only when both operands are Long (a double mod is
                // fmod — a different operation) — derived Longs are fine:
                // the guard nulls zero divisors and % cannot overflow
                val bothLong = a._2 == TLong && b._2 == TLong
                val ops =
                  (if (isDerived(a._1) || isDerived(b._1)) Seq('+', '-')
                   else Seq('+', '-', '*')) ++
                    (if (bothLong) Seq('%') else Seq.empty)
                derivedN += 1
                Seq(s"derived$derivedN" -> (Arith(pick(ops),
                  ColRef(a._1), ColRef(b._1)): Expr))
              } else Seq.empty
            // CASE WHEN derived column: both branches the same type
            // (column of that type, or a literal shaped for the THEN
            // column), condition a depth-1 predicate — UNKNOWN conditions
            // exercise the fall-to-ELSE rule
            val caseDerived =
              if (rnd.nextInt(2) == 0) {
                val (c, t) = pick(schema)
                val sameT = schema.filter(x => x._2 == t && x._1 != c)
                // literal fallback is shaped by the THEN column's TYPE, not
                // its name: `c` may be a derived column litFor cannot map
                // (its LitL fallback would type-clash a string branch)
                val els: Expr =
                  if (sameT.nonEmpty && rnd.nextBoolean()) ColRef(pick(sameT)._1)
                  else litTyped(c, t)
                derivedN += 1
                Seq(s"derived$derivedN" ->
                  (CaseW(genPred(schema, 1), ColRef(c), els): Expr))
              } else Seq.empty
            // string-function derived column: UPPER / SUBSTRING over a
            // string column (ASCII fixture data → locale-free)
            val strFnDerived = {
              val strs = schema.filter(_._2 == TString)
              if (strs.nonEmpty && rnd.nextInt(3) == 0) {
                val c = pick(strs)._1
                derivedN += 1
                val strFn: Expr = rnd.nextInt(3) match {
                  case 0 => Upper(ColRef(c))
                  case 1 => Substr(ColRef(c), 1 + rnd.nextInt(4), 1 + rnd.nextInt(6))
                  case _ => Concat2(ColRef(c),
                    if (rnd.nextBoolean()) LitS("_sfx") else ColRef(c))
                }
                Seq(s"derived$derivedN" -> strFn)
              } else Seq.empty
            }
            // COALESCE / NULLIF derived column: same-typed operand pair
            // (null-handling scalar functions — NULLIF's UNKNOWN-keeps-a
            // rule and COALESCE's first-non-null are fuzz-worthy)
            val nullFnDerived =
              if (rnd.nextInt(2) == 0) {
                val (c, t) = pick(schema)
                val sameT = schema.filter(x => x._2 == t && x._1 != c)
                val other: Expr =
                  if (sameT.nonEmpty && rnd.nextBoolean()) ColRef(pick(sameT)._1)
                  else litTyped(c, t)
                derivedN += 1
                Seq(s"derived$derivedN" ->
                  (if (rnd.nextBoolean()) Coalesce2(ColRef(c), other)
                   else NullIfE(ColRef(c), other): Expr))
              } else Seq.empty
            ProjectR(r, keep.map { case (c, _) => c -> (ColRef(c): Expr) } ++
              derived ++ caseDerived ++ nullFnDerived ++ strFnDerived)
          case 2 => DistinctR(r)
          case 3 => FilterR(r, genPred(schema, 1))
        }
      }

    private def joinType(): String = pick(Seq("inner", "left", "right", "full"))

    def gen(): Rel = {
      // bottom: a base, a natural-key join (all four types — outer-join
      // padding is fuzz-worthy territory), a set op, or a window
      val bottom: Rel = rnd.nextInt(16) match {
        case 0 => Base(pick(Seq("customer", "orders", "nation")))
        case 1 => JoinR(Base("orders"), Base("customer"),
          "o_custkey", "c_custkey", joinType())
        case 2 => JoinR(Base("customer"), Base("nation"),
          "c_nationkey", "n_nationkey", joinType())
        case 3 => WindowR(Base("orders"), "o_custkey", "o_totalprice", "o_orderkey")
        case 4 => JoinR(
          FilterR(Base("orders"), genPred(schemas("orders"), 1)),
          Base("customer"), "o_custkey", "c_custkey", joinType())
        case 5 => SemiR(Base("customer"),
          FilterR(Base("orders"), genPred(schemas("orders"), 1)),
          "c_custkey", "o_custkey", anti = rnd.nextBoolean())
        case 6 => SemiR(Base("orders"),
          FilterR(Base("customer"), genPred(schemas("customer"), 1)),
          "o_custkey", "c_custkey", anti = rnd.nextBoolean())
        case 7 =>
          // positional union of two differently-filtered copies of one
          // base — schemas are identical by construction
          val t = pick(Seq("customer", "orders"))
          UnionR(FilterR(Base(t), genPred(schemas(t), 1)),
            FilterR(Base(t), genPred(schemas(t), 1)))
        case 8 =>
          // INTERSECT / EXCEPT of two differently-filtered copies of one
          // base: overlapping-but-unequal row sets by construction, so
          // both the kept and dropped branches are exercised
          val t = pick(Seq("customer", "orders"))
          SetR(FilterR(Base(t), genPred(schemas(t), 1)),
            FilterR(Base(t), genPred(schemas(t), 1)),
            except = rnd.nextBoolean(), all = rnd.nextBoolean())
        case 9 =>
          // running sum over a join of any type: outer padding feeds the
          // null-skipping frame path. Determinism: within a (part, ord,
          // tb) tie class the summed value c_custkey is CONSTANT (matched
          // rows of one customer) so any tie order yields the same
          // multiset; padded rows carry a unique non-null tb.
          WinSumR(JoinR(Base("orders"), Base("customer"),
            "o_custkey", "c_custkey", joinType()),
            "o_custkey", "o_totalprice", "c_custkey", "c_custkey")
        case 10 =>
          // bounded sliding ROWS frame — total order required, so base
          // table + primary-key tiebreak only (see WinFrameR scaladoc)
          val ffn = pick(Seq("sum", "min", "max", "cnt"))
          if (rnd.nextBoolean())
            WinFrameR(Base("orders"), "o_orderstatus", "o_totalprice",
              "o_orderkey", pick(Seq("o_custkey", "o_orderkey")),
              rnd.nextInt(4), rnd.nextInt(4), ffn)
          else
            WinFrameR(Base("customer"), "c_mktsegment", "c_acctbal",
              "c_custkey", "c_nationkey", rnd.nextInt(4), rnd.nextInt(4), ffn)
        case 11 =>
          // value-based RANGE frame over a non-null Long ordering key —
          // peers enter together, so ties are semantics, not flakiness
          if (rnd.nextBoolean())
            WinRangeR(Base("customer"), "c_mktsegment", "c_nationkey",
              "c_custkey", rnd.nextInt(5).toLong, rnd.nextInt(5).toLong)
          else
            WinRangeR(Base("orders"), "o_orderstatus", "o_custkey",
              "o_orderkey", rnd.nextInt(8).toLong, rnd.nextInt(8).toLong)
        case 12 =>
          // explicit NULLS FIRST/LAST inside a window spec over a
          // manufactured nullable ordering key (see WinNullsR)
          if (rnd.nextBoolean())
            WinNullsR(Base("orders"), "o_orderstatus", "o_custkey",
              "o_orderkey", nullsLast = rnd.nextBoolean())
          else
            WinNullsR(Base("customer"), "c_mktsegment", "c_nationkey",
              "c_custkey", nullsLast = rnd.nextBoolean())
        case 13 =>
          // positional union with a long/double coercion seam at the
          // second position; direction flips so both "left widens" and
          // "right widens" are exercised (see UnionCoerceR)
          val longSide = ProjectR(
            FilterR(Base("orders"), genPred(schemas("orders"), 1)),
            Seq("k" -> (ColRef("o_custkey"): Expr),
              "v" -> (ColRef("o_orderkey"): Expr)))
          val dblSide = ProjectR(
            FilterR(Base("customer"), genPred(schemas("customer"), 1)),
            Seq("k" -> (ColRef("c_custkey"): Expr),
              "v" -> (ColRef("c_acctbal"): Expr)))
          if (rnd.nextBoolean()) UnionCoerceR(longSide, dblSide)
          else UnionCoerceR(dblSide, longSide)
        case 14 =>
          // correlated [NOT] EXISTS through Dataset.exists() — the
          // RewritePredicateSubquery decorrelation seam. Optional
          // inner-only predicate, optional NON-equi correlated
          // inequality (inner.num > outer.num), both directions of the
          // customer/orders correlation plus customer→nation
          val (o, i, ok2, ik2, ineqPair) = pick(Seq(
            ("customer", "orders", "c_custkey", "o_custkey",
              Some(("o_totalprice", "c_acctbal"))),
            ("orders", "customer", "o_custkey", "c_custkey",
              Some(("c_acctbal", "o_totalprice"))),
            ("customer", "nation", "c_nationkey", "n_nationkey",
              Some(("n_regionkey", "c_nationkey")))))
          ExistsR(Base(o), Base(i), ok2, ik2,
            innerPred =
              if (rnd.nextBoolean()) Some(genPred(schemas(i), 1)) else None,
            ineq = if (rnd.nextInt(3) == 0) ineqPair else None,
            anti = rnd.nextBoolean())
        case 15 =>
          // correlated scalar subquery through Dataset.scalar() — the
          // left-outer decorrelation rewrite; CountStar deliberately
          // included (COUNT over the empty correlation group must be 0,
          // not NULL — the classic count bug)
          val (o, i, ok2, ik2, longCols, anyCols) = pick(Seq(
            ("customer", "orders", "c_custkey", "o_custkey",
              Seq("o_orderkey", "o_custkey"),
              Seq("o_orderkey", "o_totalprice", "o_orderstatus")),
            ("orders", "customer", "o_custkey", "c_custkey",
              Seq("c_custkey", "c_nationkey"),
              Seq("c_nationkey", "c_acctbal", "c_mktsegment"))))
          val fn: AggFn = rnd.nextInt(5) match {
            case 0 => CountStar
            case 1 => SumL(pick(longCols))
            case 2 => AvgL(pick(longCols))
            case 3 => MinC(pick(anyCols))
            case 4 => MaxC(pick(anyCols))
          }
          ScalarSubqR(Base(o), Base(i), ok2, ik2, fn)
      }
      val mid = stack(bottom, rnd.nextInt(3))
      // optionally aggregate (and optionally filter the aggregate = HAVING)
      val schema = schemaOf(mid)
      val aggKeyOpt = {
        val keys = schema.filter(t => t._2 == TLong || t._2 == TString)
        if (keys.nonEmpty && rnd.nextBoolean()) Some(pick(keys)._1) else None
      }
      val top = aggKeyOpt match {
        case None => mid
        case Some(k) =>
          val longCols = schema.filter(_._2 == TLong).map(_._1)
          val anyCols = schema.map(_._1)
          val aggs = Seq("cnt" -> (CountStar: AggFn)) ++
            (if (longCols.nonEmpty && rnd.nextBoolean())
              Seq("s" -> (SumL(pick(longCols)): AggFn)) else Seq.empty) ++
            (if (longCols.nonEmpty && rnd.nextBoolean())
              Seq("av" -> (AvgL(pick(longCols)): AggFn)) else Seq.empty) ++
            (if (rnd.nextBoolean())
              Seq("mn" -> (MinC(pick(anyCols)): AggFn)) else Seq.empty) ++
            (if (rnd.nextBoolean())
              Seq("mx" -> (MaxC(pick(anyCols)): AggFn)) else Seq.empty)
          // 1-in-3 aggregates become a two-key ROLLUP when a second
          // groupable key exists (gid distinguishes rolled NULLs)
          val k2s = schema
            .filter(t => (t._2 == TLong || t._2 == TString) && t._1 != k)
            .map(_._1)
          val agg =
            if (k2s.nonEmpty && rnd.nextInt(3) == 0)
              RollupR(mid, k, pick(k2s), aggs, cube = rnd.nextBoolean())
            else AggR(mid, k, aggs)
          if (rnd.nextBoolean())
            FilterR(agg, Cmp(pick(Seq(">", ">=", "<")), ColRef("cnt"),
              LitL(1 + rnd.nextInt(5).toLong)))
          else agg
      }
      // 1-in-4 plans end in ORDER BY all columns + LIMIT (the
      // TakeOrderedAndProject path — per-partition top-k + driver merge)
      if (rnd.nextInt(4) == 0) SortLimitR(top, 1 + rnd.nextInt(60)) else top
    }
  }
}
