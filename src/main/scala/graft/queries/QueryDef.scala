package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, independently runnable capability (driver contract unit):
  * a DataFrame program over a scale-factor directory plus, when the
  * semantics are ANSI-SQL-expressible, an equivalent DuckDB oracle query.
  *
  * Oracle parity rules (see graft.ops.Aggregations for the exactness
  * policy):
  *  - every computed column aliased identically on both sides;
  *  - double sums/avgs go through exact Decimal(30,8) accumulation;
  *  - computed integers are BIGINT on both sides;
  *  - `events.ts` (micros-NTZ in current parquet fixtures) reads as the
  *    same microsecond instant in both engines; oracles still apply
  *    `CAST(ts AS TIMESTAMP)` defensively for any legacy nanos fixture.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
