#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the sfDir
tables, sorts columns by name and rows by all columns, and compares values.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_type(t) -> str:
    """Canonical form of an arrow type for Spark-vs-DuckDB dtype parity.

    The q97 bug class: a bare SUM(BIGINT) in DuckDB yields HUGEINT
    (arrow decimal128(38,0)) while Spark yields int64 — values can be
    equal yet the driver's canonical-value hash diverges. Any oracle
    whose column types don't map 1:1 onto the Spark schema is a latent
    hash mismatch, so dtype parity is checked as part of the gate.
    """
    import pyarrow as pa
    s = str(t)
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if s in ("string", "large_string"):
        return "string"
    if s in ("binary", "large_binary"):
        return "binary"
    if pa.types.is_decimal(t):
        return f"decimal(scale={t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{norm_type(t.value_type)}>"
    return s


def dtype_mismatches(spark_schema, duck_schema):
    got = {f.name: norm_type(f.type) for f in spark_schema}
    exp = {f.name: norm_type(f.type) for f in duck_schema}
    return [f"{c}: spark={got[c]} oracle={exp[c]}"
            for c in sorted(set(got) & set(exp)) if got[c] != exp[c]]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp cols to int64 micros for robust compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noql = 0
    for d in sorted(glob.glob(f"{out_dir}/*")):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'").df()
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(got)} rows")
            n_noql += 1
            continue
        try:
            exp_tbl = con.execute(oracles[name]).arrow()
            exp = exp_tbl.to_pandas()
        except Exception as e:
            print(f"✗ {name}: oracle SQL failed: {e}")
            n_fail += 1
            continue
        import pyarrow.parquet as pq
        part_files = sorted(glob.glob(f"{d}/*.parquet"))
        if not part_files:
            print(f"✗ {name}: no parquet part files in {d} — Spark wrote an empty output dir")
            n_fail += 1
            continue
        spark_schema = pq.read_schema(part_files[0])
        bad_types = dtype_mismatches(spark_schema, exp_tbl.schema)
        if bad_types:
            print(f"✗ {name}: dtype parity: " + "; ".join(bad_types))
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"✗ {name}: column mismatch got={list(g.columns)} exp={list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"✗ {name}: row count got={len(g)} exp={len(e)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"✓ {name}: {len(g)} rows exact")
            n_pass += 1
        except AssertionError as ex:
            print(f"✗ {name}: value mismatch\n{str(ex)[:800]}")
            # show first differing rows
            neq = (g != e) & ~(g.isna() & e.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print("  got:", g.loc[i].to_dict())
                print("  exp:", e.loc[i].to_dict())
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noql} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
