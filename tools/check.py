#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Loads each Spark result parquet written by graft.Verify, runs the paired
oracle SQL from oracle_sql.json in DuckDB (tables bound as views over the
same sfDir parquet), sorts columns by name, and compares row count, schema
shape, and exact values — approximating the driver's hash compare.
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # test-oracled keys (no SQL row): driver-style rows-only check — the
    # result parquet must exist and be readable
    sql_keys = set(oracle)
    for d in sorted(os.listdir(out_dir)):
        if d in sql_keys or not os.path.isdir(f"{out_dir}/{d}"):
            continue
        files = glob.glob(f"{out_dir}/{d}/*.parquet")
        if not files:
            print(f"MISSING  {d}: (test-oracled) no result parquet"); n_fail += 1
            continue
        try:
            n = pq.read_table(files[0]).num_rows
            print(f"PASS~    {d}: (test-oracled, rows-only) rows={n}")
            n_pass += 1
        except Exception as e:
            print(f"READERR  {d}: {e}"); n_fail += 1
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark result parquet"); n_fail += 1
            continue
        try:
            spark_tbl = pq.read_table(files[0])
        except Exception as e:
            print(f"READERR  {name}: {e}"); n_fail += 1; continue
        try:
            duck = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"ORAERR   {name}: {str(e)[:200]}"); n_fail += 1; continue
        s_cols, d_cols = sorted(spark_tbl.column_names), sorted(duck.column_names)
        if s_cols != d_cols:
            print(f"SCHEMA   {name}: spark={s_cols} duck={d_cols}"); n_fail += 1; continue
        if spark_tbl.num_rows != duck.num_rows:
            print(f"ROWS     {name}: spark={spark_tbl.num_rows} duck={duck.num_rows}"); n_fail += 1; continue
        mismatch = None
        for c in s_cols:
            sv = spark_tbl.column(c).to_pylist()
            dv = duck.column(c).to_pylist()
            if sv != dv:
                bad = next(i for i, (a, b) in enumerate(zip(sv, dv)) if a != b)
                mismatch = (c, bad, sv[bad], dv[bad])
                break
        if mismatch:
            c, i, a, b = mismatch
            # flag type mismatches distinctly from value drift
            st = spark_tbl.schema.field(c).type
            dt = duck.schema.field(c).type
            print(f"VALUE    {name}: col={c}[{i}] spark={a!r}({st}) duck={b!r}({dt})")
            n_fail += 1
        else:
            # also compare arrow types loosely (driver hashes values, but
            # int32-vs-int64 etc can change hash inputs)
            tdiff = [(c, str(spark_tbl.schema.field(c).type), str(duck.schema.field(c).type))
                     for c in s_cols
                     if str(spark_tbl.schema.field(c).type) != str(duck.schema.field(c).type)]
            tag = "PASS*" if tdiff else "PASS "
            extra = f"  typediff={tdiff}" if tdiff else ""
            print(f"{tag}   {name}: rows={spark_tbl.num_rows}{extra}")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {n_pass + n_fail} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
