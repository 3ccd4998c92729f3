#!/usr/bin/env python3
"""Local pre-verification harness mimicking the driver's DuckDB oracle
compare: for each query parquet dumped by graft.Verify, run the oracle
SQL in DuckDB over the same sf tables, sort columns by name, sort rows,
and compare values. Usage: check.py <sfDir> <outDir> [query...]"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if hasattr(v, "to_pydatetime"):  # pandas Timestamp -> datetime
        v = v.to_pydatetime()
    import datetime as _dt
    if isinstance(v, _dt.datetime) and v.tzinfo is not None:
        v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no result parquet"); n_fail += 1; continue
        spark_tbl = pq.read_table(files)
        if name not in oracles:
            print(f"[rows-only] {name}: {spark_tbl.num_rows} rows")
            n_noracle += 1
            continue
        try:
            duck_tbl = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as e:
            print(f"[FAIL] {name}: oracle error: {e}"); n_fail += 1; continue
        s_cols, d_cols = sorted(spark_tbl.column_names), sorted(duck_tbl.column_names)
        if s_cols != d_cols:
            print(f"[FAIL] {name}: schema mismatch spark={s_cols} duck={d_cols}")
            n_fail += 1; continue
        s_rows = sorted((tuple(norm(v) for v in r) for r in
                        zip(*[spark_tbl.column(c).to_pylist() for c in s_cols])), key=repr)
        d_rows = sorted((tuple(norm(v) for v in r) for r in
                        zip(*[duck_tbl.column(c).to_pylist() for c in d_cols])), key=repr)
        if s_rows == d_rows:
            print(f"[PASS] {name}: {len(s_rows)} rows"); n_pass += 1
        else:
            n_fail += 1
            print(f"[FAIL] {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            sset, dset = set(s_rows), set(d_rows)
            for r in list(sset - dset)[:3]: print(f"   spark-only: {r}")
            for r in list(dset - sset)[:3]: print(f"   duck-only:  {r}")
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    sys.exit(1 if n_fail else 0)

main()
