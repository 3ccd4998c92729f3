#!/usr/bin/env python3
"""One-off cross-engine audit of the SRP pipeline at a DEEP ladder rung
(r13 verdict task 2: rungs past 7 had only unit-boundary coverage; the
DuckDB oracle had hashed only rung 5 at sf0.01 and rung 7 at sf0.1).

Drives the full chain on a deterministic synthetic corpus sized into
the requested rung:

  1. Test/runMain graft.SyntheticEmbeddings <n> <corpusDir>
       (md5-derived floats — bit-reproducible; the same generator
        OracleSanitySpec re-runs when asserting the pinned hash)
  2. runMain graft.Verify <corpusDir> <outDir> q_ann_srp
  3. DuckDB runs the dumped oracle_sql.json["q_ann_srp"] over the SAME
     corpus parquet and the rows are compared EXACTLY (check.py's
     repr-strict discipline, inlined for a single-table corpus — the
     stock check.py would fail creating views for the 9 absent tables).

On a row-exact match it prints PASS; OracleSanitySpec then pins the
Scala-side canonical hash of the same result so every later suite run
re-asserts the audited behavior without needing DuckDB.

Usage: audit_srp_rung.py <n> [workDir]   (run from /root/repo)
"""
import glob
import json
import os
import subprocess
import sys

import duckdb
import pyarrow.parquet as pq


def main():
    n = int(sys.argv[1])
    work = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/srp_audit_{n}"
    corpus, out = f"{work}/corpus", f"{work}/out"
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    subprocess.run(
        ["sbt", "-batch", f"Test/runMain graft.SyntheticEmbeddings {n} {corpus}"],
        check=True, env=env)
    subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {corpus} {out} q_ann_srp"],
        check=True, env=env)
    oracle = json.load(open(f"{out}/oracle_sql.json"))["q_ann_srp"]
    con = duckdb.connect()
    # the 16-way OR collision condition plans as a nested-loop join in
    # DuckDB (no hash join over a disjunction) — give deep-rung corpora
    # a spill path instead of dying on the default in-memory limit.
    # Knobs are env-overridable: rung 15 (n=240k) needed a LOWER limit
    # than the box (spill earlier instead of an Allocation failure) and
    # insertion-order preservation OFF (lets the pipeline stream
    # instead of buffering ordered intermediates).
    con.execute(f"SET memory_limit='{os.environ.get('DUCK_MEM', '40GB')}'")
    con.execute(f"SET threads={os.environ.get('DUCK_THREADS', '8')}")
    con.execute("SET preserve_insertion_order=false")
    os.makedirs(f"{work}/duck_spill", exist_ok=True)
    con.execute(f"SET temp_directory='{work}/duck_spill'")
    con.execute(f"CREATE VIEW embeddings AS SELECT * "
                f"FROM '{corpus}/embeddings.parquet/*.parquet'")
    duck_tbl = con.execute(oracle).fetch_arrow_table()
    spark_tbl = pq.read_table(glob.glob(f"{out}/q_ann_srp/*.parquet"))
    # explicit checks + exit(1), never bare asserts: `python -O`
    # strips asserts and would print PASS on unchecked schemas; and a
    # ROW-COUNT mismatch (the usual shape of a collision-set drift)
    # must still print its sample diff instead of aborting before it
    # (review finding)
    s_cols = sorted(spark_tbl.column_names)
    d_cols = sorted(duck_tbl.column_names)
    if s_cols != d_cols:
        print(f"[FAIL] schema: spark={s_cols} duck={d_cols}")
        sys.exit(1)
    def rows(tbl, cols):
        return sorted((tuple(map(repr, r)) for r in
                       zip(*[tbl.column(c).to_pylist() for c in cols])))
    s_rows, d_rows = rows(spark_tbl, s_cols), rows(duck_tbl, d_cols)
    if s_rows == d_rows:
        print(f"[PASS] q_ann_srp @ n={n}: {len(s_rows)} rows row-exact "
              "across Spark and DuckDB")
    else:
        print(f"[FAIL] q_ann_srp @ n={n}: spark={len(s_rows)} rows, "
              f"duck={len(d_rows)} rows")
        sset, dset = set(s_rows), set(d_rows)
        for r in list(sset - dset)[:3]:
            print(f"   spark-only: {r}")
        for r in list(dset - sset)[:3]:
            print(f"   duck-only:  {r}")
        sys.exit(1)


main()
