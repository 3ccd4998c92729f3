#!/usr/bin/env python3
"""Generate a null-injected variant of a testdata scale-factor dir.

Round-16 parity corpus (VERDICT r15 task 1): the r15 fleet-wide NULLS
work (96 explicit ORDER BY placements, funnel/ewma null-ts array
ordering, the null-safe evalBoundedSemiJoin dispatch) was verified by
audit only, because the driver fixtures contain ZERO nulls in any
column. This tool derives a corpus where nullable ts / text / numeric /
low-cardinality-categorical columns carry seeded, deterministic nulls,
so the full 184-query Spark-vs-DuckDB battery exercises:
  - ORDER BY ... LIMIT survivor sets under explicit NULLS placement
    (row-sorting in the compare hides placement EXCEPT through LIMIT);
  - array-valued aggregates' interior ordering with null elements;
  - three-valued logic / null-propagation parity in filters, casts,
    arithmetic, and join keys-adjacent predicates.

Key columns (all *_key, *_id) are left non-null: the engine documents
loud non-null contracts there (e.g. ConnectedComponents.minLabel throws
on a null node id), and the reference data model treats them as PKs.

Determinism: a row is nulled in column C iff
    hash(<stable row key> :: C :: 'graft-null-v1') % 1000 < permille
using DuckDB's 64-bit hash() — re-running the tool reproduces the same
corpus bit-for-bit for a given duckdb version (pin: the one-time parity
artifact records the version used).

Usage: python3 tools/make_null_fixtures.py <src_sf_dir> <out_dir>
"""
import sys
import duckdb


# table -> (stable row key expr, {column: permille})
PLAN = {
    "region":   ("r_regionkey", {}),
    "nation":   ("n_nationkey", {}),
    "customer": ("c_custkey", {"c_acctbal": 20, "c_mktsegment": 10}),
    "supplier": ("s_suppkey", {"s_acctbal": 20}),
    "part":     ("p_partkey", {"p_retailprice": 20, "p_type": 10,
                               "p_size": 20}),
    "orders":   ("o_orderkey", {"o_totalprice": 20, "o_orderdate": 20,
                                "o_orderstatus": 10}),
    "lineitem": ("l_orderkey * 8 + l_linenumber",
                 {"l_quantity": 20, "l_discount": 20, "l_shipdate": 20,
                  "l_returnflag": 10}),
    "events":   ("event_id", {"ts": 20, "value": 30, "props": 20,
                              "event_type": 20}),
    # n_chars (r17, the r16 ADVICE alternative actually taken): a
    # nullable VALUE column feeding the TopK bounded heap — exercises
    # the structural null skip and its oracle mirrors (q_source_cap)
    # instead of leaving them latent.
    # MEDIA columns (r17 verdict task 3): this table IS the media table
    # — Multimodal.mediaTable derives payload from `text` and
    # width/height METADATA from `n_chars` (not from the non-null PK,
    # which made metadata nulls structurally impossible). Injecting
    # both therefore battery-proves the media null contracts: null
    # payload AND null metadata rows drop at the table boundary, all
    # four multimodal oracles mirroring with
    # `WHERE text IS NOT NULL AND n_chars IS NOT NULL`.
    "documents": ("doc_id", {"text": 10, "lang": 20, "n_chars": 10}),
    # embeddings (r17, VERDICT r16 task 3): a null vector / null label
    # row is DROPPED at the table boundary (Tables.embeddings; oracles
    # mirror via Similarity.ennSql) — the same stated-contract shape as
    # mediaTable's null-payload drop. vec_id stays non-null (PK; graph
    # consumers' minLabel throws loudly on null ids — pinned in
    # ConnectedComponentsSpec).
    "embeddings": ("vec_id", {"embedding": 20, "label": 20}),
}


def main(src: str, out: str) -> None:
    con = duckdb.connect()
    # fail fast if out is missing/unwritable — and clean the probe up
    # (r16 ADVICE: it used to stay behind in the fixture dir)
    probe = f"{out}/.probe.csv"
    con.execute(f"COPY (SELECT 1) TO '{probe}'")
    import os
    os.remove(probe)
    total = {}
    for table, (rowkey, cols) in PLAN.items():
        desc = con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'").fetchall()
        names = [c[0] for c in desc]
        missing = sorted(set(cols) - set(names))
        assert not missing, f"{table}: plan names absent columns {missing}"
        sel = []
        for name in names:
            p = cols.get(name)
            if p is None:
                sel.append(f'"{name}"')
            else:
                sel.append(
                    f"CASE WHEN hash(CAST(({rowkey}) AS VARCHAR)"
                    f" || '::' || '{name}' || '::graft-null-v1')"
                    f" % 1000 < {p} THEN NULL ELSE \"{name}\" END"
                    f' AS "{name}"')
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM '{src}/{table}.parquet')"
            f" TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        if cols:
            checks = ", ".join(
                f"count(*) - count(\"{c}\") AS \"{c}\"" for c in cols)
            row = con.execute(
                f"SELECT count(*) AS n, {checks}"
                f" FROM '{out}/{table}.parquet'").fetchone()
            n, nullcounts = row[0], dict(zip(cols, row[1:]))
            assert all(v > 0 for v in nullcounts.values()), \
                f"{table}: a planned column got ZERO nulls ({nullcounts})"
            total[table] = (n, nullcounts)
    print(f"duckdb {duckdb.__version__}")
    for table, (n, nc) in sorted(total.items()):
        print(f"{table}: {n} rows; nulls " +
              ", ".join(f"{c}={v}" for c, v in sorted(nc.items())))


if __name__ == "__main__":
    assert len(sys.argv) == 3, __doc__
    main(sys.argv[1], sys.argv[2])
