#!/usr/bin/env python3
"""Generate a >256-copy mutated-boilerplate variant of a testdata dir.

Round-17 rescue battery (VERDICT r16 task 1): the df cap
(Dedup.jaccardMaxDf = 256) blinds the inverted-index jaccard path to
families duplicated in more copies than the cap, and the r16 digest
stars rescue only byte-IDENTICAL families. Dedup.cappedBandStars
rescues the NEAR-duplicate shape through df-independent MinHash band
stars — this tool derives a corpus where that path actually BINDS, so
the full Spark-vs-DuckDB battery proves the rescue and its oracle CTE
(nr* chain in Dedup.dupEdgesCte) agree where it matters, not just where
it is a no-op.

Family construction (mirrors BoilerplateRescueSpec.famText): 300 copies
of one 120-token boilerplate text; copy i replaces token position
(i mod 120) with the copy-unique token "mut<i>". Byte-distinct (digest
stars stay singletons), pairwise jaccard ~0.9, every common shingle
df ~292 > 256 (capped), every mutated shingle df 1 (kept, unshared) —
the capped jaccard path sees 300 disjoint singletons; only the band
stars connect them. lang='xx' / source='boilerplate' keep the family
out of every language-keyed base-group assertion.

All other tables are copied verbatim.

Usage: python3 tools/make_boilerplate_fixture.py <src_sf_dir> <out_dir>
"""
import sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

FAM_SIZE = 300
N_TOKENS = 120


def fam_text(i: int) -> str:
    # stopwords at fixed non-adjacent positions (mirrors
    # BoilerplateRescueSpec.famText): real boilerplate PASSES quality
    # gates — a stopword-free family fails Gopher p_stop and lets the
    # curation funnel's dedup stage pass vacuously (r17 review finding)
    def tok(j: int) -> str:
        if j == i % N_TOKENS:
            return f"mut{i}"
        if j % 40 == 7:
            return "the"
        if j % 40 == 27:
            return "of"
        return f"boiler{j}"
    return " ".join(tok(j) for j in range(N_TOKENS))


def main(src: str, out: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        if t != "documents":
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet')"
                f" TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    start = con.execute(
        f"SELECT max(doc_id) + 1 FROM '{src}/documents.parquet'").fetchone()[0]
    rows = ", ".join(
        f"({start + i}, '{fam_text(i)}', 'xx', 'boilerplate',"
        f" {len(fam_text(i))})"
        for i in range(FAM_SIZE))
    con.execute(
        f"COPY (SELECT doc_id, text, lang, source, n_chars"
        f"      FROM '{src}/documents.parquet'"
        f"      UNION ALL"
        f"      SELECT * FROM (VALUES {rows})"
        f"        v(doc_id, text, lang, source, n_chars))"
        f" TO '{out}/documents.parquet' (FORMAT PARQUET)")
    n, fam = con.execute(
        f"SELECT count(*), sum(CASE WHEN lang = 'xx' THEN 1 ELSE 0 END)"
        f" FROM '{out}/documents.parquet'").fetchone()
    assert fam == FAM_SIZE, f"family row count {fam} != {FAM_SIZE}"
    print(f"duckdb {duckdb.__version__}: {n} docs ({fam} boilerplate family)")


if __name__ == "__main__":
    assert len(sys.argv) == 3, __doc__
    main(sys.argv[1], sys.argv[2])
