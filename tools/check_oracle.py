#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--partial]

For each query result parquet under verifyOutDir, runs the matching SQL
from oracle_sql.json in DuckDB (with views over the sfDir parquet tables)
and compares: row count, column names (sorted), and values EXACTLY —
including floats (every registered query is designed bit-identical
across engines; tolerance would hide drift). Both row lists are sorted
on a canonical key before comparison, so the check does not depend on
parquet part-file order or on ORDER BY surviving the column projection.

An oracle key with NO result dir is a FAILURE by default: Verify
catches per-query exceptions and writes no dir for a crashed query, so
a silent skip would let a full-roster run with a crash exit 0. Pass
--partial ONLY for intentionally-filtered Verify dumps (a name/prefix
filter arg was given to Verify) — then missing dirs are counted as
skips and the exit code ignores them.
Dev-only tooling; NOT part of the shipped engine.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # -0.0 == 0.0 but repr-sorts differently
        return v
    return v


def eq(a, b):
    # EXACT comparison, including floats — mirrors the driver's
    # hash-compare. Every registered query is designed to be
    # bit-identical across engines (decimal-exact sums, shared float
    # paths, tie-free rounding scales); tolerance would hide drift.
    return norm(a) == norm(b)


def row_key(row):
    # order-insensitive canonical sort key (None/mixed types aren't
    # directly comparable in python3)
    return tuple(repr(norm(v)) for v in row)


def nl_audit(sf_dir, out_dir):
    """EXPLAIN every oracle and report non-hash join operators.

    Diagnostic for scaled sweeps: a BLOCKWISE_NL/NESTED_LOOP join whose
    sides both scale with the data is quadratic and will hang the next
    decade (the round-12 sf10 sweep lost hours each to an OR-disjunction
    band join and a scalar subquery inside a join predicate before their
    restatements). Most hits are benign -- CROSS_PRODUCT against 1-row
    scalar subqueries, NL joins over bounded grids (months, tickers,
    sample points), and the deliberate brute-force baselines -- so this
    is a REPORT to triage before a new decade, not a gate; the
    string-level gate for the two known-fatal idioms is
    OracleIdiomSpec."""
    con = duckdb.connect()
    con.execute("SET memory_limit='4GB'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ops = ("BLOCKWISE_NL_JOIN", "NESTED_LOOP_JOIN", "CROSS_PRODUCT",
           "PIECEWISE_MERGE_JOIN")
    n_hit = 0
    for name, sql in sorted(oracle.items()):
        try:
            plan = "\n".join(
                r[1] for r in con.sql("EXPLAIN " + sql).fetchall())
        except Exception as e:
            print(f"EXPLAIN-ERROR {name}: {e}")
            continue
        hit = [o for o in ops if o in plan]
        if hit:
            n_hit += 1
            print(f"NL {name}: {','.join(hit)}")
    print(f"== {n_hit}/{len(oracle)} oracles with non-hash-join operators ==")
    return 0


def main(sf_dir, out_dir, partial=False, sql_over=None, mem=None):
    con = duckdb.connect()
    if mem:
        # scaled sweeps run several checker processes in parallel;
        # DuckDB's default (~80% of RAM) would overcommit the host
        con.execute(f"SET memory_limit='{mem}'")
    for t in TABLES:
        # driver testdata ships single files; MakeScale output is a
        # Spark-style directory of part files — read either shape
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        # Verify writes the FULL oracle map even for filtered dumps.
        # Under --partial a missing dir is an intentional filter skip;
        # otherwise it means the query CRASHED in Verify (the per-query
        # catch writes no dir) and must fail the gate.
        if not os.path.isdir(f"{out_dir}/{name}"):
            if partial:
                n_skip += 1
            else:
                print(f"FAIL {name}: no result dir (query crashed in "
                      f"Verify, or pass --partial for a filtered dump)")
                n_fail += 1
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = sorted(spark_rel.columns)
            duck_rel = con.sql(sql)
            dcols = sorted(duck_rel.columns)
            if scols != dcols:
                print(f"FAIL {name}: cols spark={scols} duck={dcols}")
                n_fail += 1
                continue
            cols = ", ".join(scols)
            if sql_over is not None:
                # BULK PATH (scaled sweeps): counts + one-direction
                # EXCEPT ALL entirely inside DuckDB. Exact multiset
                # equality — |A| = |B| and A∖B = ∅ imply A = B — with
                # the SAME value semantics as the python compare
                # (verified on this engine: NaN = NaN, -0.0 = 0.0,
                # NULL = NULL in set ops), but no 250M-row python
                # repr-sort. Positional column match via the shared
                # sorted projection.
                n_s = con.sql("SELECT count(*) FROM spark_rel"
                              ).fetchone()[0]
                n_d = con.sql("SELECT count(*) FROM duck_rel").fetchone()[0]
                if n_s != n_d:
                    print(f"FAIL {name}: rows spark={n_s} duck={n_d}")
                    n_fail += 1
                    continue
                if n_s > sql_over:
                    diff = con.sql(
                        f"SELECT {cols} FROM spark_rel EXCEPT ALL "
                        f"SELECT {cols} FROM duck_rel LIMIT 1").fetchall()
                    if diff:
                        print(f"FAIL {name}: spark-only row {diff[0]!r}")
                        n_fail += 1
                    else:
                        print(f"PASS {name} ({n_s} rows, sql-compared)")
                        n_pass += 1
                    continue
            srows = sorted(con.sql(
                f"SELECT {cols} FROM spark_rel").fetchall(),
                key=row_key)
            drows = sorted(con.sql(
                f"SELECT {cols} FROM duck_rel").fetchall(),
                key=row_key)
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            n_fail += 1
            continue
        bad = None
        for i, (sr, dr) in enumerate(zip(srows, drows)):
            for j, (a, b) in enumerate(zip(sr, dr)):
                if not eq(a, b):
                    bad = (i, scols[j], a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} duck={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    skipped = f", {n_skip} not dumped" if n_skip else ""
    print(f"== {n_pass} pass, {n_fail} fail{skipped} ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    flags = [a for a in sys.argv[3:] if a.startswith("--")]
    sql_over = None
    mem = None
    for f in list(flags):
        if f.startswith("--mem="):
            # per-process DuckDB memory cap, e.g. --mem=24GB
            mem = f.split("=", 1)[1]
            flags.remove(f)
            continue
        if f.startswith("--sql-over="):
            # results larger than N rows compare inside DuckDB
            # (EXCEPT ALL) instead of the python repr-sort — same
            # exact multiset semantics, for scaled sweeps whose pair
            # emitters produce 10^8-row outputs. Default (flag absent)
            # keeps the python path for everything.
            sql_over = int(f.split("=", 1)[1])
            flags.remove(f)
    unknown = [f for f in flags if f not in ("--partial", "--nl-audit")]
    if unknown:
        sys.exit(f"unknown flag(s): {unknown} "
                 f"(only --partial / --sql-over=N / --mem=SIZE / "
                 f"--nl-audit)")
    stray = [a for a in sys.argv[3:] if not a.startswith("--")]
    if stray:
        # a mistyped "partial" (no dashes) must not silently keep the
        # strict no-skip gate on while the caller believes it's off
        sys.exit(f"unexpected positional argument(s): {stray} "
                 f"(usage: check_oracle.py <sfDir> <verifyOutDir> "
                 f"[--partial] [--sql-over=N] [--mem=SIZE] [--nl-audit])")
    if "--nl-audit" in flags:
        sys.exit(nl_audit(sys.argv[1], sys.argv[2]))
    sys.exit(main(sys.argv[1], sys.argv[2], partial="--partial" in flags,
                  sql_over=sql_over, mem=mem))
