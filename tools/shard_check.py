#!/usr/bin/env python3
"""Shard the oracle check: split the result dirs of a Verify outDir into
N shard dirs of symlinks (+ a copy of oracle_sql.json) and run one
check_oracle.py per shard in parallel with --partial --sql-over=N.
Usage: shard_check.py <sfDir> <outDir> <nShards> [namePrefixFilter,...]
Dev-only tooling for the scaled sweeps (round-12 note: for the HEAVY
families -- sim chains, CC closures, pair emitters -- prefer ONE
check_oracle process PER QUERY instead of a long shard: a shared
DuckDB connection accumulates temp spill across queries and
self-poisons the run; see BASELINE round-12 sweep record)."""
import json
import os
import shutil
import subprocess
import sys

sf_dir, out_dir, n_shards = sys.argv[1], sys.argv[2], int(sys.argv[3])
pats = sys.argv[4].split(",") if len(sys.argv) > 4 else None
names = sorted(d for d in os.listdir(out_dir)
               if os.path.isdir(f"{out_dir}/{d}"))
if pats:
    names = [n for n in names
             if any(n == p or n.startswith(p) for p in pats)]
tag = (pats[0].rstrip("_,") if pats else "all")
shard_root = f"{out_dir}_shards_{tag}"
procs = []
for i in range(n_shards):
    sd = f"{shard_root}/s{i}"
    shutil.rmtree(sd, ignore_errors=True)
    os.makedirs(sd)
    shutil.copy(f"{out_dir}/oracle_sql.json", f"{sd}/oracle_sql.json")
    for n in names[i::n_shards]:
        os.symlink(f"{out_dir}/{n}", f"{sd}/{n}")
    log = open(f"{sd}.log", "w")
    # each shard gets its own cwd: concurrent DuckDB processes sharing
    # one cwd collide on .tmp/duckdb_temp_storage-*.tmp spill files
    procs.append((i, subprocess.Popen(
        [sys.executable, "/root/repo/tools/check_oracle.py", sf_dir, sd,
         "--partial", "--sql-over=200000", "--mem=20GB"],
        cwd=sd, stdout=log, stderr=subprocess.STDOUT)))
rc = 0
for i, p in procs:
    p.wait()
    rc |= p.returncode
    tail = open(f"{shard_root}/s{i}.log").read().strip().splitlines()
    print(f"shard {i}: {tail[-1] if tail else '(empty)'}")
print("OVERALL", "FAIL" if rc else "PASS")
sys.exit(rc)
