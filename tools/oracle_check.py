#!/usr/bin/env python3
"""Local dev harness mirroring the driver's correctness gate.

Runs AFTER `graft.Verify` has dumped query outputs: compares each
<outDir>/<name> parquet against the DuckDB result of oracle_sql.json
over the same sf directory. Row order is ignored (both sides sorted by
all columns); values must match exactly (floats bit-for-bit), which is
what a hash-based compare implies.

Usage: tools/oracle_check.py <sfDir> <outDir> [query ...]
           [--fresh] [--memory-limit SIZE]

Optional query names restrict the sweep (exact match). `--fresh` runs
every checked query in its OWN subprocess — the worst-case isolation
the driver's non-recycling checker can only dream of, useful to prove
a single oracle stands alone. `--memory-limit 2GB` applies DuckDB's
memory_limit PRAGMA, the way the q92 footprint fix is verified: the
SemDeDup oracle must pass under a 2 GB cap so the driver's fragmented
long-lived process still has room for it.
"""
import json
import sys

import duckdb


def main(sf_dir: str, out_dir: str, only=None, memory_limit=None) -> int:
    tables = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]

    def fresh_con():
        c = duckdb.connect()
        if memory_limit:
            c.sql(f"SET memory_limit='{memory_limit}'")
        for t in tables:
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        return c

    state = {"con": fresh_con()}

    def duck(query: str):
        """Run a query; on DuckDB's documented transient OOM (tiny
        allocations failing right after the Spark JVM exits) reconnect
        once and retry. A second failure propagates to the caller's
        per-query FAIL handler, so one bad query never kills the sweep.
        """
        try:
            return state["con"].sql(query).fetchdf()
        except Exception as e:
            if "Out of Memory" not in str(e):
                raise
            state["con"] = fresh_con()
            return state["con"].sql(query).fetchdf()

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    if only:
        missing = sorted(set(only) - set(oracles))
        if missing:
            print(f"FAIL unknown query name(s): {missing}")
            return 1
        oracles = {k: v for k, v in oracles.items() if k in only}
    failures = 0
    for qi, (name, sql) in enumerate(sorted(oracles.items())):
        # Recycle the connection periodically: DuckDB's allocator can
        # accumulate tens of thousands of mmap regions across embedding-
        # heavy queries (unrolled 64-dim cosine plans); once the process
        # crosses vm.max_map_count every later allocation fails ("bad
        # allocation" at 2 KB with free RAM). A fresh connection releases
        # the maps. Root cause also fixed SQL-side (MATERIALIZED asn CTE).
        if qi % 10 == 9:
            state["con"].close()
            state["con"] = fresh_con()
        try:
            got = duck(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failures += 1
            continue
        try:
            # Static type sweep first: a HUGEINT column (uncast SUM over
            # BIGINT) hashes differently on the driver even when every
            # value matches — fail it by name before the value compare.
            desc = duck(f"DESCRIBE ({sql})")
            huge = [(r["column_name"], r["column_type"])
                    for _, r in desc.iterrows()
                    if "HUGEINT" in str(r["column_type"]).upper()]
            if huge:
                print(f"FAIL {name}: oracle emits HUGEINT column(s): {huge} "
                      "(cast the SUM to BIGINT)")
                failures += 1
                continue
            want = duck(sql)
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: columns differ: spark={gcols} oracle={wcols}")
            failures += 1
            continue
        g = got[gcols].sort_values(gcols).reset_index(drop=True)
        w = want[wcols].sort_values(wcols).reset_index(drop=True)
        if len(g) != len(w):
            print(f"FAIL {name}: rows differ: spark={len(g)} oracle={len(w)}")
            failures += 1
            continue
        # Type-strict modulo integer WIDTH: the driver's hash normalizes
        # int8/16/32/64 to one representation but NOT int128 (DuckDB
        # HUGEINT arrives as object/float dtype in pandas) or int-vs-float.
        # Normalize both frames' integer widths to int64, then require
        # dtype equality — so an uncast SUM(BIGINT)→HUGEINT oracle fails
        # here exactly as it fails the driver gate.
        import numpy as np
        import pandas as pd

        def norm_widths(df):
            df = df.copy()
            for c in df.columns:
                if pd.api.types.is_integer_dtype(df[c]):
                    df[c] = df[c].astype("int64")
            return df

        width_skew = [c for c in gcols
                      if pd.api.types.is_integer_dtype(got[c])
                      and pd.api.types.is_integer_dtype(want[c])
                      and str(got[c].dtype) != str(want[c].dtype)]
        if width_skew:
            # Tolerated by the driver's hash today, but a latent risk if
            # its normalization ever tightens — keep this list at zero by
            # casting the Spark column to long at the final select.
            print(f"WARN {name}: integer width skew (engine vs oracle): "
                  + ", ".join(f"{c}: {got[c].dtype} vs {want[c].dtype}"
                              for c in width_skew))
        g, w = norm_widths(g), norm_widths(w)
        dtype_bad = [c for c in gcols if str(g[c].dtype) != str(w[c].dtype)]
        if dtype_bad:
            print(f"FAIL {name}: dtypes differ (post int-width normalization): "
                  + ", ".join(f"{c}: spark={g[c].dtype} oracle={w[c].dtype}"
                              for c in dtype_bad))
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=True, check_exact=True)
            print(f"OK   {name}: {len(g)} rows")
        except AssertionError as e:
            print(f"FAIL {name}: values differ:\n{str(e)[:800]}")
            # show first mismatching cells
            for c in gcols:
                neq = (g[c] != w[c]) & ~(g[c].isna() & w[c].isna())
                if neq.any():
                    i = neq.idxmax()
                    print(f"  first diff col={c} row={i}: spark={g[c][i]!r} oracle={w[c][i]!r}")
            failures += 1
    print(f"\n{len(oracles) - failures}/{len(oracles)} oracle queries match")
    return 1 if failures else 0


def fresh_sweep(sf_dir, out_dir, names, memory_limit):
    """One subprocess per query: no shared allocator state at all."""
    import subprocess
    rc = 0
    for n in names:
        cmd = [sys.executable, __file__, sf_dir, out_dir, n]
        if memory_limit:
            cmd += ["--memory-limit", memory_limit]
        rc |= subprocess.call(cmd)
    return rc


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser(
        description="Mirror the driver's correctness gate over a "
                    "graft.Verify dump.")
    ap.add_argument("sf_dir", help="testdata scale-factor directory")
    ap.add_argument("out_dir", help="graft.Verify output directory")
    ap.add_argument("names", nargs="*", metavar="query",
                    help="restrict the sweep to these query names")
    ap.add_argument("--fresh", action="store_true",
                    help="one subprocess per query (worst-case isolation)")
    ap.add_argument("--memory-limit", metavar="SIZE",
                    help="DuckDB memory_limit PRAGMA, e.g. 2GB")
    args = ap.parse_args()
    if args.fresh:
        names = args.names
        if not names:
            with open(f"{args.out_dir}/oracle_sql.json") as f:
                names = sorted(json.load(f))
        sys.exit(fresh_sweep(args.sf_dir, args.out_dir, names,
                             args.memory_limit))
    sys.exit(main(args.sf_dir, args.out_dir, set(args.names) or None,
                  args.memory_limit))
