#!/usr/bin/env python3
"""Simulate the driver's correctness checker at its worst: ONE DuckDB
connection, NO recycling, every oracle in sorted order — while tracking
the process's /proc/self/maps region count and RSS after each query.

The r12/r13 driver failures ("bad allocation" at 2-32 KB with >100 GB
free) are vm.max_map_count (65530) exhaustion: DuckDB's allocator plus
glibc fragmentation ratchet the region count up across embedding-heavy
oracles until mmap() itself fails. This harness makes that ratchet
measurable per query, so oracle-SQL memory fixes are chosen by evidence
(top region-growth contributors) instead of guesswork, and verified by
the end-of-sweep headroom number.

Usage: tools/driver_sim.py <sfDir> <outDir> [--repeat N] [--top K]
"""
import argparse
import json
import resource
import sys

import duckdb


def nmaps():
    with open("/proc/self/maps") as f:
        return sum(1 for _ in f)


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--repeat", type=int, default=1,
                    help="run the whole sweep N times in one process "
                         "(the ratchet is cumulative; the driver may "
                         "re-enter)")
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    tables = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]
    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{args.sf_dir}/{t}.parquet')")

    with open(f"{args.out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    growth = {}
    failures = []
    m_prev = nmaps()
    m_peak = m_prev
    print(f"start: maps={m_prev} rss={rss_mb():.0f}MB "
          f"queries={len(oracles)} repeat={args.repeat}")
    for rep in range(args.repeat):
        for name, sql in sorted(oracles.items()):
            try:
                con.sql(sql).fetchdf()
            except Exception as e:
                failures.append((name, str(e).splitlines()[0][:120]))
            m = nmaps()
            growth[name] = growth.get(name, 0) + (m - m_prev)
            m_prev = m
            m_peak = max(m_peak, m)
        print(f"after pass {rep + 1}: maps={m_prev} rss={rss_mb():.0f}MB "
              f"failures={len(failures)}")

    print(f"\ntop {args.top} map-count growers (cumulative over "
          f"{args.repeat} pass(es)):")
    for name, g in sorted(growth.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {g:+6d}  {name}")
    for name, err in failures:
        print(f"FAIL {name}: {err}")
    # headroom verdict: the driver box dies at vm.max_map_count (65530)
    print(f"\nfinal: maps={m_prev} peak={m_peak} / 65530 "
          f"(peak {100.0 * m_peak / 65530:.1f}% of the limit), "
          f"rss={rss_mb():.0f}MB, failures={len(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
