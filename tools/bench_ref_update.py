#!/usr/bin/env python3
"""Maintain bench_ref.json, the per-query clean-reference ledger the
Bench drift re-probe keys on (VERDICT r17 #1).

The ledger is a flat {"query_name": steady_seconds} map committed at
the repo root. It is updated ONLY from runs whose own artifact
counters certify them clean, and merged by per-query MIN — a stall in
one otherwise-clean run can inflate individual queries, and the min
across clean runs converges on the box's true steady floor.

Usage:
  python3 tools/bench_ref_update.py [target/bench_full.json ...]
  python3 tools/bench_ref_update.py --prune <query> [<query> ...]

Each argument is a full-precision bench dump. A run is accepted when:
  - no failed queries,
  - no steady-over-cold inversions and no low-CPU passes,
  - max_tstart_gap under 2 s (no between-query freezes),
  - cold_total under 1.8x steady_total (a frozen cold tail marks the
    whole run suspect even when steady passes look clean).
Rejected runs are reported and skipped; the ledger is never degraded.

Staleness: min-merge means a reference can only fall. If a query is
INTENTIONALLY made slower (heavier semantics), its stale floor keeps
the drift detector flagging it — harmlessly (the suite-end re-probe
confirms the slow value and min() changes nothing, visible as
drift_n > 0 with an empty drift_repaired list), but noisily. The
Bench prints "CONFIRMED slow ... prune with" for exactly this state
(Bench.staleFloor); run `--prune <query>` in the same commit that
slows it — the entry is removed and the next clean run re-seeds it.
"""
import json
import re
import sys


def run_sf(d):
    """Scale factor of a bench_full.json artifact, parsed from its sf dir."""
    m = re.search(r"sf([0-9.]+)", str(d.get("sf", "")))
    return float(m.group(1)) if m else None


def load_ledger(path="bench_ref.json"):
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


def run_clean(d):
    reasons = []
    if d.get("failed"):
        reasons.append(f"failed queries: {sorted(d['failed'])[:3]}")
    if d.get("steady_over_cold"):
        reasons.append(f"inversions: {d['steady_over_cold'][:3]}")
    if d.get("low_cpu_passes"):
        reasons.append(f"low-cpu passes: {d['low_cpu_passes'][:3]}")
    if d.get("max_tstart_gap", 0) > 2.0:
        reasons.append(f"max_tstart_gap {d['max_tstart_gap']:.2f}s")
    steady = d.get("steady_total", 0)
    cold = d.get("total", 0)
    if steady > 0 and cold > 1.8 * steady:
        reasons.append(f"cold_total {cold:.1f}s vs steady {steady:.1f}s")
    return reasons


def prune(names):
    """Drop stale floors (VERDICT r18 #5): after an INTENTIONAL slowdown
    the min-merged reference can never rise, so the drift detector would
    flag the query forever. Pruning removes the entry; the next clean
    run re-seeds it at the new honest floor.
    """
    ledger = load_ledger()
    for name in names:
        if name == "_sf":
            print(f"refuse: '_sf' is the ledger's scale marker, not a query")
        elif name in ledger:
            del ledger[name]
            print(f"pruned {name}")
        else:
            print(f"not in ledger: {name}")
    with open("bench_ref.json", "w") as f:
        json.dump(dict(sorted(ledger.items())), f, indent=1)
        f.write("\n")
    qs = {k: v for k, v in ledger.items() if k != "_sf"}
    print(f"bench_ref.json: {len(qs)} queries, sum {sum(qs.values()):.2f}s")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--prune":
        if len(sys.argv) < 3:
            sys.exit("--prune needs at least one query name")
        prune(sys.argv[2:])
        return
    paths = sys.argv[1:] or ["target/bench_full.json"]
    ledger = load_ledger()
    before = dict(ledger)
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        reasons = run_clean(d)
        # SF gate: references are only comparable within one scale
        # factor — an sf0.01 run min-merged into an sf0.1 ledger would
        # permanently poison every floor (min-only merge never recovers)
        sf = run_sf(d)
        if sf is None:
            reasons.append("artifact carries no parseable sf")
        elif "_sf" in ledger and ledger["_sf"] != sf:
            reasons.append(
                f"sf {sf} does not match the ledger's sf {ledger['_sf']}")
        if reasons:
            print(f"REJECT {p}: " + "; ".join(reasons))
            continue
        ledger["_sf"] = sf
        merged = 0
        for name, sec in d["steady"].items():
            if name not in ledger or sec < ledger[name]:
                ledger[name] = round(float(sec), 4)
                merged += 1
        print(f"accept {p}: steady_total={d['steady_total']:.2f}s, "
              f"{merged} entries improved/added")
    if ledger != before:
        with open("bench_ref.json", "w") as f:
            json.dump(dict(sorted(ledger.items())), f, indent=1)
            f.write("\n")
        # the "_sf" scale-factor marker is ledger metadata, not a query —
        # keep it out of the count and the seconds sum
        qs = {k: v for k, v in ledger.items() if k != "_sf"}
        print(f"bench_ref.json: {len(qs)} queries, "
              f"sum {sum(qs.values()):.2f}s")
    else:
        print("ledger unchanged")


if __name__ == "__main__":
    main()
