#!/usr/bin/env python3
"""Compare a bench.py JSON line against a previous round's recording.

Usage:
    python scripts/bench_compare.py NEW.json [OLD.json]

NEW.json: a file whose last line is bench.py's JSON output (or a driver
BENCH_r{N}.json with a ``parsed`` payload). OLD defaults to the repo's
BENCH_r01.json (whose parsed payload is the 31-query BASELINE set).
Prints the shared-query total ratio (the judge's bench_vs_baseline number)
and every query that moved more than 20% either way.
"""

from __future__ import annotations

import json
import sys


def _attach_canary(d: dict, text: str) -> dict:
    """Best-effort: pull the frozen-canary suite-start total (r6 bench.py
    addition) out of whatever payload shape we were handed, so ratios can be
    normalized for environment drift. Sources, in order: the full payload's
    per-query ``canary_start`` dict, the compact summary's
    ``canary_start_sec``, or a regex over the raw text (driver JSONs keep
    only a stdout tail whose final line is the compact summary)."""
    import re

    sec = None
    if isinstance(d.get("canary_start"), dict) and d["canary_start"]:
        sec = sum(d["canary_start"].values())
    elif isinstance(d.get("canary_start_sec"), (int, float)):
        sec = float(d["canary_start_sec"])
    else:
        m = re.findall(r'"canary_start_sec":\s*([0-9][0-9.]*)', text)
        if m:
            sec = float(m[-1])
    if sec:
        d["_canary_start_sec"] = sec
    return d


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read().strip()
    # bench.py prints the full per-query payload, then a compact summary as
    # the final line — scan from the end for the first line carrying
    # per-query timings.
    for line in reversed(text.splitlines()):
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if not isinstance(d, dict):
            continue
        if "queries" in d:
            return _attach_canary(d, text)
        if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
            return _attach_canary(d["parsed"], text)
    try:
        d = json.loads(text)
        if not isinstance(d, dict):
            raise json.JSONDecodeError("non-dict payload", text, 0)
        if "queries" in d:
            return _attach_canary(d, text)
        if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
            return _attach_canary(d["parsed"], text)
    except json.JSONDecodeError:
        pass
    # Driver BENCH_r{N}.json fallback: `parsed` may be null (the driver keeps
    # only a bounded stdout tail, which truncates the leading metric/value of
    # the full per-query line) — recover per-query timings from the raw
    # `tail` text with a regex. Partial but sufficient for shared-query
    # comparisons.
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and isinstance(d.get("tail"), str):
        import re

        pairs = re.findall(r'"([a-z0-9_]+)":\s*([0-9][0-9.]*)', d["tail"])
        queries = {
            k: float(v)
            for k, v in pairs
            if k not in ("value", "sf", "n_queries", "n", "rc", "cpus",
                         "canary_start_sec", "canary_end_sec")
        }
        if queries:
            return _attach_canary(
                {"queries": queries, "value": sum(queries.values()),
                 "recovered_from_tail": True},
                d["tail"],
            )
    raise SystemExit(f"{path}: no parsed bench payload")


def main() -> None:
    new = load(sys.argv[1])
    old = load(sys.argv[2] if len(sys.argv) > 2 else "BENCH_r01.json")
    nq, oq = new["queries"], old["queries"]
    shared = sorted(set(nq) & set(oq))
    n_tot = sum(nq[k] for k in shared)
    o_tot = sum(oq[k] for k in shared)
    if not shared or o_tot <= 0:
        print(f"shared queries: {len(shared)} — no comparable timings; "
              f"new total={sum(nq.values()):.2f}s over {len(nq)} queries")
        return
    print(f"shared queries: {len(shared)}  new={n_tot:.2f}s old={o_tot:.2f}s "
          f"ratio={n_tot / o_tot:.3f}x")
    # Canary normalization (r6 verdict #6): both runs time the same FROZEN
    # 5-query set at suite start, so their ratio measures pure environment/
    # JVM drift between recordings — divide it out to see what the PLANS did.
    nc, oc = new.get("_canary_start_sec"), old.get("_canary_start_sec")
    if nc and oc:
        drift = nc / oc
        print(f"canary drift: {drift:.3f}x (start {oc:.2f}s -> {nc:.2f}s); "
              f"normalized ratio={n_tot / o_tot / drift:.3f}x")
    else:
        print("canary drift: n/a (one side predates the r6 canary) — "
              "raw ratio includes environment drift")
    print(f"new-only queries: {len(set(nq) - set(oq))} "
          f"({sum(nq[k] for k in set(nq) - set(oq)):.2f}s)")
    # Per-query deltas are printed RAW and canary-NORMALIZED side by side
    # (r12 verdict #7): same-code r11→r12 runs showed individual iterative
    # queries swinging up to 1.5× from host/GC alone, so only a normalized
    # ratio beyond the measured noise envelope is labeled a regression.
    drift = (nc / oc) if (nc and oc) else 1.0
    noise_gate = 1.5   # measured same-code r11→r12 envelope
    abs_gate = 0.5     # sub-second queries swing ±0.5 s on GC/scheduling
    movers = [
        (nq[k] / max(oq[k], 1e-9), k) for k in shared
        if nq[k] / max(oq[k], 1e-9) > 1.2 or nq[k] / max(oq[k], 1e-9) < 0.8
    ]
    for r, k in sorted(movers, reverse=True):
        norm = r / drift
        material = abs(nq[k] - oq[k]) >= abs_gate
        label = ("REGRESSION" if norm > noise_gate and material
                 else "improvement" if norm < 1.0 / noise_gate and material
                 else "within noise")
        print(f"  raw {r:5.2f}x  norm {norm:5.2f}x  [{label}]  "
              f"{k}: {oq[k]:.3f} -> {nq[k]:.3f}")
    slow = sorted(nq.items(), key=lambda kv: -kv[1])[:10]
    print("slowest now:", ", ".join(f"{k}={v:.2f}s" for k, v in slow))


if __name__ == "__main__":
    main()
