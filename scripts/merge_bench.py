"""Merge two (or more) separated bench.py --anchor windows into one
committed anchor JSON: per-query minimum across the windows
(BASELINE.md §anchor methodology — the r08 sf10 anchor episode showed
one window's best-of-2 bakes co-tenant noise into the longitudinal
base; two separated best-of-3 windows bound that).

Usage: python scripts/merge_bench.py w1.json w2.json [...] > anchor.json

All inputs must share sf and layout mode (an anchor mixing scales or
layouts is meaningless); totals are recomputed from the merged
per-query entries, and the tripwire's ``regressions`` is dropped (the
merged file IS the new comparison base).
"""

from __future__ import annotations

import json
import sys


def merge(paths: list[str]) -> dict:
    runs = [json.load(open(p)) for p in paths]
    base = runs[0]
    for r in runs[1:]:
        if str(r.get("sf")) != str(base.get("sf")):
            raise SystemExit(
                f"sf mismatch: {r.get('sf')} vs {base.get('sf')}"
            )
        if r.get("layout", {}).get("mode") != base.get("layout", {}).get(
            "mode"
        ):
            raise SystemExit("layout mode mismatch between windows")
    out = dict(base)
    for series in (
        "queries",
        "queries_noop",
        "extended_queries",
        "capstone_queries",
    ):
        # union of keys across ALL windows (ADVICE r09): a query present
        # only in a later window (added between anchor windows) must not
        # be silently dropped, and a query missing from some window is a
        # thinner sample — warn so the anchor's provenance is honest.
        names: dict[str, None] = {}
        for r in runs:
            for name in r.get(series, {}):
                names.setdefault(name)
        merged = {}
        for name in names:
            vals = [
                r[series][name] for r in runs if name in r.get(series, {})
            ]
            if len(vals) < len(runs):
                print(
                    f"merge_bench: WARNING {series}/{name} present in "
                    f"{len(vals)}/{len(runs)} windows — min over fewer "
                    "samples",
                    file=sys.stderr,
                )
            merged[name] = min(vals)
        out[series] = merged
    out["value"] = round(sum(out["queries"].values()), 3)
    out["value_noop"] = round(
        sum(out["queries_noop"].values())
        + out["queries"].get("etl_binary_decom_calibrate", 0.0),
        3,
    )
    out["extended_total"] = round(sum(out["extended_queries"].values()), 3)
    if out.get("capstone_queries"):
        out["capstone_total"] = round(
            sum(out["capstone_queries"].values()), 3
        )
    out["etl_rows_per_sec"] = max(
        r.get("etl_rows_per_sec", 0) for r in runs
    )
    out["anchor"] = {
        "windows": len(runs),
        "samples_per_query_per_window": [
            r.get("samples_per_query", 2) for r in runs
        ],
        "per_window_value_noop": [r.get("value_noop") for r in runs],
    }
    out.pop("regressions", None)
    return out


if __name__ == "__main__":
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    print(json.dumps(merge(sys.argv[1:])))
