#!/usr/bin/env bash
# Round ritual (VERDICT r07 items 1, 3, 4): the standing gates that must
# be green before a round ends, in one runnable artifact. Each gate logs
# to /tmp/round_gate_<name>.log; the script prints a one-line verdict
# per gate and exits nonzero if any failed.
#
#   1. pytest              — full unit/integration suite
#   2. sweep_sf001_lint    — all declared queries vs DuckDB oracles at
#                            sf0.01, exact values + plan-shape lint
#   3. perturb_sf001       — partitioning-invariance sweep: every query
#                            re-run under adversarial layout (shuffle
#                            partitions 7, inputs repartition(13)) and
#                            exact-diffed against the default layout
#   4. sweep_sfx1_lint     — the same oracle + lint sweep at 100x the
#                            driver gate's data (/tmp/sfx1; regenerated
#                            from the driver's sf0.1 tables if absent)
#   5. perturb_sfx1_full   — FULL partitioning-invariance sweep at sf1
#                            (VERDICT r09 item 4, promoted from the
#                            62-query slice: AQE decisions — coalescing,
#                            skew splits, bloom injection — differ most
#                            at larger inputs, which is exactly where
#                            layout-dependent bugs hide)
#
# Bench runs stay OUT of this script: timing needs a quiet box, and the
# gates above saturate all cores for ~2-3 h combined. Run bench.py
# separately (sf0.1 longitudinal + /tmp/sfx10 anchor, BASELINE.md).

set -u
cd "$(dirname "$0")/.."

if [ ! -d /tmp/sfx1 ]; then
    echo "== staging /tmp/sfx1 (10x replicas of the driver sf0.1 tables)"
    python scripts/make_scaled_data.py --out /tmp/sfx1 --n 10 || exit 1
fi

overall=0
run() {
    local name=$1; shift
    local t0=$SECONDS
    echo "== $name: $*"
    if "$@" > "/tmp/round_gate_${name}.log" 2>&1; then
        echo "   PASS ($((SECONDS - t0))s)"
    else
        echo "   FAIL ($((SECONDS - t0))s) — /tmp/round_gate_${name}.log:"
        tail -5 "/tmp/round_gate_${name}.log" | sed 's/^/   | /'
        overall=1
    fi
}

# Oracle-replay-heavy queries at sf1: the shard-build capstone's DuckDB
# twin replays the full MinHash construction over every gram — 320 s at
# sf0.1, ~1 h at sfx1. The main sfx1 sweep excludes it; a dedicated gate
# re-runs it under --oracle-sample 10 (both engines on the identical
# seeded 1/10 documents subset → DuckDB cost back to the sf0.1 point
# while Spark still runs the sampled plan at sfx1 layout).
HEAVY_SF1="curation_shard_build_e2e"

# Rotate WHICH 1/10 subset the heavy gates verify (ADVICE r11): the
# residue class is derived from the commit count, so successive rounds'
# sampled gates cover different deterministic document subsets instead
# of re-checking the same fixed 1/10 forever. Full-population runs at
# sf0.01 and sf0.1 still cover every document each round.
SAMPLE_RESIDUE=$(( $(git rev-list --count HEAD 2>/dev/null || echo 0) % 10 ))
echo "== heavy-gate oracle-sample residue this round: $SAMPLE_RESIDUE"

run pytest           python -m pytest tests/ -q
run sweep_sf001_lint python scripts/check_correctness.py --lint
run perturb_sf001    python scripts/check_correctness.py --perturb
run sweep_sfx1_lint  python scripts/check_correctness.py --lint --sf /tmp/sfx1 --exclude "$HEAVY_SF1"
run sweep_sfx1_heavy python scripts/check_correctness.py --lint --sf /tmp/sfx1 --oracle-sample 10 --oracle-sample-residue "$SAMPLE_RESIDUE" $(echo "$HEAVY_SF1" | tr ',' ' ')

# perturb also replays the DuckDB oracle (the layout check is ON TOP of
# the oracle compare), so the heavy split applies here too — the full
# sfx1 shard-build twin OOM'd DuckDB while Spark held the box's memory.
run perturb_sfx1_full python scripts/check_correctness.py --perturb --sf /tmp/sfx1 --exclude "$HEAVY_SF1"
run perturb_sfx1_heavy python scripts/check_correctness.py --perturb --sf /tmp/sfx1 --oracle-sample 10 --oracle-sample-residue "$SAMPLE_RESIDUE" $(echo "$HEAVY_SF1" | tr ',' ' ')

if [ "$overall" -eq 0 ]; then echo "ROUND GATE: GREEN"; else echo "ROUND GATE: RED"; fi
exit $overall
