#!/usr/bin/env python3
"""Re-seed src/main/resources/graft/bench_pins_sf10.tsv from a full
sf10 bench log (the BENCHQ lines graft.Bench prints per entry).

Usage: python3 tools/reseed_pins.py <bench_log> [--apply]

Pin = min(in-suite min-of-2, isolated solo min-of-3) for entries with
an isolated override in ISOLATED below — the same convention the r15
pins documented. Without --apply, prints the would-be file to stdout
plus a diff summary vs the committed pins.
"""
import re, sys

# isolated solo min-of-3 numbers (seconds) that override in-suite
# times when SMALLER — late-suite memory pressure inflates these;
# keyed measurements, not guesses (SURVEY §17-§18).
ISOLATED = {
    "bpe_train": 10.591,        # r15
    "sample_importance": 10.698, # r15
    "dedup_decontam_frac": 56.376, # r15 (isolated is the REAL time)
    "knn_ivf_refresh": 15.263,  # r15
    # r16 solo min-of-3 (target/solo_r16.log) — every in-suite flag in
    # the r16 full run adjudicated as late-suite pressure:
    "q55_groups_frame": 1.568,   # in-suite 24.0 s was pressure
    "q03_join_agg": 3.351,       # in-suite 20.1 s was pressure
    "q29_asof_join": 1.782,      # in-suite 5.8 s was pressure
    "q11_having": 6.955,         # r15's 9.43 s was pressure too
    "q82_bom_closure": 6.159,    # r15's 9.22 s was pressure too
    "stream_session": 34.573,    # in-suite 63.2 s was pressure
    # r16 decade-exponent solos (target/solo_r16b.log):
    "q71_fuzzy_match": 55.547,   # post scaled-parts plan, solo sf10
    "corpus_overlap": 43.184,
    "knn_graph": 21.010,         # in-suite 44 s is ~2x pressure
    # r16 second wave (target/solo_r16c.log) — the remaining top
    # in-suite entries, so every >20 s pin is isolation-backed:
    "knn_hybrid": 46.938,
    "stream_timer_sessions": 39.158,
    "dedup_decontaminate": 36.982,
    "emb_pca_power": 27.653,
    "q07_window_rank": 10.531,
    "text_entropy": 23.283,
}

PINS = "src/main/resources/graft/bench_pins_sf10.tsv"

def main(log_path, apply_it):
    text = open(log_path).read()
    q = {}
    for m in re.finditer(r"BENCHQ (\S+)\s+([0-9.]+) s", text):
        q[m.group(1)] = float(m.group(2))
    if not q:
        sys.exit("no BENCHQ lines found")
    total = sum(q.values())
    old = {}
    for line in open(PINS):
        if line.startswith("#") or not line.strip():
            continue
        k, v = line.split("\t")
        old[k] = float(v)
    header = (
        "# sf10 per-entry serving-time pins (seconds), seeded r16 from the\n"
        f"# full-suite min-of-2 run on r16 HEAD (total {total:.1f} s /"
        f" {len(q)} entries /\n"
        "# 0 errors). Entries whose in-suite numbers are known to inflate\n"
        "# under late-suite memory pressure are pinned at their ISOLATED\n"
        "# solo min-of-3 instead (marked below) - so decade adjudication is\n"
        "# a mechanical median_pin_ratio read (<= ~1.15 = healthy; see\n"
        "# SURVEY §5), not a per-round re-measure.\n"
        "# Isolated solo min-of-3 (pin = min(in-suite, isolated)):\n"
    )
    iso_lines = "#   " + ", ".join(
        f"{k} {v:.3f}" for k, v in sorted(ISOLATED.items())) + "\n"
    rows = []
    for k in sorted(q):
        pin = min(q[k], ISOLATED.get(k, float("inf")))
        rows.append(f"{k}\t{pin:.3f}")
    out = header + iso_lines + "\n".join(rows) + "\n"
    # diff summary
    big = []
    for k in sorted(q):
        if k in old and old[k] > 0:
            r = min(q[k], ISOLATED.get(k, float("inf"))) / old[k]
            if r > 1.5 or r < 0.5:
                big.append(f"  {k}: {old[k]:.2f} -> {q[k]:.2f} ({r:.2f}x)")
    print(f"entries: {len(q)}  total: {total:.1f} s")
    print("pins moving >1.5x either way vs committed:")
    print("\n".join(big) if big else "  (none)")
    missing = sorted(set(old) - set(q))
    if missing:
        print("WARNING committed pins missing from log:", missing)
    if apply_it:
        with open(PINS, "w") as f:
            f.write(out)
        print(f"wrote {PINS}")

if __name__ == "__main__":
    main(sys.argv[1], "--apply" in sys.argv)
