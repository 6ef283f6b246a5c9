#!/usr/bin/env python3
"""Re-record BASELINE.md's per-query median table from N bench runs.

Usage: python3 tools/rebaseline.py run1.json run2.json run3.json

Each argument is a bench_queries.json produced by `graft.Bench`
(copy it aside between runs — Bench overwrites it). The per-query
table (everything after the `| query | sec |` header) is replaced
with per-query medians across the runs; queries missing from some
runs use the median of the runs they appear in. The probe row and
the headline total row are NOT touched — update those by hand with
the run context (slot notes, spread, registry size), which a script
cannot know.
"""
import json
import statistics
import sys


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    runs = [json.load(open(p)) for p in sys.argv[1:]]
    names: list[str] = []
    for r in runs:
        for k in r["queries"]:
            if k not in names:
                names.append(k)
    med = {}
    for k in sorted(names):
        vals = [r["queries"][k] for r in runs if k in r.get("queries", {})]
        med[k] = statistics.median(vals)
    totals = [r["value"] for r in runs]
    print(f"runs: {len(runs)}  totals: {totals}  "
          f"median total: {statistics.median(totals)}")
    print(f"queries: {len(med)}  median-table sum: {sum(med.values()):.1f}")
    failed = [f for r in runs for f in r.get("failed", [])]
    if failed:
        print(f"WARNING: failures present, fix before re-recording: {failed}")
        sys.exit(1)

    path = "BASELINE.md"
    text = open(path, encoding="utf-8").read()
    head, sep, tail = text.partition("| query | sec |\n")
    if not sep:
        sys.exit("BASELINE.md: `| query | sec |` header not found")
    # tail = old table rows + a trailing bold context row (replaced)
    rows = "\n".join(f"| {k} | {med[k]:.2f} |" for k in sorted(med))
    run_totals = ", ".join(f"{t:.1f}" for t in totals)
    bold = (f"| **total (sum of per-query medians; run totals {run_totals}; "
            "zero failures in every run; q000 prices every shared "
            "content-addressed staging build — sim-join set/pair tables, "
            "LSH band/edge/component chain, partsupp surrogate — so every "
            "consumer row is pure query cost)** | "
            f"**{sum(med.values()):.2f}** |")
    open(path, "w", encoding="utf-8").write(
        head + sep + "|---|---|\n" + rows + "\n" + bold + "\n")
    print(f"BASELINE.md per-query table rewritten: {len(med)} rows")


if __name__ == "__main__":
    main()
