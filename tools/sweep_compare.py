"""Compare two registry_sweep --out JSON files (e.g. sf1 vs sf10):
per-slug wall ratio, the implied per-decade scaling exponent, and the
spill/peak-memory ledger of the newer run.

Usage: python tools/sweep_compare.py OLD.json NEW.json [decades]
  decades: how many 10x steps separate the two runs (default 1.0)

Output: a markdown table sorted by exponent, ERR/GUARDED rows surfaced
first — paste-ready for SCALING.md.
"""

from __future__ import annotations

import json
import math
import sys


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    decades = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    old_t = old.get("times", old)
    new_t = new.get("times", new)
    metrics = new.get("metrics", {})

    rows = []
    for slug, nv in sorted(new_t.items()):
        ov = old_t.get(slug)
        m = metrics.get(slug, {})
        spill = (m.get("memory_spill_bytes", 0) + m.get("disk_spill_bytes", 0))
        peak = m.get("peak_execution_memory", 0)
        if isinstance(nv, str):
            rows.append((float("inf"), slug, ov, nv, None, spill, peak))
            continue
        if not isinstance(ov, (int, float)) or ov <= 0:
            rows.append((-1.0, slug, ov, nv, None, spill, peak))
            continue
        exp = math.log10(nv / ov) / decades
        rows.append((exp, slug, ov, nv, exp, spill, peak))

    print("| slug | old s | new s | exponent | spill MB | peak exec MB |")
    print("|---|---|---|---|---|---|")
    for _, slug, ov, nv, exp, spill, peak in sorted(rows, reverse=True):
        ovs = f"{ov:.2f}" if isinstance(ov, (int, float)) else str(ov)
        nvs = f"{nv:.2f}" if isinstance(nv, (int, float)) else str(nv)[:60]
        es = f"{exp:+.2f}" if exp is not None else "—"
        print(f"| {slug} | {ovs} | {nvs} | {es} | "
              f"{spill // 2**20} | {peak // 2**20} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
