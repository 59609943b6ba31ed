"""Compare two bench artifacts per-query and report timing ratios.

Accepts either format the repo carries:
  * a full bench JSON ({"queries": {name: sec, ...}}), e.g.
    BENCH_r04_local.json or bench.py's first stdout line, or
  * a driver artifact ({"tail": "..."}), whose tail is a truncated
    fragment of the per-query line — timings are regex-recovered from it.

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold]

Prints queries whose new/old ratio exceeds the threshold (default 1.5)
or drops below its inverse, plus the common-set totals. Exit code stays
0 — this is a report, not a gate: with median-of-3 timings the ratios
are meaningful, but local[32] wall-clock still jitters.
"""

from __future__ import annotations

import json
import re
import sys


def load_timings(path: str) -> dict[str, float]:
    with open(path) as fh:
        text = fh.read()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        doc = {"tail": text}
    if isinstance(doc, dict) and isinstance(doc.get("queries"), dict):
        return {k: float(v) for k, v in doc["queries"].items()}
    tail = doc.get("tail", "") if isinstance(doc, dict) else ""
    # recover  "name": 1.2345  pairs from a truncated JSON fragment;
    # drop non-query keys that happen to match (value/sf/n/trials...)
    pairs = re.findall(r'"([a-z][a-z0-9_]{3,})":\s*([0-9]+\.[0-9]+)', tail)
    skip = {"value", "trials"}
    return {k: float(v) for k, v in pairs if k not in skip}


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(2)
    old = load_timings(sys.argv[1])
    new = load_timings(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    common = sorted(set(old) & set(new))
    if not common:
        print("no common queries between the two artifacts")
        raise SystemExit(0)
    tot_old = sum(old[n] for n in common)
    tot_new = sum(new[n] for n in common)
    print(
        f"common queries: {len(common)}  old {tot_old:.1f}s  new {tot_new:.1f}s"
        f"  ratio {tot_new / tot_old:.3f}"
    )
    flagged = [
        (new[n] / old[n], n)
        for n in common
        if old[n] > 0 and (new[n] / old[n] > threshold or new[n] / old[n] < 1 / threshold)
    ]
    for ratio, name in sorted(flagged, reverse=True):
        arrow = "slower" if ratio > 1 else "faster"
        print(f"  {name}: {old[name]:.2f}s -> {new[name]:.2f}s  {ratio:.2f}x {arrow}")
    if not flagged:
        print(f"  no per-query moves beyond {threshold}x")


if __name__ == "__main__":
    main()
