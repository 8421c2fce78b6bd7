"""Round-over-round bench regression diff.

Usage: python tools/bench_delta.py OLD.json NEW.json [threshold]

Reads two bench.py result JSONs ({"queries": {name: sec}, ...}) and prints
a markdown table of per-query deltas, flagging queries slower than
``threshold``x (default 1.5) and listing added/removed queries. Exit code 0
always — the point is visibility, not a gate (single-host timings carry
2-10x noise under external load; compare min-of-2 runs and re-run before
believing any single regression).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old = json.load(open(old_path, encoding="utf-8"))
    new = json.load(open(new_path, encoding="utf-8"))
    qo, qn = old["queries"], new["queries"]

    print(f"| metric | {old_path} | {new_path} |")
    print("|---|---|---|")
    print(f"| total (s) | {old.get('value')} | {new.get('value')} |")
    print(f"| queries | {len(qo)} | {len(qn)} |")
    print()

    shared = sorted(set(qo) & set(qn), key=lambda k: -(qn[k] / max(qo[k], 1e-9)))
    print("| query | old s | new s | ratio |")
    print("|---|---|---|---|")
    for k in shared:
        ratio = qn[k] / max(qo[k], 1e-9)
        flag = " **SLOWER**" if ratio >= threshold else ""
        print(f"| {k} | {qo[k]:.2f} | {qn[k]:.2f} | {ratio:.2f}x{flag} |")
    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))
    if added:
        print(f"\nadded: {', '.join(f'{k} ({qn[k]:.2f}s)' for k in added)}")
    if removed:
        print(f"\nremoved: {', '.join(removed)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
