"""Build markdown tables from grid / replication result JSONs (or recover
them from run logs if a sweep was cut off before writing its JSON).

Usage:
  python experiments/summarize_runs.py runs/grid_r2/grid_results.json
  python experiments/summarize_runs.py --from-log /tmp/grid_r2.log --out runs/grid_r2/grid_results.json
"""

from __future__ import annotations

import argparse
import ast
import json
import re
from pathlib import Path

LINE_RE = re.compile(r"^([\w.]+_d\d+_\S+|\w+_c[\d.]+_d\d+) (\{.*\})\s*$")


def recover_from_log(log_path: str) -> dict:
    results = {}
    for line in Path(log_path).read_text().splitlines():
        m = LINE_RE.match(line.strip())
        if m:
            try:
                results[m.group(1)] = ast.literal_eval(m.group(2))
            except (ValueError, SyntaxError):
                pass
    return results


def to_table(results: dict) -> str:
    rows = [(k, v) for k, v in results.items() if v]
    if not rows:
        return "(no results)"
    metrics = sorted({m for _, v in rows for m in v})
    hdr = "| config | " + " | ".join(metrics) + " |"
    sep = "|---" * (len(metrics) + 1) + "|"
    body = [
        "| " + k + " | " + " | ".join(f"{v.get(m, float('nan')):.2f}" for m in metrics) + " |"
        for k, v in sorted(rows, key=lambda kv: kv[1].get(metrics[-1], 0))
    ]
    return "\n".join([hdr, sep] + body)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("json_path", nargs="?")
    ap.add_argument("--from-log")
    ap.add_argument("--out")
    args = ap.parse_args()
    if args.from_log:
        results = recover_from_log(args.from_log)
        if args.out:
            Path(args.out).parent.mkdir(parents=True, exist_ok=True)
            Path(args.out).write_text(json.dumps(results, indent=2))
    else:
        results = json.loads(Path(args.json_path).read_text())
    print(to_table(results))


if __name__ == "__main__":
    main()
