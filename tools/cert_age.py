"""Report each registry query's most recent green driver-certification round.

The correctness driver checks only the first ~50 registered queries per
round, so certifications age. This tool reads every CORRECTNESS_r*.json at
the repo root and prints, per query, the latest round with a fully green row
(rows_match AND hash_match), grouped oldest-first — exactly the ordering
policy `queries/__init__._DRIVER_PRIORITY` implements.

Usage: python tools/cert_age.py [repo_root]
"""

from __future__ import annotations

import glob
import json
import os
import sys


def cert_ages(root: str) -> dict[str, int]:
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        stem = os.path.basename(path).split("_r")[1].split(".")[0]
        try:
            rnd = int(stem)
        except ValueError:
            continue
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            if row.get("rows_match") and row.get("hash_match", True):
                last[name] = max(rnd, last.get(name, 0))
    return last


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "."
    last = cert_ages(root)
    by_round: dict[int, list[str]] = {}
    for name, rnd in last.items():
        by_round.setdefault(rnd, []).append(name)
    for rnd in sorted(by_round):
        names = sorted(by_round[rnd])
        print(f"round {rnd} ({len(names)} queries):")
        for n in names:
            print(f"  {n}")
    # Registry names with no row at all (new this round).
    try:
        sys.path.insert(0, root)
        from ecommerce_data_pipeline_spark.queries import QUERIES

        missing = [n for n in QUERIES if n not in last]
        if missing:
            print(f"never certified ({len(missing)}):")
            for n in missing:
                print(f"  {n}")
    except Exception as exc:  # registry import needs no Spark session
        print(f"(registry scan skipped: {exc})")


if __name__ == "__main__":
    main()
