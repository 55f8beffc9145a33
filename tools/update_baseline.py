#!/usr/bin/env python3
"""Maintain BASELINE_QUERIES.json — the machine-readable per-query MIN
table (seconds at sf0.1, the driver's bench config) that BASELINE.md's
markdown table records for humans.

Usage:
  python3 tools/update_baseline.py --from-md            # seed from BASELINE.md
  python3 tools/update_baseline.py bench1.json ...      # merge bench runs (min)

Each bench*.json argument is a file containing one or more graft.Bench
stdout JSON lines with a "queries" map (capture with:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Bench" \
    | grep '"queries"' > bench1.json).
Merging takes the MIN of the recorded value and every new measurement —
per-query MIN across quiet-window runs is the comparison basis
BASELINE.md documents (single shots swing 1.3-8x with co-tenant noise).
Queries new to the baseline are added; failed runs (negative sentinel)
are ignored. Dev-only helper; the shipped library is pure Scala.
"""
import json, re, sys, os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "BASELINE_QUERIES.json")
MD = os.path.join(ROOT, "BASELINE.md")


def load():
    if os.path.exists(OUT):
        with open(OUT) as f:
            return json.load(f)
    return {}


def save(mins):
    with open(OUT, "w") as f:
        json.dump(dict(sorted(mins.items())), f, indent=1)
        f.write("\n")
    print(f"wrote {OUT}: {len(mins)} queries, total {sum(mins.values()):.2f}s")


def main():
    args = sys.argv[1:]
    mins = load()
    if "--from-md" in args:
        rows = re.findall(r"^\| (q_[a-z_0-9]+) \| ([0-9.]+) \|$",
                          open(MD).read(), re.M)
        for name, sec in rows:
            v = float(sec)
            mins[name] = min(mins.get(name, v), v)
        args = [a for a in args if a != "--from-md"]
    for path in args:
        for line in open(path):
            line = line.strip()
            if not line.startswith("{"):
                continue
            d = json.loads(line)
            for name, sec in d.get("queries", {}).items():
                if sec <= 0:  # failed-run sentinel
                    continue
                mins[name] = min(mins.get(name, sec), sec)
    if not mins:
        sys.exit("nothing to record — pass --from-md or bench json files")
    save(mins)


if __name__ == "__main__":
    main()
