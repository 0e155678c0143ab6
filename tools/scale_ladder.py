#!/usr/bin/env python3
"""Scale-ladder comparison: two graft.Bench JSON lines (e.g. sf0.1 vs
sf1, a 10x data-scale step) -> per-query ratio table + super-linear
flags.

Usage: scale_ladder.py <small_bench.log_or_json> <big_bench.log_or_json>
       [--factor 10] [--flag-ratio 15] [--min-sec 0.2]

Queries faster than --min-sec at the SMALL scale are reported but not
flagged: sub-200ms timings are dominated by fixed per-query overhead
(job scheduling, codegen cache lookups), so their ratios are noise.
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            # sbt prefixes stdout with "[info] "
            if line.startswith("[info] "):
                line = line[len("[info] "):]
            if line.startswith("{") and '"metric"' in line:
                return json.loads(line)
    raise SystemExit(f"no bench JSON line found in {path}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a.lstrip("-").split("=", 1) if "=" in a else (a.lstrip("-"), True)
                for a in sys.argv[1:] if a.startswith("--"))
    factor = float(opts.get("factor", 10))
    flag_ratio = float(opts.get("flag-ratio", 1.5 * factor))
    min_sec = float(opts.get("min-sec", 0.2))
    small, big = load(args[0]), load(args[1])
    sq, bq = small["queries"], big["queries"]
    rows = []
    for name in sorted(sq):
        if name not in bq:
            continue
        s, b = sq[name], bq[name]
        if s < 0 or b < 0:
            rows.append((name, s, b, None, "ERR"))
            continue
        ratio = b / s if s > 0 else float("inf")
        flag = ""
        if s >= min_sec and ratio > flag_ratio:
            flag = "SUPER-LINEAR"
        elif s < min_sec:
            flag = "(small-base)" if ratio > flag_ratio else ""
        rows.append((name, s, b, ratio, flag))
    w = max(len(r[0]) for r in rows)
    print(f"{'query':<{w}}  {'small':>8}  {'big':>8}  {'ratio':>7}  flag")
    for name, s, b, ratio, flag in rows:
        r = f"{ratio:7.1f}" if ratio is not None else "    n/a"
        print(f"{name:<{w}}  {s:8.2f}  {b:8.2f}  {r}  {flag}")
    flagged = [r for r in rows if r[4] == "SUPER-LINEAR"]
    errs = [r for r in rows if r[4] == "ERR"]
    print(f"\ntotal: small={small['value']:.1f}s big={big['value']:.1f}s "
          f"ratio={big['value']/small['value']:.1f}x (data factor {factor:g}x)")
    print(f"flagged super-linear (> {flag_ratio:g}x, base >= {min_sec}s): "
          f"{len(flagged)}")
    for r in flagged:
        print(f"  {r[0]}: {r[1]:.2f}s -> {r[2]:.2f}s ({r[3]:.1f}x)")
    if errs:
        print(f"errors at either scale: {[r[0] for r in errs]}")
    sys.exit(1 if flagged or errs else 0)


if __name__ == "__main__":
    main()
