#!/usr/bin/env python3
"""Round-over-round bench differ.

Usage: tools/bench_diff.py OLD_BENCH.json NEW_BENCH.json [TOLERANCE.json]

Compares two Bench output lines (BENCH_r*.json / /tmp/bench.json) under
the committed drift policy (BENCH_TOLERANCE.json by default) and prints
one line per real regression; exits 1 if any survive the gates, 0 on a
clean diff. Gates (see the policy file's _doc): ratio AND absolute-delta
must both trip, and overlapping [min,max] envelopes (when both rounds
recorded "spread") suppress the flag as machine weather.

Driver-side tooling only (python3 + stdlib); not part of the library.
"""
import json
import os
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.read().strip().splitlines()[-1])


def main():
    if len(sys.argv) < 3:
        print(__doc__.strip())
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    tol_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_TOLERANCE.json")
    tol = json.load(open(tol_path))

    flags, improved, skipped = [], [], []
    for q, nv in sorted(new.get("queries", {}).items()):
        ov = old.get("queries", {}).get(q)
        if ov is None:
            skipped.append((q, "new query"))
            continue
        if ov <= 0 or nv <= 0:
            skipped.append((q, "failed run"))
            continue
        if nv <= ov / tol["median_ratio_max"] and ov - nv > tol["min_abs_sec"]:
            improved.append((q, ov, nv))
        if nv <= ov * tol["median_ratio_max"] or nv - ov <= tol["min_abs_sec"]:
            continue
        if tol.get("envelope_overlap"):
            osp = old.get("spread", {}).get(q)
            nsp = new.get("spread", {}).get(q)
            if osp and nsp and nsp[0] <= osp[1] and osp[0] <= nsp[1]:
                skipped.append((q, "envelopes overlap (%.2f-%.2f vs %.2f-%.2f)"
                                % (osp[0], osp[1], nsp[0], nsp[1])))
                continue
        flags.append((q, ov, nv))

    for q, why in skipped:
        print("skip %-24s %s" % (q, why))
    for q, ov, nv in improved:
        print("FAST %-24s %.3fs -> %.3fs (%.2fx)" % (q, ov, nv, nv / ov))
    for q, ov, nv in flags:
        print("SLOW %-24s %.3fs -> %.3fs (%.2fx)" % (q, ov, nv, nv / ov))

    ot, nt = old.get("value", 0), new.get("value", 0)
    if ot > 0 and nt > ot * tol["total_ratio_max"]:
        print("SLOW %-24s %.2fs -> %.2fs (%.2fx)" % ("TOTAL", ot, nt, nt / ot))
        flags.append(("TOTAL", ot, nt))
    print("%d regression(s), %d improvement(s), %d skipped"
          % (len(flags), len(improved), len(skipped)))
    return 1 if flags else 0


if __name__ == "__main__":
    sys.exit(main())
