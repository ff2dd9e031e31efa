#!/usr/bin/env python3
"""Round-over-round bench differ.

Usage: tools/bench_diff.py [--allow-env-change] OLD.json NEW.json [TOL.json]

Compares two Bench output lines (BENCH_r*.json / /tmp/bench.json) under
the committed drift policy (BENCH_TOLERANCE.json by default) and prints
one line per real regression; exits 1 if any survive the gates, 0 on a
clean diff. Gates (see the policy file's _doc): ratio AND absolute-delta
must both trip, and overlapping [min,max] envelopes (when both rounds
recorded "spread") suppress the flag as machine weather.

ENV GATE (round 12, after the r11 local[4] incident): before any timing
comparison, the two records' "env" blocks must agree on master and
cache_tables, max_heap_mb within 25%, and the NEW record must not carry
cpus_env_set=false (a bare-shell run). A mismatch hard-fails (exit 3)
unless --allow-env-change is passed — per-query ratios across a
parallelism/heap change are confounded, not measured.

Driver-side tooling only (python3 + stdlib); not part of the library.
"""
import json
import os
import sys


def env_gate(old, new, allow):
    """Exit-3 unless the two records were measured under the same config."""
    oe, ne = old.get("env"), new.get("env")
    problems = []
    if not ne:
        problems.append("NEW record has no env block (pre-r07 format?)")
    if oe and ne:
        for k in ("master", "cache_tables"):
            if oe.get(k) != ne.get(k):
                problems.append("env.%s differs: %r -> %r"
                                % (k, oe.get(k), ne.get(k)))
        oh, nh = oe.get("max_heap_mb"), ne.get("max_heap_mb")
        if oh and nh and not (0.75 <= nh / oh <= 1.33):
            problems.append("env.max_heap_mb differs: %s -> %s" % (oh, nh))
    if ne and ne.get("cpus_env_set") is False:
        problems.append("NEW record ran with SPARK_GRAFT_CPUS unset "
                        "(cpus_env_set=false) - provenance-unclean")
    for p in problems:
        print("ENV  %s" % p)
    if problems and not allow:
        print("env gate FAILED (pass --allow-env-change to override): "
              "timings across a config change are confounded, not compared")
        sys.exit(3)


def load(path):
    with open(path) as f:
        return json.loads(f.read().strip().splitlines()[-1])


def main():
    argv = [a for a in sys.argv[1:] if a != "--allow-env-change"]
    allow_env = "--allow-env-change" in sys.argv[1:]
    if len(argv) < 2:
        print(__doc__.strip())
        return 2
    sys.argv = [sys.argv[0]] + argv
    old, new = load(sys.argv[1]), load(sys.argv[2])
    env_gate(old, new, allow_env)
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

    # total over the OVERLAPPING queries only: comparing full totals when
    # the surface grew flags the new queries' time as a "regression"
    common = [q for q, v in new.get("queries", {}).items()
              if v > 0 and old.get("queries", {}).get(q, 0) > 0]
    ot = sum(old["queries"][q] for q in common)
    nt = sum(new["queries"][q] for q in common)
    if ot > 0 and nt > ot * tol["total_ratio_max"]:
        print("SLOW %-24s %.2fs -> %.2fs (%.2fx, %d common queries)"
              % ("TOTAL", ot, nt, nt / ot, len(common)))
        flags.append(("TOTAL", ot, nt))
    elif ot > 0:
        print("total over %d common queries: %.2fs -> %.2fs (%.2fx)"
              % (len(common), ot, nt, nt / ot))
    print("%d regression(s), %d improvement(s), %d skipped"
          % (len(flags), len(improved), len(skipped)))
    return 1 if flags else 0


if __name__ == "__main__":
    sys.exit(main())
