#!/usr/bin/env python3
"""Stream-bench install gate — the bench_diff.py analog for STREAMBENCH
records (r15 verdict item 2: the 20-50% uniform r15 drop was attributed
to machine weather with no control, so a real maintainer regression
could have hidden under the claim).

Usage: tools/streambench_diff.py OLD.json NEW.json [--tolerance 0.30]

Gates, in order:
  exit 3  env mismatch: state_store / batch_size / n_events / sf differ,
          or the NEW record ran with cpus_env_set=false (the
          bench-env-confound rule: an unset SPARK_GRAFT_CPUS silently
          changes parallelism and invalidates the comparison).
  exit 2  code regression: a pipeline whose WEATHER-NORMALIZED ratio
          (new/old divided by the control ratio) falls below
          1 - tolerance. The control pipeline is a pinned tumbling agg
          measured first each run and never changed, so its ratio IS
          the machine-window factor; a pipeline that dropped more than
          the control did is a code effect, not weather.
  exit 0  install OK (prints the normalized table either way).

If the OLD record predates the control row (pre-r16), the MEDIAN
per-pipeline ratio stands in for the control ratio — noisier, stated
in the output. Rates are events/sec, so ratios > 1 are improvements.
Driver-side tooling only (python3 stdlib); not part of the library.
"""
import json
import statistics
import sys


def main():
    args, tol = [], 0.30
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--tolerance"):
            if "=" in a:
                tol = float(a.split("=", 1)[1])
            elif i + 1 < len(argv):
                tol = float(argv[i + 1])
                i += 1
            else:
                print("--tolerance requires a value")
                sys.exit(64)
        elif a.startswith("--"):
            print("unknown flag %s" % a)
            sys.exit(64)
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        print(__doc__)
        sys.exit(64)
    old = json.load(open(args[0]))
    new = json.load(open(args[1]))

    # cpus is in the loop since r16: pipelines respond to parallelism
    # NON-uniformly (stateful ones run ~3x faster at 4 than 32, the
    # StreamBench header measurement), so one control ratio cannot
    # normalize a cpus change — only compared when both records carry
    # the key (pre-r16 records don't stamp it).
    for key in ("state_store", "batch_size", "n_events", "sf", "cpus"):
        if key in old and key in new and old.get(key) != new.get(key):
            print("ENV MISMATCH %s: old=%r new=%r — records not "
                  "comparable" % (key, old.get(key), new.get(key)))
            sys.exit(3)
    if new.get("cpus_env_set") is False:
        print("ENV: new record ran with cpus_env_set=false (SPARK_GRAFT_"
              "CPUS unset) — re-record under the contract config")
        sys.exit(3)

    op, np_ = old["pipelines"], new["pipelines"]
    common = sorted(k for k in op if k in np_ and k != "control")
    if "control" in op and "control" in np_:
        ctrl = np_["control"] / op["control"]
        ctrl_src = "control pipeline"
    else:
        ratios = [np_[k] / op[k] for k in common]
        ctrl = statistics.median(ratios)
        ctrl_src = "MEDIAN of %d common pipelines (old record has no " \
                   "control row — pre-r16)" % len(ratios)
    print("weather factor: %.3f  (%s)" % (ctrl, ctrl_src))

    flags = []
    print("%-16s %9s %9s %7s %7s" %
          ("pipeline", "old", "new", "ratio", "norm"))
    for k in common:
        r = np_[k] / op[k]
        n = r / ctrl
        mark = ""
        if n < 1 - tol:
            mark = "  <-- REGRESSION beyond weather"
            flags.append((k, n))
        print("%-16s %9.0f %9.0f %7.3f %7.3f%s"
              % (k, op[k], np_[k], r, n, mark))
    for k in sorted(np_):
        if k not in op and k != "control":
            print("%-16s %9s %9.0f   (new pipeline)" % (k, "-", np_[k]))

    if flags:
        print("FLAGGED: %s — cross-check isolated in the same window "
              "before installing" %
              ", ".join("%s (norm %.2f)" % f for f in flags))
        sys.exit(2)
    print("OK: no pipeline regressed beyond the weather factor "
          "(tolerance %.0f%%)" % (tol * 100))
    sys.exit(0)


if __name__ == "__main__":
    main()
