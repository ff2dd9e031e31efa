#!/usr/bin/env python3
"""Min-merge a fresh baseline_full.py sweep into the committed anchors.

Usage: tools/baseline_merge.py COMMITTED.json FRESH.json [SESSION_TAG]

Implements BASELINE_FULL.md's protocol in code instead of ad-hoc inline
snippets: the committed anchor for each oracle query is the per-query MIN
across DuckDB sessions spanning machine states, because DuckDB wall times
on this box swing ~2x with weather and the fastest observed reading is the
CONSERVATIVE denominator for every Spark ratio. Queries present only in
the fresh sweep (new oracle entries this round) are adopted at their fresh
reading (a single-session anchor, to be min-merged at the next sweep);
queries present only in the committed file are kept (renamed/retired
oracles must be removed explicitly, not silently dropped by a merge).

Writes the merged record over COMMITTED.json, appends SESSION_TAG to the
protocol line, and prints one line per anchor the fresh session tightened
plus adoption/retention counts. Driver-side tooling only (python3 stdlib);
not part of the library.
"""
import json
import sys

committed_path, fresh_path = sys.argv[1], sys.argv[2]
tag = sys.argv[3] if len(sys.argv) > 3 else None

committed = json.load(open(committed_path))
fresh = json.load(open(fresh_path))

cq, fq = committed["queries"], fresh["queries"]
# setdefault: .get would detach from `committed` when the key is absent,
# silently dropping adopted row counts and disarming the mismatch guard
cr = committed.setdefault("rows", {})
fr = fresh.get("rows", {})

tightened, adopted, kept = [], [], 0
for name, t in sorted(fq.items()):
    if name not in cq:
        cq[name] = t
        cr[name] = fr.get(name)
        adopted.append(name)
    elif t < cq[name]:
        tightened.append((name, cq[name], t))
        cq[name] = t
    else:
        kept += 1
    # rows must agree between sessions — a row-count change means the
    # oracle SQL or the fixture changed and the anchor needs a RESET,
    # not a merge. Backfill rowless committed entries so the guard
    # arms for them from this sweep on.
    if (name not in cr or cr[name] is None) and name in fr:
        cr[name] = fr[name]
    elif name in cr and cr[name] is not None and name in fr \
            and fr[name] != cr[name]:
        sys.exit(f"ROW MISMATCH for {name}: committed {cr[name]} vs "
                 f"fresh {fr[name]} — reset this anchor explicitly")

committed["value"] = sum(cq.values())
if tag:
    committed["protocol"] = committed.get("protocol", "") + f"; {tag}"

with open(committed_path, "w") as f:
    json.dump(committed, f, indent=1, sort_keys=True)

for name, old, new in tightened:
    print(f"TIGHTENED {name}: {old:.3f} -> {new:.3f}")
for name in adopted:
    print(f"ADOPTED {name}: {fq[name]:.3f} (single-session)")
print(f"merged: {len(tightened)} tightened, {len(adopted)} adopted, "
      f"{kept} held, total {committed['value']:.2f} s over "
      f"{len(cq)} anchors")
