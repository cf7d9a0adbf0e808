#!/usr/bin/env python3
"""Fold a new FULL solo graft.Bench JSON into BENCH_SOLO_REF.json.

The ref is a ROLLING record: per query, the minimum time ever observed in
a clean solo run at the ref's scale factor. graft.Bench compares each
run against it and flags >1.5x exceedances as contaminated, so the ref
must only ever get faster — a slow box session must not poison it.

Usage: python3 tools/update_solo_ref.py <new_bench.json> [ref_path]
New queries are added; existing ones keep min(old, new); queries absent
from the new run are kept. Refuses a run whose sf differs from the ref's.
"""
import json, os, sys

def canon(p):
    # refs record the sbt-cwd-relative sf dir, runs may record the
    # absolute one; a raw string compare would refuse the same directory
    # (the Scala-side parser canonicalizes identically since r7)
    return os.path.realpath(p) if p else p

def main(new_path, ref_path="BENCH_SOLO_REF.json"):
    new = json.load(open(new_path))
    try:
        ref = json.load(open(ref_path))
    except FileNotFoundError:
        ref = None
    if ref and canon(ref.get("sf")) != canon(new.get("sf")):
        sys.exit(f"error: ref sf {ref.get('sf')} != new run sf {new.get('sf')}")
    if not new.get("value") or new.get("failed"):
        sys.exit(f"error: {new_path} is empty or has failures — not a clean solo run")
    qref = dict(ref["queries"]) if ref else {}
    changed = []
    for q, t in new["queries"].items():
        if t < 0:
            continue
        if q not in qref or t < qref[q]:
            changed.append((q, qref.get(q), t))
            qref[q] = t
    out = {"metric": "solo_ref", "value": sum(qref.values()), "unit": "sec",
           "queries": qref, "failed": 0, "sf": new["sf"]}
    # compact separators: graft.Bench's ref parser is whitespace-tolerant
    # since r7, but keep the on-disk form matching Bench's own output
    json.dump(out, open(ref_path, "w"), separators=(",", ":"))
    print(f"{ref_path}: {len(qref)} queries, {len(changed)} improved/added")
    for q, old, t in sorted(changed, key=lambda c: c[2] - (c[1] or c[2])):
        print(f"  {q}: {old if old is not None else '—'} -> {t:.3f}")

if __name__ == "__main__":
    if len(sys.argv) not in (2, 3):
        sys.exit(f"usage: {sys.argv[0]} <new_bench.json> [ref_path]")
    main(*sys.argv[1:])
