#!/usr/bin/env python3
"""Compare two clean-bench full artifacts on their common query subset.

Usage: bench_compare.py OLD.json NEW.json [topN]

Prints common-subset totals, the ratio, JVM gc_sec from each artifact,
and the biggest per-query regressions/improvements — the r14 VERDICT #1
drift check, canned.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.loads(f.readline())
    # headline per-query = min(first, rerun) is already applied by Bench
    return d


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    so = sum(qo[q] for q in common)
    sn = sum(qn[q] for q in common)
    print(f"common queries: {len(common)}")
    print(f"  {sys.argv[1]}: {so:.1f} s   (n={len(qo)}, total {old['value']:.1f} s, "
          f"gc {old.get('jvm', {}).get('gc_sec')} s, load start "
          f"{old.get('load', {}).get('start')})")
    print(f"  {sys.argv[2]}: {sn:.1f} s   (n={len(qn)}, total {new['value']:.1f} s, "
          f"gc {new.get('jvm', {}).get('gc_sec')} s, load start "
          f"{new.get('load', {}).get('start')})")
    print(f"  ratio new/old on common subset: {sn / so:.3f}")
    slow = sum(1 for q in common if qn[q] > 1.2 * qo[q] and qn[q] - qo[q] > 0.05)
    fast = sum(1 for q in common if qo[q] > 1.2 * qn[q] and qo[q] - qn[q] > 0.05)
    print(f"  queries >1.2x slower: {slow}, >1.2x faster: {fast}")
    deltas = sorted(common, key=lambda q: qn[q] - qo[q])
    print("biggest regressions:")
    for q in deltas[-top_n:][::-1]:
        if qn[q] - qo[q] <= 0.05:
            break
        print(f"  {q}: {qo[q]:.2f} -> {qn[q]:.2f} (+{qn[q] - qo[q]:.2f})")
    print("biggest improvements:")
    for q in deltas[:top_n]:
        if qo[q] - qn[q] <= 0.05:
            break
        print(f"  {q}: {qo[q]:.2f} -> {qn[q]:.2f} (-{qo[q] - qn[q]:.2f})")
    extra = {"unadjudicated": new.get("unadjudicated"),
             "load_contaminated": new.get("load_contaminated"),
             "errors": new.get("errors")}
    print(f"new artifact verdicts: {extra}")


if __name__ == "__main__":
    main()
