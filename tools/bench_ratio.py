#!/usr/bin/env python3
"""Compare two Bench per-query maps (e.g. sf0.1 vs the 10x fixture):
per-family wall-time sums and ratios, plus the top individual ratios.

Usage: bench_ratio.py bench/r12_sf01.json bench/r12_x10.json [topN]
"""
import json
import re
import sys
from collections import defaultdict

FAMILY_PATTERNS = [
    ("ann", r"^ann_"), ("ivf/pq", r"^(ivf|ivfpq|pq)_"),
    ("emb", r"^emb_"), ("dedup", r"^(dedup_|dup_|simhash|winnow|fuzzy|entity)"),
    ("cow", r"^cow_"), ("stream", r"^stream_"),
    ("events", r"^events_"), ("olap", r"^(olap_|orders_|lineitem_|part_)"),
    ("text", r"^(text_|bpe_|lm_|lang_|corpus_|batch_|pack_|epoch_|curriculum)"),
    ("mm", r"^mm_"), ("sample", r"^(sample_|source_|split_|pref_|rater_|kanon|pii|purge|quality_|contamination|retrieval|heavy|topk)"),
    ("pipeline", r"^(bronze|silver|fact|star|dim_|dq_|dash_|quarantine|catalog|export|scd2|snapshot|schema|cdc_|compact_|io_|mv_|result_|zorder)"),
]


def family(name):
    for fam, pat in FAMILY_PATTERNS:
        if re.match(pat, name):
            return fam
    return "other"


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    fam_a, fam_b = defaultdict(float), defaultdict(float)
    rows = []
    for q in common:
        fam_a[family(q)] += qa[q]
        fam_b[family(q)] += qb[q]
        if qa[q] > 0.3:  # jitter floor for individual ratios
            rows.append((qb[q] / qa[q], q, qa[q], qb[q]))
    print(f"common queries: {len(common)}  "
          f"(only-left: {sorted(set(qa) - set(qb))}, "
          f"only-right: {sorted(set(qb) - set(qa))})")
    print(f"total: {sum(qa[q] for q in common):.1f}s -> "
          f"{sum(qb[q] for q in common):.1f}s  "
          f"ratio {sum(qb[q] for q in common) / sum(qa[q] for q in common):.2f}x")
    print("\nper-family (sum of per-query seconds):")
    for fam in sorted(fam_a, key=lambda f: -fam_b[f]):
        r = fam_b[fam] / fam_a[fam] if fam_a[fam] else float("nan")
        n = sum(1 for q in common if family(q) == fam)
        print(f"  {fam:10s} n={n:3d}  {fam_a[fam]:7.1f}s -> {fam_b[fam]:7.1f}s"
              f"  {r:5.2f}x")
    print(f"\ntop {top_n} individual ratios (left > 0.3s):")
    for r, q, x, y in sorted(rows, reverse=True)[:top_n]:
        print(f"  {q:32s} {x:6.2f}s -> {y:7.2f}s  {r:5.2f}x")
    fa, fb = a.get("failed", []), b.get("failed", [])
    print(f"\nfailed: left={fa} right={fb}")


if __name__ == "__main__":
    main()
