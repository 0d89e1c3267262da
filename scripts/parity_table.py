"""Render the BASELINE.md quality-parity table from a recorded run.

Usage:
    SKRX_PARITY_RECORD=/tmp/parity.jsonl python -m pytest \
        tests/test_quality_parity*.py -q
    python scripts/parity_table.py /tmp/parity.jsonl

Prints a markdown table of per-model skrx-vs-reference-loop ratios (NDCG@10
and Recall@10 at the best-NDCG epoch, pinned seeds) ready to paste into
BASELINE.md.
"""
import json
import sys


def main(path):
    rows = [json.loads(l) for l in open(path)]
    print("| model | skrx NDCG@10 | ref NDCG@10 | ratio | skrx Recall@10 "
          "| ref Recall@10 | ratio |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['model']} | {r['skrx_ndcg']:.4f} | {r['ref_ndcg']:.4f} "
              f"| {r['ndcg_ratio']:.2f} | {r.get('skrx_recall', float('nan')):.4f} "
              f"| {r.get('ref_recall', float('nan')):.4f} "
              f"| {r.get('recall_ratio', float('nan')):.2f} |")
    nd = sorted(r["ndcg_ratio"] for r in rows)
    rc = sorted(r["recall_ratio"] for r in rows if "recall_ratio" in r)
    import statistics
    print(f"\nNDCG ratios: min {nd[0]:.2f} / median {statistics.median(nd):.2f}"
          f" / max {nd[-1]:.2f}; Recall: min {rc[0]:.2f} / median "
          f"{statistics.median(rc):.2f} / max {rc[-1]:.2f} ({len(rows)} models)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity.jsonl")
