"""Collect round-3 trial scores from results/round3_queue/queue.log into a
markdown table (stdout) + results/trial_table.jsonl appends.

Usage: python scripts/round3_trial_digest.py
"""
import json
import os
import re
import sys

Q = "results/round3_queue/queue.log"
BAR = (14.2, 12.1)  # VERDICT item-1 Done bar (CRMSD, IRMSD medians)


def main():
    rows = []
    with open(Q) as f:
        for line in f:
            m = re.search(r"\[(r3q\d*)\] [\d:]+ (\S+) score (\{.*\})", line)
            if not m:
                continue
            stage, name, blob = m.groups()
            d = json.loads(blob)
            rows.append((stage, name, d))
    print("| trial | stage | CRMSD med/mean | IRMSD med/mean | both bars |")
    print("|---|---|---|---|---|")
    hits = []
    for stage, name, d in rows:
        ok = (d["crmsd_median"] <= BAR[0] and d["irmsd_median"] <= BAR[1])
        if ok:
            hits.append(name)
        print(f"| {name} | {stage} | {d['crmsd_median']:.2f} / "
              f"{d['crmsd_mean']:.2f} | {d['irmsd_median']:.2f} / "
              f"{d['irmsd_mean']:.2f} | {'YES' if ok else 'no'} |")
    print(f"\n# {len(rows)} trials; bar (<= {BAR[0]} CRMSD AND <= {BAR[1]} "
          f"IRMSD): {hits or 'none yet'}")
    out = "results/trial_table.jsonl"
    seen = set()
    if os.path.exists(out):
        with open(out) as f:
            seen = {json.loads(l).get("name") for l in f if l.strip()}
    with open(out, "a") as f:
        for stage, name, d in rows:
            if name in seen:
                continue
            f.write(json.dumps(dict(name=name, stage=stage, round=3, **d))
                    + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
