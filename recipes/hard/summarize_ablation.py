#!/usr/bin/env python
"""Summarize the hard-recipe ablation matrix into a markdown table.

usage: python summarize_ablation.py /tmp/kctpu_hard

Reads every  <work>/<arm>.s<seed>/wer_ci.json  plus the final train
accuracy from metrics.jsonl, and prints per-arm rows (each seed) and a
per-arm mean.  Separability statements compare arm means against the
baseline seed spread + per-run bootstrap CIs.
"""

import glob
import json
import os
import re
import sys


def final_train_acc(exp):
    path = os.path.join(exp, "metrics.jsonl")
    acc = None
    try:
        with open(path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if "acc" in rec:
                    acc = rec["acc"]
    except OSError:
        pass
    return acc


def main(work):
    rows = []
    for path in sorted(glob.glob(os.path.join(work, "*", "wer_ci.json"))):
        exp = os.path.dirname(path)
        m = re.match(r"(.+)\.s(\d+)$", os.path.basename(exp))
        if not m:
            continue
        arm, seed = m.group(1), int(m.group(2))
        with open(path) as f:
            ci = json.load(f)
        rows.append({"arm": arm, "seed": seed, "wer": ci["wer"],
                     "ci": ci["ci95"], "n_utts": ci["n_utts"],
                     "acc": final_train_acc(exp)})
    if not rows:
        print("no results under", work)
        return 1

    with open(os.path.join(work, "data.json")) as f:
        data = json.load(f)

    print("# Hard-recipe ablation results\n")
    print(f"Corpus: vocab {data['vocab']}, {data['train_utts']} train / "
          f"{data['test_utts']} test utts ({data['train_hours']} h / "
          f"{data['test_hours']} h), frame_acc_nearest "
          f"{data['frame_acc_nearest']}, knobs {data['knobs']}\n")
    print("| Arm | Seed | WER % | 95% CI (utterance bootstrap) | "
          "final train acc |")
    print("|---|---|---|---|---|")
    arms = {}
    for r in sorted(rows, key=lambda r: (r["arm"] != "baseline",
                                         r["arm"], r["seed"])):
        acc = f"{r['acc']:.3f}" if r["acc"] is not None else "—"
        print(f"| {r['arm']} | {r['seed']} | {r['wer']:.2f} | "
              f"[{r['ci'][0]:.2f}, {r['ci'][1]:.2f}] | {acc} |")
        arms.setdefault(r["arm"], []).append(r["wer"])

    print("\n| Arm | mean WER % | seed spread (min–max) | n seeds |")
    print("|---|---|---|---|")
    for arm, wers in sorted(arms.items(),
                            key=lambda kv: (kv[0] != "baseline", kv[0])):
        print(f"| {arm} | {sum(wers) / len(wers):.2f} | "
              f"{min(wers):.2f}–{max(wers):.2f} | {len(wers)} |")

    base = arms.get("baseline", [])
    if base and len(base) >= 2:
        bmean = sum(base) / len(base)
        bspread = max(base) - min(base)
        print(f"\nBaseline mean {bmean:.2f}, training-seed spread "
              f"{bspread:.2f} WER. An arm separates from baseline when "
              f"its mean sits outside the baseline seed range "
              f"[{min(base):.2f}, {max(base):.2f}] by more than the "
              f"per-run bootstrap CI half-width.")
        for arm, wers in sorted(arms.items()):
            if arm == "baseline":
                continue
            amean = sum(wers) / len(wers)
            delta = amean - bmean
            outside = amean < min(base) or amean > max(base)
            print(f"- {arm}: {'+' if delta >= 0 else ''}{delta:.2f} WER "
                  f"vs baseline mean "
                  f"({'outside' if outside else 'within'} the baseline "
                  f"seed range)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/kctpu_hard"))
