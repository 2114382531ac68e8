"""Aggregate the multi-seed study JSONLs into a markdown table.

Reads the reference-side and ours-side JSONL outputs
(`experiments/ref_multiseed.py`, `experiments/ours_multiseed.py`) and
prints mean±std macro-F1 and qualified-generation yield per model.

The verdict column is a Welch two-sample t-test on the per-seed
macro-F1 of the reference vs our BETTER mode (strict = reference-parity
scheme, balanced = documented beyond-parity mode; the better-of-two
selection is disclosed in the Δ column which names the mode):
  win / LOSS    — significant at p < 0.05
  ahead/behind (ns) — not significant; statistical tie at these n

Usage: python experiments/summarize_study.py \
    [--ref /tmp/ref_multiseed.jsonl] [--ours /tmp/ours_multiseed.jsonl]
"""

import argparse
import json
import pathlib
from collections import defaultdict

import numpy as np


def load(path):
    rows = []
    p = pathlib.Path(path)
    if not p.exists():
        return rows
    for line in p.read_text().splitlines():
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "error" not in r:
            rows.append(r)
    return rows


def agg(rows, key_fn):
    groups = defaultdict(list)
    for r in rows:
        groups[key_fn(r)].append(r)
    out = {}
    for k, rs in groups.items():
        f1 = np.asarray([r["macro_f1"] for r in rs])
        gen = np.asarray([r["generated"] for r in rs])
        out[k] = {
            "n": len(rs),
            "f1_mean": float(f1.mean()), "f1_std": float(f1.std()),
            "gen_mean": float(gen.mean()),
            "seeds": sorted(r["seed"] for r in rs),
        }
    return out


def fmt(stat):
    if stat is None:
        return "—"
    return (f"{stat['f1_mean']:.3f}±{stat['f1_std']:.3f} "
            f"(n={stat['n']}, gen {stat['gen_mean']:.0f})")


def welch(a, b):
    """Welch t-test of mean(a) vs mean(b) from per-group stats; returns
    (diff, p). Uses scipy (a hard dep of sklearn, already required)."""
    from scipy import stats

    res = stats.ttest_ind_from_stats(
        a["f1_mean"], a["f1_std"], a["n"],
        b["f1_mean"], b["f1_std"], b["n"],
        equal_var=False,
    )
    return a["f1_mean"] - b["f1_mean"], float(res.pvalue)


def verdict_for(ours, ref, mode_name):
    diff, p = welch(ours, ref)
    if np.isnan(p):
        # both groups zero-variance (plausible at small n with
        # deterministic ties): the t-stat is 0/0. Equal means = an exact
        # tie; unequal zero-variance means differ with certainty.
        if diff == 0:
            return f"exact tie ({mode_name}, both σ=0)"
        word = "**win**" if diff > 0 else "LOSS"
        return f"{word} ({diff:+.3f} {mode_name}, both σ=0)"
    sig = p < 0.05
    if diff >= 0:
        word = "**win**" if sig else "ahead (ns)"
    else:
        word = "LOSS" if sig else "behind (ns)"
    return f"{word} ({diff:+.3f} {mode_name}, p={p:.2f})"


def main():
    p = argparse.ArgumentParser()
    here = pathlib.Path(__file__).parent
    p.add_argument("--ref", default=str(here / "results"
                                        / "ref_multiseed.jsonl"))
    p.add_argument("--ours", default=str(here / "results"
                                         / "ours_multiseed.jsonl"))
    args = p.parse_args()

    ref = agg(load(args.ref), lambda r: r["model"])
    ours_rows = load(args.ours)
    ours_strict = agg([r for r in ours_rows if r["mode"] == "strict"],
                      lambda r: r["model"])
    ours_bal = agg([r for r in ours_rows if r["mode"] == "balanced"],
                   lambda r: r["model"])
    # documented beyond-parity variants (e.g. sngan fresh_clf) get their
    # own row, keyed "model [mode]"
    extra = agg([r for r in ours_rows
                 if r["mode"] not in ("strict", "balanced")],
                lambda r: f"{r['model']} [{r['mode']}]")

    models = sorted(set(ref) | set(ours_strict) | set(ours_bal))
    print("| Model | Reference (torch CPU) | Ours strict | Ours balanced "
          "| Verdict |")
    print("|---|---|---|---|---|")
    for m in models:
        r, s, b = ref.get(m), ours_strict.get(m), ours_bal.get(m)
        verdict = "—"
        if r and (s or b):
            candidates = [(x, name) for x, name in
                          ((s, "strict"), (b, "balanced")) if x]
            best, mode_name = max(candidates,
                                  key=lambda xn: xn[0]["f1_mean"])
            verdict = verdict_for(best, r, mode_name)
        print(f"| {m} | {fmt(r)} | {fmt(s)} | {fmt(b)} | {verdict} |")
    for k in sorted(extra):
        e = extra[k]
        base = k.split(" ")[0]
        r = ref.get(base)
        verdict = verdict_for(e, r, "variant") if r else "—"
        print(f"| {k} | {fmt(r)} | {fmt(e)} | — | {verdict} |")


if __name__ == "__main__":
    main()
