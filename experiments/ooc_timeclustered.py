"""Out-of-core pipeline on a TIME-ORDERED corpus with a rare attack
burst (VERDICT r2 item 6 done-bar).

Real Car-Hacking captures are time-ordered: normal traffic dominates
continuously, attack frames arrive in bursts. A fixed-size window of
such a corpus legitimately holds ZERO rows of a rare class. Round 2's
`fit_streamed` refused those windows; round 3 masks the absent-class
rounds instead (`_guard_class_round`). This harness proves the full
streamed pipeline end-to-end on exactly that layout:

  4M frames, classes 0-3 interleaved throughout, class 4 (2.5%) confined
  to ONE burst inside window 2 of 4 — so 3 of the 4 one-million-row
  windows are missing a class entirely.

Usage (TPU, serialize): python experiments/ooc_timeclustered.py
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

HERE = pathlib.Path(__file__).parent


def emit_time_ordered(root: pathlib.Path, frames: int, seed: int = 0):
    """CAN-format corpus, NOT shuffled: classes 0-3 interleaved, class 4
    in one contiguous burst at ~55% of the stream."""
    rng = np.random.default_rng(seed)
    fractions = [0.75, 0.10, 0.075, 0.05, 0.025]

    def rows(c, n):
        ids = rng.integers(0x100 * (c + 1), 0x100 * (c + 1) + 0x80,
                           n).astype(np.float32)
        data = rng.integers(0, 256, (n, 8)).astype(np.float32)
        data[:, c % 8] = c * 40.0
        return np.concatenate([ids[:, None],
                               np.full((n, 1), 8.0, np.float32), data], 1)

    counts = [int(frames * f) for f in fractions]
    # background stream: classes 0-3 interleaved by repeating pattern
    bg_x = np.concatenate([rows(c, counts[c]) for c in range(4)])
    bg_y = np.concatenate([np.full(counts[c], c, np.int64)
                           for c in range(4)])
    perm = rng.permutation(len(bg_x))       # interleave 0-3 uniformly
    bg_x, bg_y = bg_x[perm], bg_y[perm]
    burst_x, burst_y = rows(4, counts[4]), np.full(counts[4], 4, np.int64)
    at = int(len(bg_x) * 0.55)              # burst lands inside window 2
    x = np.concatenate([bg_x[:at], burst_x, bg_x[at:]])
    y = np.concatenate([bg_y[:at], burst_y, bg_y[at:]])

    root.mkdir(parents=True, exist_ok=True)
    n_test = len(x) // 10
    # held-out = a stratified random sample (evaluation needs all classes)
    te_idx = rng.choice(len(x), n_test, replace=False)
    mask = np.zeros(len(x), bool)
    mask[te_idx] = True
    onehot = np.eye(5, dtype=np.float32)
    np.savetxt(root / "x_train.csv", x[~mask], delimiter=",", fmt="%.6g")
    np.savetxt(root / "y_train.csv", onehot[y[~mask]], delimiter=",",
               fmt="%d")
    np.savetxt(root / "x_test.csv", x[mask], delimiter=",", fmt="%.6g")
    np.savetxt(root / "y_test.csv", onehot[y[mask]], delimiter=",", fmt="%d")
    print(f"wrote {root}: train {(~mask).sum()} time-ordered rows, "
          f"burst class 4 at rows ~{at}-{at + counts[4]}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=4_000_000)
    p.add_argument("--data", default="/tmp/can_4m_tc")
    p.add_argument("--window-rows", type=int, default=1_000_000)
    p.add_argument("--out", default=str(HERE / "results"
                                        / "ooc_timeclustered.json"))
    args = p.parse_args()

    sys.path.insert(0, str(HERE.parent))
    root = pathlib.Path(args.data)
    if not (root / "x_train.csv").exists():
        emit_time_ordered(root, args.frames)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cvaegan_tpu import CVAEGAN
    from cvaegan_tpu.pipelines.balance import run_streamed_pipeline

    t0 = time.time()
    r = run_streamed_pipeline(CVAEGAN, "CVAE_GAN_tc", root,
                              window_rows=args.window_rows,
                              balanced_mode=True)
    rec = {"corpus": "time-ordered, class-4 burst in one window",
           "frames": args.frames,
           "gan_windows": r["gan_windows"],
           "clf_windows": r["clf_windows"],
           "macro_f1": round(r["multiclass_metrics"]["F1"], 4),
           "binary_f1": round(r["binary_metrics"]["F1"], 4),
           "total_seconds": round(time.time() - t0, 1)}
    print(json.dumps(rec), flush=True)
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
