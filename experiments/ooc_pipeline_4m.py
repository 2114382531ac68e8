"""Full OUT-OF-CORE pipeline at Car-Hacking magnitude (4M frames).

Every stage streams in O(window) host memory — the corpus is never
materialized on the host:

  1. one-pass global minmax statistics (`data.streaming.stream_minmax`)
  2. CVAE-GAN `fit_streamed` (1M-row device windows, persistent state,
     one compiled program across windows)
  3. warm-started downstream `Classifier.fit_streamed`
  4. `test_streamed` multiclass + binary over the held-out CSV pair

Measured (1 TPU chip): GAN 239 s (incl. compile) + classifier 59 s +
evaluation 20 s = **323 s end-to-end at macro-F1 1.0 / binary-F1 1.0**
(BASELINE.md). Requires the corpus emitted by `ours_scale_4m.py`
(default /tmp/can_4m).

Usage: python experiments/ooc_pipeline_4m.py [--data /tmp/can_4m]
"""

import argparse
import json
import pathlib
import sys
import time

HERE = pathlib.Path(__file__).parent


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="/tmp/can_4m")
    p.add_argument("--window-rows", type=int, default=1_000_000)
    p.add_argument("--gan-epochs-per-window", type=int, default=125)
    p.add_argument("--clf-epochs-per-window", type=int, default=25)
    p.add_argument("--out", default=str(HERE / "results"
                                        / "ooc_pipeline_4m.json"))
    args = p.parse_args()

    sys.path.insert(0, str(HERE.parent))
    root = pathlib.Path(args.data)
    if not (root / "x_train.csv").exists():
        raise SystemExit(f"corpus missing in {root} — run "
                         "experiments/ours_scale_4m.py first")

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cvaegan_tpu import CVAEGAN, Classifier
    from cvaegan_tpu.data.streaming import stream_minmax

    rec = {"framework": "cvaegan_tpu", "mode": "out-of-core",
           "window_rows": args.window_rows}
    t_all = time.time()

    lo, hi = stream_minmax(root / "x_train.csv")
    scale = hi - lo
    scale[scale == 0] = 1.0
    rec["minmax_seconds"] = round(time.time() - t_all, 1)

    def tf(chunk):
        return (chunk - lo) / scale

    m = CVAEGAN(seed=0, balanced_mode=True)
    m.verbose = False
    t0 = time.time()
    rec["gan_windows"] = m.fit_streamed(
        root / "x_train.csv", root / "y_train.csv",
        window_rows=args.window_rows,
        epochs_per_window=args.gan_epochs_per_window)
    rec["gan_fit_seconds"] = round(time.time() - t0, 1)

    clf = Classifier("ooc4m")
    clf.warm_start_from(m)
    t0 = time.time()
    rec["clf_windows"] = clf.fit_streamed(
        root / "x_train.csv", root / "y_train.csv",
        window_rows=args.window_rows,
        epochs_per_window=args.clf_epochs_per_window, transform=tf)
    rec["clf_fit_seconds"] = round(time.time() - t0, 1)

    t0 = time.time()
    clf.test_streamed(root / "x_test.csv", root / "y_test.csv",
                      transform=tf)
    rec["macro_f1"] = float(clf.metrics["F1"])
    clf.test_streamed(root / "x_test.csv", root / "y_test.csv",
                      transform=tf, binary=True)
    rec["binary_f1"] = float(clf.metrics["F1"])
    rec["test_seconds"] = round(time.time() - t0, 1)
    rec["total_seconds"] = round(time.time() - t_all, 1)

    print(json.dumps(rec), flush=True)
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
