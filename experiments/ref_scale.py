"""Measure the torch reference at CAN scale (200k frames) — VERDICT r1
item 4: the round-1 scale validation ran only our framework; this gives
the claim a measured torch baseline on the identical fixture.

Stages timed (mirroring BASELINE.md's scale table):
  1. reference CSV load path (`utils.prepare_datasets('CAN_HCRL_OTIDS')`)
  2. template normalization (concat/minmax/resplit)
  3. `_divide_samples` — the reference's O(n^2) per-class torch.cat
     (timed standalone; fit() repeats it internally)
  4. CVAEGAN.fit (500 epochs; step count is dataset-size independent)
  5. 4000 qualified samples (1000 per each of the 4 non-majority
     classes; best-effort time cap, checked BETWEEN classes — a single
     class's rejection loop can overrun the deadline)
  6. downstream classifier fit (100 epochs x ~2500 batches) + test

Usage:
  python experiments/ref_scale.py --data /tmp/can_big \
      --out /tmp/ref_scale.json [--gen-timeout 1200]
"""

import argparse
import json
import pathlib
import shutil
import sys
import time

REF_SRC = "/root/reference"
REF_RUN = "/tmp/refrun"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="/tmp/can_big")
    p.add_argument("--out", default="/tmp/ref_scale.json")
    p.add_argument("--gen-timeout", type=float, default=1200.0,
                   help="wall-clock cap for the qualified-generation stage")
    args = p.parse_args()

    run = pathlib.Path(REF_RUN)
    if not (run / "src").exists():
        shutil.copytree(REF_SRC, run, dirs_exist_ok=True)
    (run / "context.py").write_text("")
    sys.path.insert(0, str(run))

    # stage the fixture where the reference's named-dataset loader looks
    dst = run / "data" / "datasets" / "CAN_HCRL_OTIDS"
    dst.mkdir(parents=True, exist_ok=True)
    for f in pathlib.Path(args.data).glob("*.csv"):
        shutil.copy(f, dst / f.name)

    import torch

    torch.set_num_threads(1)
    import src
    from src import Classifier, datasets, utils
    from src.cvae_gan import CVAEGAN

    rec = {"framework": "reference-torch-cpu", "fixture": args.data}

    t0 = time.time()
    utils.set_random_state(0)
    utils.prepare_datasets("CAN_HCRL_OTIDS")
    rec["load_seconds"] = round(time.time() - t0, 1)
    rec["train_rows"] = int(len(datasets.tr_samples))
    print("loaded:", rec, flush=True)

    # template normalization (train_cvae_gan.py:19-43)
    from sklearn.preprocessing import minmax_scale

    t0 = time.time()
    lens = (len(datasets.tr_samples), len(datasets.te_samples))
    samples = torch.cat([datasets.tr_samples, datasets.te_samples])
    samples = torch.from_numpy(minmax_scale(samples.numpy())).float()
    samples = samples - samples.min()
    datasets.tr_samples, datasets.te_samples = torch.split(samples, lens)
    utils.set_dataset_values()
    rec["normalize_seconds"] = round(time.time() - t0, 1)

    utils.set_random_state(0)
    model = CVAEGAN()

    # stage 3: the O(n^2) per-class dict build, standalone.
    # IMPORTANT: reset the dict afterwards — the reference's
    # `_divide_samples` APPENDS to `self.samples` (`src/cvae_gan.py:240-245`),
    # so without the reset fit()'s internal call would re-concatenate
    # onto the populated dict (measured at 1M frames: the second pass
    # alone ran >5h and doubled every per-class tensor, tainting the
    # fit timing AND the sampling distribution).
    t0 = time.time()
    model._divide_samples(datasets.TrDataset())
    rec["divide_samples_seconds"] = round(time.time() - t0, 1)
    print("divide_samples:", rec["divide_samples_seconds"], "s", flush=True)
    model.samples = {}

    t0 = time.time()
    model.fit(datasets.TrDataset())
    rec["fit_seconds"] = round(time.time() - t0, 1)
    print("fit:", rec["fit_seconds"], "s", flush=True)

    # stage 5: 4000 qualified samples (1000 per non-majority class),
    # wall-clock capped between classes (the reference's 10-at-a-time
    # rejection loop is not interruptible mid-class) — it may yield
    # ~nothing at threshold 0.5.
    t0 = time.time()
    got = 0
    deadline = t0 + args.gen_timeout
    for c in range(1, min(5, datasets.label_num)):
        if time.time() > deadline:
            rec["gen_capped"] = True
            break
        g = model.generate_qualified_samples(c, 1000)
        got += len(g)
    rec["gen_seconds"] = round(time.time() - t0, 1)
    rec["gen_yield"] = f"{got}/4000"
    print("generation:", rec["gen_seconds"], "s, yield", rec["gen_yield"],
          flush=True)

    utils.set_random_state(0)
    clf = Classifier("ref_scale")
    clf.model = model.classifier
    t0 = time.time()
    clf.fit(datasets.TrDataset())
    rec["clf_fit_seconds"] = round(time.time() - t0, 1)
    t0 = time.time()
    clf.test(datasets.TeDataset())
    rec["test_seconds"] = round(time.time() - t0, 1)
    rec["macro_f1"] = float(clf.metrics["F1"])
    rec["total_seconds"] = round(
        sum(v for k, v in rec.items()
            if isinstance(v, (int, float)) and k.endswith("seconds")), 1)

    pathlib.Path(args.out).write_text(json.dumps(rec, indent=1))
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
