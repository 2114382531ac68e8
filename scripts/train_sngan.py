#!/usr/bin/env python
"""Train SNGAN on a tabular dataset and rebalance minority classes with
generated samples — full pipeline parity with the reference
`scripts/train_sngan.py` (normalize -> fit -> balance-generate -> pickle
-> finetune downstream classifier -> multiclass/binary tests -> ROC).

Unlike the reference (no CLI, in-file dataset constant), this script has
a real flag system: see --help.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from cvaegan_tpu import SNGAN
from cvaegan_tpu.pipelines.balance import apply_cli, make_cli, run_balance_pipeline


def main():
    args = make_cli(__doc__).parse_args()
    dataset = apply_cli(args)
    run_balance_pipeline(
        SNGAN, "SNGAN", dataset,
        out_dir=args.out_dir,
        confidence_threshold=args.confidence_threshold,
        balanced_mode=args.balanced_mode,
        warm_start=not args.no_warm_start,
        generation_mode="qualified",
    )


if __name__ == "__main__":
    main()
