#!/usr/bin/env python
"""Train VAE on a tabular dataset and rebalance minority classes with
generated samples — full pipeline parity with the reference
`scripts/train_vae.py` (normalize -> fit -> balance-generate -> pickle
-> finetune downstream classifier -> multiclass/binary tests -> ROC).

Unlike the reference (no CLI, in-file dataset constant), this script has
a real flag system: see --help.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from cvaegan_tpu import VAE
from cvaegan_tpu.pipelines.balance import make_cli, run_from_cli


def main():
    args = make_cli(__doc__).parse_args()
    run_from_cli(VAE, "VAE", args, generation_mode="qualified")


if __name__ == "__main__":
    main()
