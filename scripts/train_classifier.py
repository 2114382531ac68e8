#!/usr/bin/env python
"""No-augmentation baseline: train + evaluate the downstream classifier
directly (reference `scripts/train_classifier.py:16-23`)."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from cvaegan_tpu.eval.classifier import Classifier
from cvaegan_tpu.pipelines.balance import apply_cli, make_cli


def main():
    args = make_cli(__doc__).parse_args()
    dataset = apply_cli(args)
    clf = Classifier("baseline", seed=args.seed)
    clf.fit(dataset)
    clf.test(dataset)
    print(clf.confusion_matrix)
    clf.print_metrics(4)
    clf.binary_test(dataset)
    clf.print_metrics(4)


if __name__ == "__main__":
    main()
