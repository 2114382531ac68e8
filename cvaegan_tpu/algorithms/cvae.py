"""Placeholder — implemented later this round."""
from cvaegan_tpu.algorithms.base import GenerativeTrainer


class CVAE(GenerativeTrainer):
    name = "cvae"
    config_key = "cvae"

    def _build(self, key):
        raise NotImplementedError("CVAE: implementation in progress")
