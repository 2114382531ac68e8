"""Placeholder — implemented later this round."""
from cvaegan_tpu.algorithms.base import GenerativeTrainer


class SNGAN(GenerativeTrainer):
    name = "sngan"
    config_key = "sngan"

    def _build(self, key):
        raise NotImplementedError("SNGAN: implementation in progress")
