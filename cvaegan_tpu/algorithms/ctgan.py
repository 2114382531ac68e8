"""Placeholder — implemented later this round."""
from cvaegan_tpu.algorithms.base import GenerativeTrainer


class CTGAN(GenerativeTrainer):
    name = "ctgan"
    config_key = "ctgan"

    def _build(self, key):
        raise NotImplementedError("CTGAN: implementation in progress")
