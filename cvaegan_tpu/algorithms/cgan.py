"""Placeholder — implemented later this round."""
from cvaegan_tpu.algorithms.base import GenerativeTrainer


class CGAN(GenerativeTrainer):
    name = "cgan"
    config_key = "cgan"

    def _build(self, key):
        raise NotImplementedError("CGAN: implementation in progress")
