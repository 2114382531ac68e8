"""Placeholder — implemented later this round."""
from cvaegan_tpu.algorithms.base import GenerativeTrainer


class GAN(GenerativeTrainer):
    name = "gan"
    config_key = "gan"

    def _build(self, key):
        raise NotImplementedError("GAN: implementation in progress")
