"""Placeholder — implemented later this round."""
from cvaegan_tpu.algorithms.base import GenerativeTrainer


class TMGGAN(GenerativeTrainer):
    name = "tmg_gan"
    config_key = "tmg_gan"

    def _build(self, key):
        raise NotImplementedError("TMGGAN: implementation in progress")
