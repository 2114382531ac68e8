"""Placeholder — implemented later this round."""
from cvaegan_tpu.algorithms.base import GenerativeTrainer


class VAEGAN(GenerativeTrainer):
    name = "vae_gan"
    config_key = "vae_gan"

    def _build(self, key):
        raise NotImplementedError("VAEGAN: implementation in progress")
