"""Placeholder — implemented later this round."""
from cvaegan_tpu.algorithms.base import GenerativeTrainer


class RAIN_GAN(GenerativeTrainer):
    name = "rain_gan"
    config_key = "rain_gan"

    def _build(self, key):
        raise NotImplementedError("RAIN_GAN: implementation in progress")
