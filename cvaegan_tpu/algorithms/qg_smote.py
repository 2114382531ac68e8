"""Placeholder — implemented later this round."""
from cvaegan_tpu.algorithms.base import GenerativeTrainer


class QG_SMOTE(GenerativeTrainer):
    name = "qg_smote"
    config_key = "qg_smote"

    def _build(self, key):
        raise NotImplementedError("QG_SMOTE: implementation in progress")
