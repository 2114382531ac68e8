"""Typed configuration for the framework.

Capability parity with the reference's module-global config
(`src/config/gan_config.py:1-93`, `src/config/classifier_config.py:1-3`,
`src/config/__init__.py:14-23`), redesigned as immutable-by-convention
dataclasses instead of mutable module globals. All default values match
the reference exactly.
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Dict


@dataclasses.dataclass
class GanConfig:
    """Shared GAN-family training hyperparameters (reference
    `src/config/gan_config.py:1-13`)."""

    epochs: int = 500
    batch_size: int = 128
    z_size: int = 128
    g_lr: float = 2e-4
    g_loop_num: int = 3
    d_lr: float = 2e-4
    d_loop_num: int = 5
    c_lr: float = 1e-4
    c_loop_num: int = 5
    # Adam betas used by every GAN-family optimizer (reference
    # `src/cvae_gan.py:75-97`).
    adam_b1: float = 0.5
    adam_b2: float = 0.999
    # Mixed-precision compute policy: "float32" (default, reference
    # parity) or "bfloat16". Under bfloat16 every dense matmul in the
    # model zoo runs with bf16 operands (the TPU MXU's native input
    # format, 2x the fp32 MXU peak) and activations flow bf16 between
    # layers, while PARAMETERS, Adam state, gradients-as-applied, batch
    # norm statistics, and every loss reduction stay float32 (master
    # weights — preserves the reference's convergence envelope; the
    # quality parity study is experiments/bank_scaling.py --dtype
    # bfloat16 + BASELINE.md). The policy is read from the PROCESS-WIDE
    # `settings` instance at TRACE time (mirroring the reference's
    # module-global config semantics). Trainer-held program caches are
    # NAMESPACED by the active policy (ADVICE r4, `BaseTrainer._gen_cache`
    # / `_chunk_runner`), so flipping this mid-process re-traces on the
    # next call instead of silently reusing old-precision executables;
    # the setting is still not thread-safe (one policy per process at a
    # time, like the reference's global config).
    compute_dtype: str = "float32"


@dataclasses.dataclass
class ClassifierConfig:
    """Downstream evaluation classifier (reference
    `src/config/classifier_config.py:1-3`)."""

    epochs: int = 100
    lr: float = 1e-3
    batch_size: int = 64


# Per-model loss-weight dictionaries; values mirror the reference
# (`src/config/gan_config.py:15-93`).
MODEL_CONFIGS: Dict[str, Dict[str, float]] = {
    "cvae_gan": {
        "lambda_recon": 1.0,
        "lambda_kl": 0.1,
        "lambda_adv": 1.0,
        "lambda_class": 0.5,
        "confidence_threshold": 0.5,
    },
    "vae_gan": {
        "lambda_recon": 1.0,
        "lambda_kl": 0.01,
        "lambda_adv": 0.1,
        "confidence_threshold": 0.5,
    },
    "cgan": {
        "lambda_adv": 1.0,
        "lambda_class": 0.5,
        "confidence_threshold": 0.5,
    },
    "gan": {
        "lambda_adv": 1.0,
        "confidence_threshold": 0.5,
    },
    "cvae": {
        "lambda_recon": 1.0,
        "lambda_kl": 0.01,
        "lambda_class": 0.1,
        "confidence_threshold": 0.5,
    },
    "vae": {
        "lambda_recon": 1.0,
        "lambda_kl": 0.01,
        "confidence_threshold": 0.5,
    },
    "sngan": {
        "lambda_adv": 1.0,
        "lambda_class": 0.5,
        "confidence_threshold": 0.5,
    },
    "qg_smote": {
        "num_quantiles": 3,
        "lambda_recon": 1.0,
        "lambda_quantile": 0.5,
        "lambda_adv": 0.1,
        "lambda_class": 0.1,
        "confidence_threshold": 0.5,
    },
    "ctgan": {
        "lambda_adv": 1.0,
        "lambda_class": 0.5,
        "lambda_gp": 10.0,
        "confidence_threshold": 0.5,
    },
    "rain_gan": {
        "lambda_recon": 1.0,
        "lambda_kl": 0.01,
        "lambda_adv": 0.1,
        "lambda_class": 0.1,
        "lambda_attention": 0.01,
        "confidence_threshold": 0.5,
    },
    "tmg_gan": {
        "confidence_threshold": 0.5,
    },
}


@dataclasses.dataclass
class Paths:
    """Output directory layout (reference `src/config/path_config.py:3-12`).

    Unlike the reference, directories are created lazily on first use, not
    as an import side effect.
    """

    root: pathlib.Path = dataclasses.field(
        default_factory=lambda: pathlib.Path(__file__).resolve().parents[2] / "data"
    )

    @property
    def logs(self) -> pathlib.Path:
        return self._ensure(self.root / "logs")

    @property
    def datasets(self) -> pathlib.Path:
        return self._ensure(self.root / "datasets")

    @property
    def gan_outs(self) -> pathlib.Path:
        return self._ensure(self.root / "gan_outs")

    @staticmethod
    def _ensure(p: pathlib.Path) -> pathlib.Path:
        p.mkdir(parents=True, exist_ok=True)
        return p


@dataclasses.dataclass
class Settings:
    """Global knobs (reference `src/config/__init__.py:14-23`). There is no
    `device` knob: JAX picks the backend, and multi-device placement is
    explicit via `cvaegan_tpu.parallel`."""

    seed: int = 0
    gan: GanConfig = dataclasses.field(default_factory=GanConfig)
    classifier: ClassifierConfig = dataclasses.field(default_factory=ClassifierConfig)
    paths: Paths = dataclasses.field(default_factory=Paths)


# Mutable process-wide default, mirroring the reference's config module
# semantics (e.g. `utils.turn_on_test_mode` mutates epochs,
# reference `src/utils.py:86-92`).
settings = Settings()


def turn_on_test_mode() -> None:
    """Drop epoch counts to 1 for fast smoke runs (reference
    `src/utils.py:86-92`)."""
    settings.gan.epochs = 1
    settings.classifier.epochs = 1
