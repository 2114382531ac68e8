"""Checkpoint / resume for trainer state — a capability the reference
lacks entirely (no torch.save/state_dict anywhere, SURVEY.md §5); this is
the TPU-native restartable-training subsystem built on Orbax.

A checkpoint stores the full trainer state dict (per-network params,
mutable collections including BN stats and spectral u/v vectors, and
optimizer state) plus JSON metadata (shapes, loss history, RNG counter)
so a restored trainer resumes `fit()` exactly where it stopped.
"""

from __future__ import annotations

import json
import pathlib
import jax


def save_checkpoint(trainer, path) -> pathlib.Path:
    """Save a trainer's state + metadata under `path` (a directory)."""
    import orbax.checkpoint as ocp

    assert trainer.state is not None, "nothing to checkpoint — call fit() first"
    path = pathlib.Path(path).resolve()
    path.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    state_dir = path / "state"
    if state_dir.exists():
        import shutil
        shutil.rmtree(state_dir)
    ckptr.save(state_dir, jax.device_get(trainer.state))
    ckptr.wait_until_finished()
    meta = {
        "name": trainer.name,
        "feature_num": trainer.feature_num,
        "label_num": trainer.label_num,
        "key_counter": trainer._key_counter,
        "loss_history": {k: list(map(float, v))
                         for k, v in trainer.loss_history.items()},
    }
    (path / "meta.json").write_text(json.dumps(meta))
    return path


def restore_checkpoint(trainer, path, dataset) -> None:
    """Restore a trainer saved with `save_checkpoint`.

    `dataset` must be the training dataset (or a shape-compatible one):
    it rebuilds the on-device data tables and module definitions before
    the state arrays are loaded into place.
    """
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).resolve()
    meta = json.loads((path / "meta.json").read_text())
    trainer._prepare(dataset)
    if trainer.feature_num != meta["feature_num"] or (
            trainer.label_num != meta["label_num"]):
        raise ValueError(
            f"checkpoint shape mismatch: saved (features={meta['feature_num']}, "
            f"labels={meta['label_num']}) vs dataset "
            f"(features={trainer.feature_num}, labels={trainer.label_num})"
        )
    ckptr = ocp.StandardCheckpointer()
    trainer.state = ckptr.restore(path / "state", jax.device_get(trainer.state))
    trainer._key_counter = int(meta["key_counter"])
    trainer.loss_history = {k: list(v) for k, v in meta["loss_history"].items()}
    trainer._clear_gen_caches()
