"""SeedBank (vmapped seed-parallel training) parity tests: per-seed
losses of one vmapped bank fit must match K serial fits on the same
seeds and datasets (VERDICT r2 item 1)."""

import jax
import numpy as np
import pytest

import cvaegan_tpu
from cvaegan_tpu import SeedBank
from cvaegan_tpu.data.tabular import TabularDataset


SEEDS = [3, 11]


def _fixtures():
    """Two DIFFERENT datasets (the study's per-seed-fixture protocol)."""
    return [TabularDataset.imbalanced_classification(seed=s) for s in (0, 1)]


def _serial_histories(cls, datasets, settings, balanced):
    hists = []
    for s, ds in zip(SEEDS, datasets):
        try:
            t = cls(seed=s, settings=settings, balanced_mode=balanced)
        except TypeError:
            t = cls(seed=s, settings=settings)
        t.verbose = False
        t.fit(ds)
        hists.append({k: np.asarray(v) for k, v in t.loss_history.items()})
    return hists


@pytest.mark.parametrize("model_name,balanced", [
    ("CVAEGAN", True),    # flagship, the study's balanced mode
    ("CVAEGAN", False),   # strict per-class round-robin
    ("TMGGAN", False),    # per-class generator bank (extra vmap level)
    ("QG_SMOTE", True),   # 5-net pinball step
    ("VAEGAN", False),    # unconditional family
])
def test_bank_matches_serial(model_name, balanced, fast_settings):
    fast_settings.gan.epochs = 3
    cls = getattr(cvaegan_tpu, model_name)
    datasets = _fixtures()

    serial = _serial_histories(cls, datasets, fast_settings, balanced)

    bank = SeedBank(cls, seeds=SEEDS, settings=fast_settings,
                    balanced_mode=balanced)
    trainers = bank.fit(datasets)

    assert bank.steps_per_sec > 0
    for t, ref in zip(trainers, serial):
        for k, want in ref.items():
            got = np.asarray(t.loss_history[k])
            assert got.shape == want.shape
            # Epoch 0 must match closely: any protocol/RNG mismatch
            # (wrong seed, wrong key cascade, wrong data row) shows up
            # here at O(1)-relative on the larger loss terms. It is not
            # bitwise — vmap batches the matmuls, reassociating fp32
            # sums, and strict mode compounds 65 optimizer steps inside
            # epoch 0 — hence the small absolute band. Later epochs
            # drift further and get a loose band only.
            np.testing.assert_allclose(
                got[0], want[0], rtol=0.01, atol=3e-3,
                err_msg=f"{model_name} {k} epoch0")
            np.testing.assert_allclose(
                got, want, rtol=0.35, atol=0.02,
                err_msg=f"{model_name} {k} drift band")


def test_bank_shared_dataset_and_api(fast_settings):
    """One dataset shared by every replica; trained replicas expose the
    full per-trainer API (generation + qualified filtering)."""
    fast_settings.gan.epochs = 2
    ds = TabularDataset.imbalanced_classification(seed=0)
    bank = SeedBank(cvaegan_tpu.CVAEGAN, seeds=[0, 1, 2],
                    settings=fast_settings, balanced_mode=True)
    trainers = bank.fit(ds)
    assert len(trainers) == 3
    out = trainers[1].generate_samples(0, 7)
    assert out.shape == (7, ds.tr_samples.shape[1])
    q = trainers[2].generate_qualified_samples(0, 5)
    assert q.shape[1] == ds.tr_samples.shape[1]
    # replicas genuinely differ (different seeds -> different params)
    a = trainers[0].generate_samples(0, 4)
    b = trainers[1].generate_samples(0, 4)
    assert not np.allclose(a, b)


def test_bank_input_validation(fast_settings):
    with pytest.raises(ValueError, match="at least one seed"):
        SeedBank(cvaegan_tpu.CVAEGAN, seeds=[])
    bank = SeedBank(cvaegan_tpu.CVAEGAN, seeds=[0, 1],
                    settings=fast_settings)
    with pytest.raises(ValueError, match="datasets"):
        bank.fit([TabularDataset.imbalanced_classification(seed=0)] * 3)


def test_bank_sharded_over_mesh_matches_unsharded(fast_settings):
    """`SeedBank(mesh=...)` shards the replica axis over the mesh's
    'data' axis (zero collectives — replicas are independent); per-seed
    losses must match the unsharded bank (identical math, different
    layout)."""
    from cvaegan_tpu.parallel import mesh as mesh_lib

    fast_settings.gan.epochs = 2
    ds = TabularDataset.imbalanced_classification(seed=0)

    plain = SeedBank(cvaegan_tpu.CVAEGAN, seeds=[0, 1, 2, 3],
                     settings=fast_settings, balanced_mode=True)
    for t in plain.trainers:
        t.verbose = False
    plain.fit(ds)

    mesh = mesh_lib.make_mesh(4, 1, jax.devices()[:4])
    sharded = SeedBank(cvaegan_tpu.CVAEGAN, seeds=[0, 1, 2, 3],
                       settings=fast_settings, balanced_mode=True,
                       mesh=mesh)
    for t in sharded.trainers:
        t.verbose = False
    sharded.fit(ds)

    for tp, ts in zip(plain.trainers, sharded.trainers):
        for k in tp.loss_history:
            np.testing.assert_allclose(
                np.asarray(ts.loss_history[k]),
                np.asarray(tp.loss_history[k]),
                rtol=0.02, atol=1e-3, err_msg=f"sharded bank {k}")
    # trained replicas remain fully usable after the cross-device unstack
    out = sharded.trainers[3].generate_samples(0, 5)
    assert out.shape == (5, ds.tr_samples.shape[1])


def test_bank_mesh_divisibility_validation(fast_settings):
    from cvaegan_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(4, 1, jax.devices()[:4])
    with pytest.raises(ValueError, match="divide"):
        SeedBank(cvaegan_tpu.CVAEGAN, seeds=[0, 1, 2],
                 settings=fast_settings, mesh=mesh)
