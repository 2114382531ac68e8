"""Schema-faithful Car-Hacking stand-in (`scripts/prepare_can_dataset.py`).

Pins the data-card claims: published per-class proportions reproduced
exactly, the published schema (can_id, dlc, d0..d7), the published
injection signatures (DoS floods ID 0x000 with zero payload; spoofs use
the published fixed IDs), and time-clustered bursts inside otherwise
normal traffic.
"""

import importlib.util
import pathlib

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pcd():
    path = (pathlib.Path(__file__).resolve().parents[1]
            / "scripts" / "prepare_can_dataset.py")
    spec = importlib.util.spec_from_file_location("pcd", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def stream(pcd):
    return pcd.synthetic_car_hacking(60_000, seed=0)


def test_published_proportions_exact(pcd, stream):
    x, y, meta = stream
    props = pcd.car_hacking_proportions()
    assert len(x) == len(y) == 60_000
    for i, cls in enumerate(pcd.CAR_HACKING_CLASSES):
        achieved = (y == i).mean()
        assert abs(achieved - props[cls]) < 5e-4, (cls, achieved, props[cls])


def test_schema_and_value_ranges(stream):
    x, y, meta = stream
    assert x.shape[1] == 10 and meta["schema"][:2] == ["can_id", "dlc"]
    ids, dlc, data = x[:, 0], x[:, 1], x[:, 2:]
    assert ids.min() >= 0 and ids.max() <= 0x7FF  # 11-bit CAN IDs
    assert set(np.unique(dlc)) <= set(range(9))
    assert data.min() >= 0 and data.max() <= 255


def test_injection_signatures(stream):
    x, y, meta = stream
    classes = meta["classes"]
    dos = x[y == classes.index("dos")]
    assert (dos[:, 0] == 0).all() and (dos[:, 2:] == 0).all()  # ID 0x000, 00 payload
    gear = x[y == classes.index("gear")]
    rpm = x[y == classes.index("rpm")]
    assert (gear[:, 0] == 0x43F).all()
    assert (rpm[:, 0] == 0x316).all()
    fuzzy = x[y == classes.index("fuzzy")]
    assert len(np.unique(fuzzy[:, 0])) > 100  # random IDs


def test_time_clustered_bursts(stream):
    """Attack frames must be concentrated in bursts, not spread uniformly:
    the fraction of attack frames whose neighbour (±50 frames) is also an
    attack frame is high for clustered traffic, ~p_attack for uniform."""
    x, y, meta = stream
    attack = y > 0
    # windowed attack density at each attack frame
    kernel = np.ones(101)
    density = np.convolve(attack.astype(float), kernel, "same") / 101.0
    mean_local_density = density[attack].mean()
    assert mean_local_density > 0.3, mean_local_density  # uniform would be ~0.13
    assert meta["n_bursts"] >= 4


def test_normal_traffic_is_periodic_id_pool(stream):
    x, y, meta = stream
    normal_ids = np.unique(x[y == 0][:, 0])
    assert len(normal_ids) == 26  # the real normal capture's ~26 IDs


def test_cli_writes_split_and_data_card(pcd, tmp_path, monkeypatch, capsys):
    import sys

    monkeypatch.setattr(sys, "argv", [
        "prepare_can_dataset.py", "--synthetic", "--frames", "20000",
        "--out", str(tmp_path), "--no-stream-csv"])
    pcd.main()
    for f in ("x_train.csv", "y_train.csv", "x_test.csv", "y_test.csv",
              "DATA_CARD.md", "data_card.json"):
        assert (tmp_path / f).exists(), f
    card = (tmp_path / "DATA_CARD.md").read_text()
    assert "published" in card and "| normal |" in card
    xtr = np.loadtxt(tmp_path / "x_train.csv", delimiter=",")
    assert xtr.shape[1] == 10
