"""Tests for the dataset layer and simulator."""

import numpy as np

from tapqir_tpu.utils.dataset import CosmosDataset, OffsetData, load, save
from tapqir_tpu.utils.simulate import simulate

PARAMS = {
    "pi": 0.3,
    "width": 1.4,
    "gain": 7.0,
    "lamda": 0.15,
    "proximity": 0.2,
    "offset": 90.0,
    "height": 3000,
    "background": 150,
}


def test_offset_data_stats():
    off = OffsetData(np.array([80.0, 90.0, 100.0]), np.array([0.25, 0.5, 0.25]))
    assert off.min == 80.0 and off.max == 100.0
    np.testing.assert_allclose(off.mean, 90.0)
    np.testing.assert_allclose(off.var, 50.0)
    np.testing.assert_allclose(np.exp(off.logits).sum(), 1.0)


def test_simulate_cosmos_shapes_and_signal():
    data = simulate("cosmos", N=4, F=10, C=1, P=14, seed=0, params=PARAMS)
    assert data.images.shape == (4, 10, 1, 14, 14)
    assert data.N == 2 and data.Nc == 2 and data.Nt == 4
    assert data.labels["z"].shape == (2, 10, 1)
    # pixel floor must exceed the offset
    assert data.images.min() >= 90.0
    # frames with z=1 should be brighter at the center than frames with z=0
    z = data.labels["z"][..., 0]
    center = data.images[:2, :, 0, 6:8, 6:8].mean(axis=(-2, -1))
    if (z == 1).any() and (z == 0).any():
        assert center[z == 1].mean() > center[z == 0].mean() + 50


def test_simulate_kinetic_markov_labels():
    params = dict(PARAMS)
    del params["pi"]
    params["kon"] = 0.2
    params["koff"] = 0.2
    data = simulate("cosmos+hmm", N=4, F=50, C=1, P=14, seed=1, params=params)
    z = data.labels["z"]
    assert z.shape == (2, 50, 1)
    assert set(np.unique(z)) <= {0, 1}
    # with kon=koff=0.2, both states should appear over 100 AOI-frames
    assert (z == 0).any() and (z == 1).any()


def test_simulate_crosstalk():
    params = dict(PARAMS)
    params["alpha"] = [[0.9, 0.1], [0.15, 0.85]]
    data = simulate("crosstalk", N=2, F=5, C=2, P=14, seed=0, params=params)
    assert data.images.shape == (2, 5, 2, 14, 14)
    assert data.labels["z"].shape == (1, 5, 2)


def test_save_load_roundtrip(tmp_path):
    data = simulate("cosmos", N=2, F=5, C=1, P=14, seed=0, params=PARAMS)
    save(data, tmp_path)
    assert (tmp_path / "data.tpqr").exists()
    loaded = load(tmp_path)
    np.testing.assert_array_equal(loaded.images, data.images)
    np.testing.assert_array_equal(loaded.xy, data.xy)
    np.testing.assert_array_equal(loaded.is_ontarget, data.is_ontarget)
    np.testing.assert_array_equal(loaded.labels["z"], data.labels["z"])
    np.testing.assert_allclose(loaded.offset.mean, data.offset.mean)
    assert loaded.P == 14 and loaded.F == 5


def test_load_reference_torch_pickle(tmp_path):
    # interop with the original Tapqir's torch-pickle data.tpqr
    import torch

    torch.save(
        {
            "images": torch.full((2, 3, 1, 5, 5), 100.0),
            "xy": torch.full((2, 3, 1, 2), 2.0),
            "is_ontarget": torch.tensor([True, False]),
            "mask": None,
            "labels": None,
            "offset_samples": torch.tensor([90.0, 91.0]),
            "offset_weights": torch.tensor([0.5, 0.5]),
            "name": "ref",
            "time1": None,
            "ttb": None,
            "channels": ("channel0",),
        },
        tmp_path / "data.tpqr",
    )
    loaded = load(tmp_path)
    assert isinstance(loaded, CosmosDataset)
    assert loaded.Nt == 2 and loaded.F == 3 and loaded.P == 5
    np.testing.assert_allclose(loaded.offset.mean, 90.5)
    assert loaded.name == "ref"
