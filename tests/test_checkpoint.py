import os

import jax.numpy as jnp
import numpy as np
import pytest

from prometheus_tpu.checkpoint import (
    assign_into,
    latest_checkpoint,
    list_checkpoints,
    load_torch_state_dict,
    pad_conv_in_channels,
    pad_conv_out_channels,
    restore_checkpoint,
    save_checkpoint,
    split_full_ckpt,
    t_conv,
    t_linear,
)


def test_orbax_roundtrip(tmp_path):
    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
             "step": np.asarray(5)}
    p1 = save_checkpoint(str(tmp_path), state, step=100)
    p2 = save_checkpoint(str(tmp_path), state, step=200)
    assert list_checkpoints(str(tmp_path)) == [100, 200]
    assert latest_checkpoint(str(tmp_path)) == p2
    back = restore_checkpoint(p1, target=state)
    np.testing.assert_array_equal(back["params"]["w"], state["params"]["w"])


def test_checkpoint_pruning(tmp_path):
    state = {"x": np.zeros(2)}
    for s in [1, 2, 3, 4]:
        save_checkpoint(str(tmp_path), state, step=s, keep=2)
    assert list_checkpoints(str(tmp_path)) == [3, 4]


def test_torch_state_dict_and_bundle(tmp_path):
    import torch

    sd = {"a.weight": torch.randn(4, 3), "a.bias": torch.randn(4)}
    path = str(tmp_path / "m.ckpt")
    torch.save({"state_dict": sd, "epoch": 3}, path)
    out = load_torch_state_dict(path)
    assert set(out) == {"a.weight", "a.bias"}
    assert out["a.weight"].shape == (4, 3)

    bundle = {
        "traj": {"w": torch.ones(2)},
        "decoder": {"state_dict": {"d": torch.zeros(3)}},
        "mvldm": {"state_dict": {"m": torch.full((2, 2), 2.0)}},
    }
    bpath = str(tmp_path / "full.ckpt")
    torch.save(bundle, bpath)
    towers = split_full_ckpt(bpath)
    assert set(towers) == {"traj", "decoder", "mvldm"}
    np.testing.assert_array_equal(towers["mvldm"]["m"], np.full((2, 2), 2.0))


def test_weight_transforms():
    w = np.arange(2 * 3 * 5 * 7).reshape(2, 3, 5, 7).astype(np.float32)
    wc = t_conv(w)
    assert wc.shape == (5, 7, 3, 2)
    wl = t_linear(np.ones((4, 6)))
    assert wl.shape == (6, 4)


def test_assign_into():
    params = {"a": {"b": {"kernel": np.zeros((2, 2), np.float32)}}}
    ok = assign_into(params, "a/b/kernel", np.ones((2, 2), np.float32))
    assert ok and params["a"]["b"]["kernel"].sum() == 4
    assert not assign_into(params, "a/missing/kernel", np.ones((2, 2)))
    with pytest.raises(ValueError):
        assign_into(params, "a/b/kernel", np.ones((3, 3), np.float32))


def test_conv_padding_surgery():
    rng = np.random.default_rng(0)
    k = rng.normal(size=(3, 3, 4, 320)).astype(np.float32)
    out = pad_conv_in_channels(k, 15, rng, copy_rgb_to_depth=True)
    assert out.shape == (3, 3, 15, 320)
    np.testing.assert_array_equal(out[:, :, :4], k)
    np.testing.assert_array_equal(out[:, :, 4:8], k[:, :, 0:4])
    assert np.abs(out[:, :, 8:]).std() < 0.05  # 0.01-std random init

    ko = rng.normal(size=(3, 3, 320, 4)).astype(np.float32)
    bo = rng.normal(size=(4,)).astype(np.float32)
    k2, b2 = pad_conv_out_channels(ko, bo, 15, rng, copy_rgb_to_depth=True)
    assert k2.shape == (3, 3, 320, 15) and b2.shape == (15,)
    np.testing.assert_array_equal(k2[..., 4:8], ko[..., 0:4])
    # reference zero-pads the bias for ALL new rows (mv_ldm.py:118
    # F.pad(bias, (0, extra))) — depth rows get copied weights, zero bias
    np.testing.assert_array_equal(b2[4:], np.zeros(11, np.float32))
