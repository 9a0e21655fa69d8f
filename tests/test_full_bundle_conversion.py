"""Full ``full.ckpt`` bundle conversion rehearsal (VERDICT round-2 item #4).

Fabricates a small-width torch bundle in the reference's
``tools/create_finalckpt.py:42-47`` layout from the REAL reference modules
(unet_hacked / vae_hacked / ray_diff+gs_decoder wrappers / traj_dit /
transformers CLIPTextModel), runs it through ``split_full_ckpt`` +
``convert_bundle`` (the exact path ``tools/convert_ckpt.py`` and
``inference.py --ckpt full.ckpt`` use), round-trips the result through
Orbax, and asserts the converted towers' forwards match torch — proof the
published checkpoint could be consumed end to end.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_loader import load_ref  # noqa: E402
from test_reference_parity import (DDCONFIG, DISABLE_3D, randomize_,  # noqa: E402
                                   scaled_err, to_np_sd)

# flax pipe dims (shared by the torch towers)
MC, CTX, HEAD_CH, N_RES = 64, 64, 32, 2
CLIP_LAYERS, CLIP_WIDTH = 2, 64
VAE_CH, VAE_MULT = 32, (1, 2)
IMG = 32                       # -> latent 16
DIT_HID, DIT_DEPTH, DIT_HEADS, MAX_IMGS = 64, 2, 4, 4
GS_EXTRA = 24                  # lat_total*2 - 4 (use_cross_view_dit)
GS_OUT = 14
EMA_VALUE = 0.25               # non-default so conversion must carry it


def _build_torch_mvldm_sd():
    U = load_ref("prometheus.modules.unet_hacked")
    U.XFORMERS_IS_AVAILBLE = False
    unet = U.MultiViewUNetModel(
        image_size=IMG // 2, in_channels=15, out_channels=15,
        model_channels=MC, num_res_blocks=N_RES, num_head_channels=HEAD_CH,
        context_dim=CTX, attention_resolutions=[1, 2], channel_mult=[1, 2],
        use_spatial_transformer=True, use_linear_in_transformer=True,
        transformer_depth=1, legacy=False, use_checkpoint=False,
        disable_3d_attentions=list(DISABLE_3D))
    randomize_(unet.eval(), seed=21, scale=0.1)

    V = load_ref("prometheus.modules.vae_hacked")
    V.XFORMERS_IS_AVAILBLE = False
    vae = V.AutoencoderKL(ddconfig=dict(DDCONFIG), embed_dim=4)
    randomize_(vae.eval(), seed=22, scale=0.12)

    clip_cfg = transformers.CLIPTextConfig(
        vocab_size=49408, hidden_size=CLIP_WIDTH, intermediate_size=256,
        num_hidden_layers=CLIP_LAYERS, num_attention_heads=1,
        max_position_embeddings=77, hidden_act="gelu")
    clip = transformers.CLIPTextModel(clip_cfg).eval()
    randomize_(clip, seed=23, scale=0.08)

    sd = {}
    for prefix, mod in (("model.unet.", unet), ("model.vae.", vae),
                        ("model.text_encoder.", clip)):
        for k, v in mod.state_dict().items():
            sd[prefix + k] = v.detach().clone()
    return sd, unet, vae, clip


def _build_torch_decoder_sd():
    """GS decoder tower: gaussian-headed VAE (conv surgery + EMANorm
    Sequential wrapping, gs_decoder.py:66-73,120-124) + cross-view DiT with
    the conv_in/conv_out wrappers (gs_decoder.py:38-45)."""
    import torch.nn as nn
    import torch.nn.functional as F

    V = load_ref("prometheus.modules.vae_hacked")
    V.XFORMERS_IS_AVAILBLE = False
    GSD = load_ref("prometheus.models.gs_decoder")
    RD = load_ref("prometheus.modules.ray_diff")

    vae = V.AutoencoderKL(ddconfig=dict(DDCONFIG), embed_dim=4)
    randomize_(vae.eval(), seed=31, scale=0.12)
    with torch.no_grad():
        vae.decoder.conv_in.weight = nn.Parameter(
            F.pad(vae.decoder.conv_in.weight, (0, 0, 0, 0, 0, GS_EXTRA)))
        vae.decoder.conv_out.weight = nn.Parameter(
            F.pad(vae.decoder.conv_out.weight,
                  (0, 0, 0, 0, 0, 0, 0, GS_OUT - 3)))
        vae.decoder.conv_out.bias = nn.Parameter(
            F.pad(vae.decoder.conv_out.bias, (0, GS_OUT - 3)))
    # EMANorm wrapping on every non-top upsample conv (level != 0)
    for lvl in range(1, len(VAE_MULT)):
        ema = GSD.EMANorm(beta=0.995)
        ema.magnitude_ema.fill_(EMA_VALUE)
        vae.decoder.up[lvl].upsample.conv = nn.Sequential(
            vae.decoder.up[lvl].upsample.conv, ema)
    # the freshly-created EMANorms default to train mode, in which the
    # reference forward MUTATES magnitude_ema even under no_grad
    vae.eval()

    dit = RD.DiT(in_channels=392, out_channels=392, width=IMG // 4,
                 hidden_size=DIT_HID, depth=DIT_DEPTH, num_heads=DIT_HEADS,
                 max_num_images=MAX_IMGS, P=1)
    dit.conv_in = GSD.Downsample(GS_OUT, 392, with_conv=True)
    dit.conv_out = GSD.Upsample(392, GS_OUT, with_conv=True)
    randomize_(dit.eval(), seed=32, scale=0.05)

    sd = {}
    for prefix, mod in (("model.vae.", vae),
                        ("model.cross_view_dit.", dit)):
        for k, v in mod.state_dict().items():
            sd[prefix + k] = v.detach().clone()
    # realistic extra baggage the published decoder ckpt carries: the frozen
    # 2D decoder copy (gs_decoder.py:118) — must be SKIPPED, not fatal
    for k, v in vae.decoder.state_dict().items():
        sd["model.decoder_2d." + k] = v.detach().clone()
    return sd, vae, dit


def _build_torch_traj_sd():
    TS = load_ref("prometheus.systems.traj_dit_system")
    import torch.nn as nn

    class Opt:
        class network:
            class cdm:
                hidden_size = DIT_HID
                num_blocks = 2
                num_tokens = 29
                block_args = {"num_heads": 4}
        tokenizer = None
        text_encoder = nn.Identity()

    ref = TS.TrajDiTModel(Opt())
    del ref.text_encoder
    # reference hardcodes y_embedder Linear(1024, hidden); the small-width
    # flax tower uses text_dim=CTX — swap in a matching layer
    ref.y_embedder = nn.Linear(CTX, DIT_HID)
    randomize_(ref.eval(), seed=41, scale=0.12)
    return to_np_sd(ref), ref


def _build_flax_pipe():
    from prometheus_tpu.models import (GSDecoderModel, MVLDMModel,
                                       TrajDiTModel)
    from prometheus_tpu.ops.schedulers import make_schedule
    from prometheus_tpu.pipeline import PrometheusPipeline
    from prometheus_tpu.systems import MVLDMSystem, TrajDiTSystem

    key = jax.random.PRNGKey(0)
    B, N = 1, 2
    hw = IMG // 2
    mv_model = MVLDMModel(
        model_channels=MC, num_head_channels=HEAD_CH, context_dim=CTX,
        channel_mult=(1, 2), num_res_blocks=N_RES,
        disable_3d_attentions=DISABLE_3D, use_checkpoint=False,
        clip_layers=CLIP_LAYERS, clip_width=CLIP_WIDTH, vae_ch=VAE_CH,
        vae_ch_mult=VAE_MULT, image_size=IMG)
    from prometheus_tpu.utils import get_random_cameras

    cams = get_random_cameras(key, N, size=IMG)[None]
    mv_params = mv_model.init(
        key, jnp.zeros((B, N, 3, IMG, IMG)), jnp.zeros((B, 77), jnp.int32),
        jnp.zeros((B, N, 9, hw, hw)), jnp.zeros((B, 77, CTX)),
        jnp.zeros((B, N)), cams, method=MVLDMModel.init_everything)

    gs_model = GSDecoderModel(dit_hidden_size=DIT_HID, dit_depth=DIT_DEPTH,
                              dit_num_heads=DIT_HEADS, vae_ch=VAE_CH,
                              vae_ch_mult=VAE_MULT, max_num_images=MAX_IMGS)
    gs_vars = gs_model.init(key, jnp.zeros((B, 1, 3, IMG, IMG)),
                            jnp.zeros((B, N, 14, hw, hw)),
                            method=GSDecoderModel.init_everything)
    traj_model = TrajDiTModel(hidden_size=DIT_HID, num_blocks=2, num_heads=4,
                              text_dim=CTX)
    traj_params = traj_model.init(key, jnp.zeros((1, 29, 11)),
                                  jnp.zeros((1, 77, CTX)), jnp.zeros((1,)))
    return PrometheusPipeline(
        mvldm=MVLDMSystem(model=mv_model,
                          schedule=make_schedule("vprediction"),
                          num_pred_views=N),
        mvldm_params=mv_params,
        traj=TrajDiTSystem(model=traj_model), traj_params=traj_params,
        gsdecoder=gs_model, gsdecoder_vars=gs_vars,
    )


@pytest.mark.slow
def test_full_bundle_conversion_rehearsal(tmp_path):
    from prometheus_tpu.checkpoint import (convert_bundle, restore_checkpoint,
                                           save_checkpoint, split_full_ckpt)

    mv_sd, unet, _vae, clip = _build_torch_mvldm_sd()
    dec_sd, gs_vae, _dit = _build_torch_decoder_sd()
    traj_sd, _traj = _build_torch_traj_sd()

    # --- the create_finalckpt.py bundle layout (:42-47): traj is a bare
    # state dict, decoder/mvldm are Lightning-style {'state_dict': ...}
    bundle_path = str(tmp_path / "full.ckpt")
    torch.save({
        "traj": {k: torch.as_tensor(v) for k, v in traj_sd.items()},
        "decoder": {"state_dict": dec_sd},
        "mvldm": {"state_dict": mv_sd},
    }, bundle_path)

    pipe = _build_flax_pipe()
    towers = split_full_ckpt(bundle_path)
    report = convert_bundle(towers, pipe)

    # loud-report checks: everything mapped except the documented skips
    assert report["traj"]["unmapped"] == []
    for tower in ("mvldm", "decoder"):
        assert report[tower]["missing"] == [], (tower, report[tower])
        assert report[tower]["unassigned"] == [], (tower, report[tower])
    assert report["mvldm"]["skipped"] == []
    assert all(k.startswith("model.decoder_2d.")
               for k in report["decoder"]["skipped"]), \
        report["decoder"]["skipped"]
    assert report["mvldm"]["mapped"] > 200
    assert report["decoder"]["mapped"] > 80

    # --- orbax round trip (what tools/convert_ckpt.py writes and
    # inference.py --ckpt <dir> restores)
    state = {
        "mvldm": jax.tree.map(np.asarray, pipe.mvldm_params),
        "traj": jax.tree.map(np.asarray, pipe.traj_params),
        "gsdecoder": jax.tree.map(np.asarray, pipe.gsdecoder_vars),
    }
    out_dir = str(tmp_path / "orbax")
    save_checkpoint(out_dir, state, step=0)
    restored = restore_checkpoint(f"{out_dir}/step_000000000", target=state)
    pipe.mvldm_params = restored["mvldm"]
    pipe.traj_params = restored["traj"]
    pipe.gsdecoder_vars = restored["gsdecoder"]

    # --- one denoise step through the converted U-Net matches torch
    B, F, L, hw = 1, 2, 7, IMG // 2
    rng = np.random.default_rng(7)
    x = rng.normal(size=(B * F, 15, hw, hw)).astype(np.float32)
    t = np.full((B * F,), 3.7, np.float32)
    ctx = (rng.normal(size=(B * F, L, CTX)) * 0.3).astype(np.float32)
    with torch.no_grad():
        out_ref = unet(torch.from_numpy(x), torch.from_numpy(t),
                       torch.from_numpy(ctx), num_frames=F).numpy()
    from prometheus_tpu.models.unet_mv import MultiViewUNet

    flax_unet = MultiViewUNet(
        in_channels=15, out_channels=15, model_channels=MC,
        num_res_blocks=N_RES, channel_mult=(1, 2), num_head_channels=HEAD_CH,
        context_dim=CTX, attention_ds=(1, 2),
        disable_3d_attentions=DISABLE_3D, use_checkpoint=False)
    out = flax_unet.apply(
        {"params": pipe.mvldm_params["params"]["unet"]}, jnp.asarray(x),
        jnp.asarray(t), jnp.asarray(ctx), num_frames=F)
    assert scaled_err(out, out_ref) < 2e-3

    # --- converted text tower matches
    ids = np.array([[49406, 320, 1125, 539, 0, 0, 49407, 0]], np.int64)
    with torch.no_grad():
        txt_ref = clip(torch.from_numpy(ids)).last_hidden_state.numpy()
    from prometheus_tpu.models.clip_text import CLIPTextModel as FlaxClip

    flax_clip = FlaxClip(width=CLIP_WIDTH, num_layers=CLIP_LAYERS,
                         num_heads=1)
    txt = flax_clip.apply(
        {"params": pipe.mvldm_params["params"]["text_encoder"]},
        jnp.asarray(ids))
    assert scaled_err(txt, txt_ref) < 2e-3

    # --- converted gaussian-headed decoder (incl. the EMANorm buffer)
    z = rng.normal(size=(1, 4, 8, 8)).astype(np.float32)
    ez = rng.normal(size=(1, GS_EXTRA, 8, 8)).astype(np.float32)
    with torch.no_grad():
        dec_ref = gs_vae.decode(torch.from_numpy(z),
                                extra_z=torch.from_numpy(ez)).numpy()
    from prometheus_tpu.models.vae import AutoencoderKL

    flax_vae = AutoencoderKL(ch=VAE_CH, ch_mult=VAE_MULT, num_res_blocks=2,
                             decoder_extra_channels=GS_EXTRA,
                             decoder_out_ch=GS_OUT, use_ema_norm=True)
    gv = pipe.gsdecoder_vars
    dec = flax_vae.apply(
        {"params": gv["params"]["vae"],
         "batch_stats": gv["batch_stats"]["vae"]},
        jnp.asarray(z), extra_z=jnp.asarray(ez),
        method=AutoencoderKL.decode)
    assert dec.shape == dec_ref.shape
    assert scaled_err(dec, dec_ref) < 2e-3
    # the non-default EMA buffer came through the conversion
    got = np.asarray(
        gv["batch_stats"]["vae"]["decoder"]["up_1_upsample"]["ema_norm"]
        ["magnitude_ema"])
    np.testing.assert_allclose(got, EMA_VALUE, rtol=1e-6)
