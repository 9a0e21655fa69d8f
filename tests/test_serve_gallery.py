import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prometheus_tpu.utils.visualization import write_html_gallery


def test_html_gallery(tmp_path):
    path = write_html_gallery(
        str(tmp_path / "g.html"),
        [{"title": "scene A", "images": ["a.png", "b.png"], "video": "v.mp4"},
         {"title": "scene B", "images": ["c.png"]}])
    html = open(path).read()
    assert "scene A" in html and 'src="v.mp4"' in html and "c.png" in html


@pytest.mark.slow
def test_generate_batch_sharded(tiny_pipeline_srv):
    from prometheus_tpu.parallel import make_mesh
    from serve import generate_batch

    pipe = tiny_pipeline_srv
    mesh = make_mesh()
    n = mesh.shape["data"]
    prompts = [f"scene {i}" for i in range(n)]
    out = generate_batch(pipe, prompts, jax.random.PRNGKey(0), mesh,
                         num_views=2, num_inference_steps=2,
                         render_size=32, image_size=32, latent_hw=16)
    assert out["images_gs_render"].shape[0] == n
    assert bool(jnp.isfinite(out["images_gs_render"]).all())
    # batch elements differ (independent noise/trajectories)
    a = np.asarray(out["latents_pred"][0])
    b = np.asarray(out["latents_pred"][1])
    assert np.abs(a - b).max() > 1e-6


@pytest.fixture()
def tiny_pipeline_srv(key):
    from prometheus_tpu.models import GSDecoderModel, MVLDMModel, TrajDiTModel
    from prometheus_tpu.ops.schedulers import make_schedule
    from prometheus_tpu.pipeline import PrometheusPipeline
    from prometheus_tpu.systems import MVLDMSystem, TrajDiTSystem
    from prometheus_tpu.utils import get_random_cameras

    mvldm_model = MVLDMModel(
        model_channels=32, num_head_channels=16, context_dim=64,
        channel_mult=(1, 2), num_res_blocks=1,
        disable_3d_attentions=(1, 0, 0, 0, 0), use_checkpoint=False,
        clip_layers=2, clip_width=64, vae_ch=32, vae_ch_mult=(1, 2),
        image_size=32)
    B, N, hw = 1, 2, 16
    cams = get_random_cameras(key, N, size=32)[None]
    mvldm_params = mvldm_model.init(
        key, jnp.zeros((B, N, 3, 32, 32)), jnp.zeros((B, 77), jnp.int32),
        jnp.zeros((B, N, 9, hw, hw)), jnp.zeros((B, 77, 64)),
        jnp.zeros((B, N)), cams, method=MVLDMModel.init_everything)
    gsdec = GSDecoderModel(dit_hidden_size=32, dit_depth=1, dit_num_heads=4,
                           vae_ch=32, vae_ch_mult=(1, 2), max_num_images=4)
    gsdec_vars = gsdec.init(key, jnp.zeros((B, 1, 3, 32, 32)),
                            jnp.zeros((B, N, 14, hw, hw)),
                            method=GSDecoderModel.init_everything)
    traj_model = TrajDiTModel(hidden_size=32, num_blocks=1, num_heads=4,
                              text_dim=64)
    traj_params = traj_model.init(key, jnp.zeros((1, 29, 11)),
                                  jnp.zeros((1, 77, 64)), jnp.zeros((1,)))
    return PrometheusPipeline(
        mvldm=MVLDMSystem(model=mvldm_model,
                          schedule=make_schedule("vprediction"),
                          num_pred_views=2),
        mvldm_params=mvldm_params,
        traj=TrajDiTSystem(model=traj_model), traj_params=traj_params,
        gsdecoder=gsdec, gsdecoder_vars=gsdec_vars,
        gs_kwargs=dict(z_near=0.1, z_far=10.0),
    )


def test_aot_sampler_roundtrip(tiny_pipeline_srv, tmp_path):
    """AOT sampler persistence (serve.py cold-start story): compile+save,
    reload from disk, and the deserialized executable produces the SAME
    latents as the live jit for the same inputs."""
    from serve import aot_sampler

    pipe = tiny_pipeline_srv
    path = str(tmp_path / "sampler.aot")
    B, N, hw = 1, 2, 16
    compiled = aot_sampler(pipe, path, batch_size=B, num_views=N,
                           num_inference_steps=2, latent_hw=hw)
    assert os.path.exists(path)
    loaded = aot_sampler(pipe, path, batch_size=B, num_views=N,
                         num_inference_steps=2, latent_hw=hw)

    from prometheus_tpu.utils import get_random_cameras

    key = jax.random.PRNGKey(3)
    cams = get_random_cameras(key, N, size=32)[None].astype(jnp.float32)
    txt = jax.random.normal(key, (B, 77, 64)) * 0.02
    un = jnp.zeros((B, 77, 64))
    lat_live = pipe.mvldm.sample(
        pipe.mvldm_params, key, cams, txt, un, num_inference_steps=2,
        guidance_scale=7.5, guidance_type="joint", cfg_rescale=0.7,
        latent_hw=hw)
    lat_aot = loaded(pipe.mvldm_params, key, cams, txt, un)
    np.testing.assert_allclose(np.asarray(lat_aot), np.asarray(lat_live),
                               atol=1e-5)


@pytest.mark.slow
def test_http_endpoint(tiny_pipeline_srv, tmp_path):
    """serve_http end-to-end: healthz + POST /generate -> exported scene."""
    import json as _json
    import threading
    import urllib.request

    from serve import serve_http

    holder, ready = {}, threading.Event()

    def started(srv):
        holder["srv"] = srv
        ready.set()

    th = threading.Thread(
        target=serve_http, args=(tiny_pipeline_srv, 0),
        kwargs=dict(export_dir=str(tmp_path), num_views=2, num_steps=2,
                    render_size=32, started=started), daemon=True)
    th.start()
    assert ready.wait(30)
    port = holder["srv"].server_address[1]
    base = f"http://127.0.0.1:{port}"

    with urllib.request.urlopen(f"{base}/healthz", timeout=60) as r:
        assert _json.loads(r.read())["status"] == "ok"

    req = urllib.request.Request(
        f"{base}/generate",
        data=_json.dumps({"prompt": "a toy scene", "seed": 3}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=600) as r:
        out = _json.loads(r.read())
    assert out["id"] == 0 and out["seconds"] > 0
    assert os.path.exists(out["paths"]["ply"])
    assert os.path.exists(out["paths"]["splat"])
    assert os.path.getsize(out["paths"]["splat"]) > 0

    # malformed request -> 400, unknown path -> 404 (server stays up)
    bad = urllib.request.Request(f"{base}/generate", data=b"{}",
                                 method="POST")
    try:
        urllib.request.urlopen(bad, timeout=60)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    try:
        urllib.request.urlopen(f"{base}/nope", timeout=60)
        assert False, "expected HTTP 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404
    holder["srv"].shutdown()


def _fake_pipe_and_batch(calls, delay=0.0, gate=None, busy=None):
    """Mock pipeline + generate_batch for hermetic dispatcher tests."""
    import time as _time

    def fake_generate_batch(pipe, prompts, key, mesh=None, **kw):
        if busy is not None:
            busy.set()
        if gate is not None:
            gate.wait(30)
        elif delay:
            _time.sleep(delay)
        calls.append({"prompts": list(prompts), **kw})
        img = np.zeros((len(prompts), 4, 3, 8, 8), np.float32)
        return {"images_gs_render": jnp.asarray(img),
                "gaussians": tuple(jnp.zeros((len(prompts), 4, d))
                                   for d in (3, 3, 1, 3, 4))}

    class FakeModel:
        image_size = 32
        latent_size = 16

    class FakeMV:
        model = FakeModel()

    class FakePipe:
        mvldm = FakeMV()

    return FakePipe(), fake_generate_batch


def _start_http(pipe, tmp_path, **kw):
    import threading

    from serve import serve_http

    holder, ready = {}, threading.Event()

    def started(srv):
        holder["srv"] = srv
        ready.set()

    th = threading.Thread(
        target=serve_http, args=(pipe, 0),
        kwargs=dict(export_dir=str(tmp_path), num_views=2, num_steps=2,
                    render_size=32, started=started, **kw), daemon=True)
    th.start()
    assert ready.wait(30)
    return holder["srv"]


def _post(base, payload, timeout=60):
    import json as _json
    import urllib.request

    req = urllib.request.Request(
        f"{base}/generate", data=_json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return _json.loads(r.read())


def test_http_microbatching(monkeypatch, tmp_path):
    """Concurrent same-shape requests coalesce into fewer dispatches: with
    max_batch=4 and a generous window, 6 parallel requests run in ~2
    generate_batch calls, each padded to 4 prompts (the one compiled shape)."""
    from concurrent.futures import ThreadPoolExecutor

    import serve

    calls = []
    pipe, fake = _fake_pipe_and_batch(calls, delay=0.25)
    monkeypatch.setattr(serve, "generate_batch", fake)
    srv = _start_http(pipe, tmp_path, max_batch=4, batch_window_s=0.5,
                      queue_size=16)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        with ThreadPoolExecutor(8) as ex:
            outs = list(ex.map(
                lambda i: _post(base, {"prompt": f"scene {i}"}), range(6)))
        assert all(o["seconds"] >= 0 for o in outs)
        assert {o["id"] for o in outs} == set(range(6))
        n_runs = srv._dispatch_stats["runs"]
        assert n_runs < 6, f"no micro-batching: {n_runs} runs for 6 requests"
        # default-shape batches are padded to max_batch (one compiled shape)
        batched = [c for c in calls if len(c["prompts"]) > 1]
        assert batched and all(len(c["prompts"]) == 4 for c in batched)
        assert any(o["batched_with"] > 0 for o in outs)
    finally:
        srv.shutdown()


def test_http_queue_backpressure(monkeypatch, tmp_path):
    """A full bounded queue returns 503 instead of queueing unboundedly."""
    import threading
    import urllib.error

    import serve

    calls = []
    gate, busy = threading.Event(), threading.Event()
    pipe, fake = _fake_pipe_and_batch(calls, gate=gate, busy=busy)
    monkeypatch.setattr(serve, "generate_batch", fake)
    srv = _start_http(pipe, tmp_path, max_batch=1, queue_size=1)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        results = {}

        def fire(i):
            try:
                results[i] = _post(base, {"prompt": f"s{i}"})["id"]
            except urllib.error.HTTPError as e:
                results[i] = e.code

        t1 = threading.Thread(target=fire, args=(0,))
        t1.start()
        assert busy.wait(30)          # dispatcher is inside generate_batch
        t2 = threading.Thread(target=fire, args=(1,))
        t2.start()
        # wait until request 1 occupies the single queue slot
        import time as _time
        for _ in range(100):
            import json as _json
            import urllib.request
            with urllib.request.urlopen(f"{base}/healthz", timeout=10) as r:
                if _json.loads(r.read())["queued"] >= 1:
                    break
            _time.sleep(0.05)
        t3 = threading.Thread(target=fire, args=(2,))
        t3.start()
        t3.join(30)
        assert results.get(2) == 503  # queue full -> backpressure
        gate.set()                    # release the dispatcher
        t1.join(30), t2.join(30)
        assert results[0] == 0 and results[1] == 1
    finally:
        srv.shutdown()


def test_cli_batch_path_honors_shard_views(monkeypatch, tmp_path):
    """Regression: --shard_views was parsed but never reached the batch-mode
    generate_batch calls (prompt-sharded silently). Mocks the pipeline build
    and generate_batch; asserts latency mode forces batch_size 1 and passes
    shard_views=True to warm-up AND loop calls."""
    import sys

    import serve

    calls = []

    def fake_generate_batch(pipe, prompts, key, mesh=None, **kw):
        calls.append({"prompts": list(prompts), **kw})
        img = np.zeros((len(prompts), 4, 3, 8, 8), np.float32)
        return {"images_gs_render": jnp.asarray(img),
                "gaussians": tuple(jnp.zeros((len(prompts), 4, d))
                                   for d in (3, 3, 1, 3, 4))}

    class FakeModel:
        image_size = 32
        latent_size = 16

    class FakeMV:
        model = FakeModel()

    class FakePipe:
        mvldm = FakeMV()

    monkeypatch.setattr(serve, "generate_batch", fake_generate_batch)
    import inference
    monkeypatch.setattr(inference, "build_pipeline", lambda a: FakePipe())
    pf = tmp_path / "p.txt"
    pf.write_text("one\ntwo\nthree\n")
    n_dev = jax.device_count()
    monkeypatch.setattr(sys, "argv", [
        "serve.py", "--prompt_file", str(pf), "--batch_size", "2",
        "--shard_views", "--num_views", str(2 * n_dev), "--num_steps", "2"])
    serve.main()

    assert len(calls) >= 2                       # warm-up + >=1 batch
    multi = jax.device_count() > 1
    for c in calls:
        assert c.get("shard_views") is multi     # sv only on a real mesh
        if multi:
            assert len(c["prompts"]) == 1        # latency mode: bs forced 1
