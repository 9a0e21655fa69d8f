"""Multi-device (8 virtual CPU devices) sharding + train-step tests."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from prometheus_tpu.parallel import (
    TrainState,
    data_sharding,
    fsdp_param_spec,
    init_train_state,
    make_mesh,
    make_optimizer,
    make_train_step,
    shard_batch,
    shard_params,
)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


def test_shard_batch_across_devices():
    mesh = make_mesh()
    batch = {"x": jnp.zeros((16, 4))}
    sharded = shard_batch(mesh, batch)
    assert len(sharded["x"].sharding.device_set) == 8


def test_fsdp_spec_shards_large_replicates_small():
    mesh = make_mesh()
    big = jnp.zeros((1024, 256))
    small = jnp.zeros((7,))
    sb = fsdp_param_spec(big, mesh)
    ss = fsdp_param_spec(small, mesh)
    assert sb.spec == jax.sharding.PartitionSpec("data", None)
    assert ss.spec == jax.sharding.PartitionSpec()


def quad_loss(params, model_state, batch, key):
    pred = batch["x"] @ params["w"]
    loss = jnp.mean((pred - batch["y"]) ** 2)
    return loss, ({"mse": loss}, model_state)


def make_problem(rng, n=64, d=8):
    w_true = rng.normal(size=(d, 1)).astype(np.float32)
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = x @ w_true
    return {"x": jnp.asarray(x), "y": jnp.asarray(y)}, w_true


def test_train_step_converges_data_parallel(rng):
    mesh = make_mesh()
    batch, w_true = make_problem(rng)
    params = {"w": jnp.zeros((8, 1))}
    tx = make_optimizer(learning_rate=0.1, weight_decay=0.0)
    state = init_train_state(params, {}, tx)
    step = make_train_step(quad_loss, tx, ema_decay=0.99, donate=False)

    sharded = shard_batch(mesh, batch)
    params_sharded = shard_params(state.params, mesh, "replicated")
    state = TrainState(state.step, params_sharded, state.opt_state,
                       state.ema_params, state.model_state)
    key = jax.random.PRNGKey(0)
    for i in range(200):
        state, metrics = step(state, sharded, key)
        # backpressure: on this 1-core CI host, letting async dispatches pile
        # up starves the XLA CPU collective rendezvous (40 s abort)
        jax.block_until_ready(metrics["loss"])
    assert float(metrics["loss"]) < 1e-3
    np.testing.assert_allclose(np.asarray(state.params["w"]), w_true, atol=0.05)
    assert int(state.step) == 200
    # EMA trails the params but should be close after convergence
    assert float(jnp.abs(state.ema_params["w"] - state.params["w"]).max()) < 0.5


def test_grad_accum_matches_full_batch(rng):
    batch, _ = make_problem(rng, n=32)
    params = {"w": jnp.ones((8, 1))}
    tx = make_optimizer(learning_rate=0.05, weight_decay=0.0)

    s1 = init_train_state(params, {}, tx)
    step1 = make_train_step(quad_loss, tx, grad_accum=1, donate=False)
    s1, m1 = step1(s1, batch, jax.random.PRNGKey(0))

    s4 = init_train_state(params, {}, tx)
    step4 = make_train_step(quad_loss, tx, grad_accum=4, donate=False)
    s4, m4 = step4(s4, batch, jax.random.PRNGKey(0))

    # deterministic quadratic loss: accumulated grads == full-batch grads
    np.testing.assert_allclose(np.asarray(s4.params["w"]),
                               np.asarray(s1.params["w"]), atol=1e-5)


def test_train_state_is_pytree():
    params = {"w": jnp.ones((2, 2))}
    tx = make_optimizer()
    state = init_train_state(params, {"bs": jnp.ones(())}, tx)
    leaves = jax.tree.leaves(state)
    assert len(leaves) > 0
    state2 = jax.tree.map(lambda x: x, state)
    assert isinstance(state2, TrainState)


def test_hybrid_mesh_layout():
    from prometheus_tpu.parallel import make_hybrid_mesh

    mesh = make_hybrid_mesh(num_slices=2)
    assert mesh.shape["dcn"] == 2 and mesh.shape["data"] == 4
    # single-slice fallback (CPU devices have no slice_index): one dcn group
    auto = make_hybrid_mesh()
    assert auto.shape["dcn"] == 1 and auto.shape["data"] == 8


def test_hybrid_mesh_train_step_matches_flat(rng):
    """DCN x ICI hybrid mesh: batch shards over both axes, FSDP params over
    the intra-slice axis only; one step must match the flat-mesh result."""
    from prometheus_tpu.parallel import make_hybrid_mesh

    batch, _ = make_problem(rng, n=32, d=8)
    params = {"w": jnp.ones((8, 1)) * 0.5}
    tx = make_optimizer(learning_rate=0.05, weight_decay=0.0)
    step = make_train_step(quad_loss, tx, donate=False)
    key = jax.random.PRNGKey(1)

    flat = make_mesh()
    s_flat = init_train_state(
        shard_params(params, flat, "replicated"), {}, tx)
    s_flat, m_flat = step(s_flat, shard_batch(flat, batch), key)

    hyb = make_hybrid_mesh(num_slices=2)
    sharded = shard_batch(hyb, batch)
    assert len(sharded["x"].sharding.device_set) == 8
    p_hyb = {"w": jax.device_put(params["w"],
                                 fsdp_param_spec(params["w"], hyb,
                                                 min_size=1))}
    # FSDP spec names only the intra-slice axis -> replicated across dcn
    assert p_hyb["w"].sharding.spec == jax.sharding.PartitionSpec(
        "data", None)
    s_hyb = init_train_state(p_hyb, {}, tx)
    s_hyb, m_hyb = step(s_hyb, sharded, key)

    np.testing.assert_allclose(np.asarray(m_hyb["loss"]),
                               np.asarray(m_flat["loss"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s_hyb.params["w"]),
                               np.asarray(s_flat.params["w"]), atol=1e-5)


def test_shard_batch_per_host_single_process(rng):
    from prometheus_tpu.parallel import local_batch_size, shard_batch_per_host

    assert local_batch_size(16) == 16  # one host in this suite
    mesh = make_mesh()
    batch = {"x": np.arange(16 * 4, dtype=np.float32).reshape(16, 4)}
    global_arr = shard_batch_per_host(mesh, batch)["x"]
    assert global_arr.shape == (16, 4)
    assert len(global_arr.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(global_arr), batch["x"])
