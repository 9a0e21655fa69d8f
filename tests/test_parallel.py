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


def test_frozen_mask_partitioned_step(rng):
    """frozen_mask: frozen leaves untouched, EMA/opt cover trainable only,
    and the update matches the multi_transform(set_to_zero) formulation."""
    from prometheus_tpu.parallel import full_ema_params, partition_frozen

    batch, _ = make_problem(rng)

    def loss_fn(params, model_state, b, key):
        pred = (b["x"] @ params["enc"]["w"]) @ params["head"]["w"]
        loss = jnp.mean((pred - b["y"]) ** 2)
        return loss, ({"mse": loss}, model_state)

    params = {
        "enc": {"w": jnp.asarray(rng.normal(size=(8, 8)), jnp.float32)},
        "head": {"w": jnp.asarray(rng.normal(size=(8, 1)), jnp.float32)},
    }
    mask = {"enc": {"w": True}, "head": {"w": False}}  # enc frozen

    tx = make_optimizer(learning_rate=0.05, weight_decay=0.01)
    s = init_train_state(params, {}, tx, frozen_mask=mask)
    assert "enc" not in s.ema_params and "head" in s.ema_params
    step = make_train_step(loss_fn, tx, ema_decay=0.9, donate=False,
                           frozen_mask=mask)
    key = jax.random.PRNGKey(0)
    s1, m1 = step(s, batch, key)
    # frozen leaf bit-identical, trainable moved
    np.testing.assert_array_equal(np.asarray(s1.params["enc"]["w"]),
                                  np.asarray(params["enc"]["w"]))
    assert float(jnp.abs(s1.params["head"]["w"]
                         - params["head"]["w"]).max()) > 0

    # reference formulation: multi_transform with set_to_zero on frozen
    labels = {"enc": {"w": "frozen"}, "head": {"w": "train"}}
    tx_mt = optax.multi_transform(
        {"train": make_optimizer(learning_rate=0.05, weight_decay=0.01),
         "frozen": optax.set_to_zero()}, labels)
    s_mt = init_train_state(params, {}, tx_mt)
    step_mt = make_train_step(loss_fn, tx_mt, ema_decay=0.9, donate=False)
    s1_mt, m1_mt = step_mt(s_mt, batch, key)
    np.testing.assert_allclose(np.asarray(s1.params["head"]["w"]),
                               np.asarray(s1_mt.params["head"]["w"]),
                               atol=1e-6)
    # masked grad_norm covers TRAINABLE grads only (torch clip semantics:
    # only requires_grad params); multi_transform's includes frozen grads
    g_head = jax.grad(lambda p: loss_fn({"enc": params["enc"], "head": p},
                                        {}, batch, key)[0])(params["head"])
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(optax.global_norm(g_head)), rtol=1e-5)

    # EMA overlay reconstructs the full tree
    full = full_ema_params(s1.params, s1.ema_params)
    np.testing.assert_array_equal(np.asarray(full["enc"]["w"]),
                                  np.asarray(s1.params["enc"]["w"]))
    np.testing.assert_allclose(
        np.asarray(full["head"]["w"]),
        np.asarray(0.9 * params["head"]["w"] + 0.1 * s1.params["head"]["w"]),
        atol=1e-6)

    # partition/merge round trip
    t, f = partition_frozen(params, mask)
    from prometheus_tpu.parallel import merge_partitions
    back = merge_partitions(t, f)
    assert jax.tree_util.tree_structure(back) == \
        jax.tree_util.tree_structure(params)


def test_frozen_mask_with_grad_accum(rng):
    from prometheus_tpu.parallel import partition_frozen  # noqa: F401

    batch, _ = make_problem(rng, n=32)

    def loss_fn(params, model_state, b, key):
        pred = (b["x"] @ params["enc"]["w"]) @ params["head"]["w"]
        loss = jnp.mean((pred - b["y"]) ** 2)
        return loss, ({"mse": loss}, model_state)

    params = {
        "enc": {"w": jnp.asarray(rng.normal(size=(8, 8)), jnp.float32)},
        "head": {"w": jnp.asarray(rng.normal(size=(8, 1)), jnp.float32)},
    }
    mask = {"enc": {"w": True}, "head": {"w": False}}
    tx = make_optimizer(learning_rate=0.05, weight_decay=0.0)

    s1 = init_train_state(params, {}, tx, frozen_mask=mask)
    step1 = make_train_step(loss_fn, tx, grad_accum=1, donate=False,
                            frozen_mask=mask)
    s1, _ = step1(s1, batch, jax.random.PRNGKey(0))

    s4 = init_train_state(params, {}, tx, frozen_mask=mask)
    step4 = make_train_step(loss_fn, tx, grad_accum=4, donate=False,
                            frozen_mask=mask)
    s4, _ = step4(s4, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(s4.params["head"]["w"]),
                               np.asarray(s1.params["head"]["w"]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(s4.params["enc"]["w"]),
                                  np.asarray(params["enc"]["w"]))
