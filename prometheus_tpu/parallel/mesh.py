"""Device mesh + sharding helpers.

TPU-native replacement for the reference's Lightning DDP/DeepSpeed strategies
(``/root/reference/train.py:124-129``): one ``jax.sharding.Mesh`` with a
``data`` axis (optionally a second ``fsdp`` axis for ZeRO-style
parameter/optimizer sharding); batches are sharded over ``data``, parameters
are replicated (DP) or sharded on their largest axis (FSDP); XLA inserts the
gradient all-reduce / all-gather collectives over ICI.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = -1, axes: tuple = ("data",),
              shape: tuple | None = None) -> Mesh:
    """Create a mesh over the first ``num_devices`` devices (-1 = all)."""
    devices = jax.devices()
    if num_devices > 0:
        devices = devices[:num_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axes)


def make_hybrid_mesh(num_slices: int | None = None,
                     axes: tuple = ("dcn", "data")) -> Mesh:
    """Multi-slice (multi-node) mesh: outer ``dcn`` axis across slices,
    inner ``data`` axis within a slice.

    The TPU-native analog of the reference's ``NODE_SIZE`` multi-node DDP
    (``/root/reference/train.py:87-92``): batches shard over BOTH axes
    (every chip computes on distinct examples), while FSDP parameter/opt
    shards stay on the intra-slice ``data`` axis — so per-layer all-gathers
    ride ICI and only the once-per-step gradient reduction crosses DCN.

    ``num_slices=None`` groups devices by their ``slice_index`` attribute
    (1 on a single slice); pass an explicit count to simulate slices on a
    virtual CPU mesh.
    """
    devices = jax.devices()
    if num_slices is None:
        slice_ids = sorted({getattr(d, "slice_index", 0) or 0
                            for d in devices})
        groups = [sorted((d for d in devices
                          if (getattr(d, "slice_index", 0) or 0) == s),
                         key=lambda d: d.id) for s in slice_ids]
    else:
        if len(devices) % num_slices:
            raise ValueError(
                f"{len(devices)} devices not divisible by {num_slices} slices")
        per = len(devices) // num_slices
        groups = [devices[i * per:(i + 1) * per] for i in range(num_slices)]
    sizes = {len(g) for g in groups}
    if len(sizes) != 1:
        raise ValueError(f"uneven slice sizes {sorted(sizes)}")
    return Mesh(np.asarray(groups), axes)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis (both axes of a
    hybrid dcn x data mesh: every chip sees distinct examples)."""
    if "dcn" in mesh.axis_names and axis == "data":
        return NamedSharding(mesh, P(("dcn", "data")))
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Device-put a host batch with its leading dim sharded over the mesh."""
    s = data_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def shard_batch_views(mesh: Mesh, batch: dict, axis: str = "data"):
    """Sequence-parallel placement: the VIEW dim (axis 1) of multi-view
    leaves is sharded over the mesh; everything else is replicated. Pairs
    with ``MVLDMSystem.multi_view_loss_view_sharded`` (train.py
    ``--sp_views``)."""
    view_s = NamedSharding(mesh, P(None, axis))
    rep_s = NamedSharding(mesh, P())

    def put(k, x):
        if not isinstance(x, (jax.Array, np.ndarray)):
            return x
        if k.endswith("_mv") and x.ndim >= 2 \
                and x.shape[1] % mesh.shape[axis] == 0:
            return jax.device_put(x, view_s)
        return jax.device_put(x, rep_s)

    return {k: put(k, v) for k, v in batch.items()}


def fsdp_param_spec(param: jax.Array, mesh: Mesh, axis: str = "data",
                    min_size: int = 2**16) -> NamedSharding:
    """ZeRO-ish spec: shard the largest divisible dim of big params, else
    replicate. Small params stay replicated (collective overhead dominates)."""
    n = mesh.shape[axis]
    if param.size < min_size:
        return NamedSharding(mesh, P())
    dims = sorted(range(param.ndim), key=lambda d: -param.shape[d])
    for d in dims:
        if param.shape[d] % n == 0:
            spec = [None] * param.ndim
            spec[d] = axis
            return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh, mode: str = "replicated",
                 axis: str = "data"):
    """Place a parameter pytree: ``replicated`` (DP) or ``fsdp`` (ZeRO-ish)."""
    if mode == "replicated":
        s = replicated(mesh)
        return jax.tree.map(lambda p: jax.device_put(p, s), params)
    if mode == "fsdp":
        return jax.tree.map(
            lambda p: jax.device_put(p, fsdp_param_spec(p, mesh, axis)), params)
    raise ValueError(mode)


def shard_batch_per_host(mesh: Mesh, local_batch, axis: str = "data"):
    """Assemble a globally-sharded batch from PER-HOST local shards.

    Multi-host semantics of the reference's DDP samplers: each host's data
    loader reads only its slice of the global batch (disjoint shards), and
    the global device array is assembled without any cross-host transfer of
    example data. On a single process this equals ``shard_batch``.
    """
    s = data_sharding(mesh, axis)
    nproc = jax.process_count()

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * nproc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(s, x, global_shape)

    return jax.tree.map(put, local_batch)


def local_batch_size(global_batch: int) -> int:
    """Per-host slice of a global batch (hosts load disjoint shards)."""
    nproc = jax.process_count()
    if global_batch % nproc:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{nproc} hosts")
    return global_batch // nproc


def is_main_process() -> bool:
    """Rank-zero predicate (the reference used a wandb hack;
    ``distributed_utils.py:1-3``)."""
    return jax.process_index() == 0


def shard_map_compat():
    """``(shard_map, check_kwargs)`` across jax versions — jax >= 0.8 exports
    ``jax.shard_map`` with ``check_vma``; older versions use the
    experimental module with ``check_rep``. One helper so the version shim
    lives in exactly one place (call sites: view-sharded sampler/decoder,
    SP training loss, tile-sharded renderer)."""
    try:
        from jax import shard_map  # jax >= 0.8
        return shard_map, {"check_vma": False}
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
        return shard_map, {"check_rep": False}
