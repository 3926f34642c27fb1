"""Device-mesh / sharding helpers.

The reference is single-GPU (SURVEY.md §2.6: `--gpu` only sets
CUDA_VISIBLE_DEVICES, no DataParallel/DDP anywhere); on TPU the one
multi-chip axis that matters for this workload is **data parallelism over
ICI**: the batch is sharded across the mesh, parameters/optimizer state are
replicated, and XLA's GSPMD partitioner inserts the gradient all-reduces.
Everything routes through `jax.sharding.NamedSharding` so the same jitted
step runs on 1 chip, a v5e pod slice, or a virtual CPU mesh in tests.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"
SLICE_AXIS = "dcn"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = DATA_AXIS,
              n_slices: int = 1) -> Mesh:
    """Data-parallel mesh over all (or the given) devices.

    n_slices > 1 builds a 2-D ("dcn", "dp") mesh for multi-slice
    deployments: the batch shards over BOTH axes (batch_sharding below
    uses every mesh axis), and GSPMD emits the gradient all-reduce as a
    per-slice reduce over ICI + a cross-slice reduce over DCN. On a
    single slice the 1-D mesh is identical in behavior."""
    devices = list(devices) if devices is not None else jax.devices()
    if n_slices > 1:
        if len(devices) % n_slices:
            raise ValueError(f"{len(devices)} devices do not split into "
                             f"{n_slices} slices")
        arr = np.asarray(devices).reshape(n_slices, -1)
        return Mesh(arr, (SLICE_AXIS, axis_name))
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Leading (batch) dim sharded over every mesh axis (pure data
    parallelism on 1-D and multi-slice meshes alike)."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def superbatch_sharding(mesh: Mesh,
                        axis_name: str = DATA_AXIS) -> NamedSharding:
    """[K, B, ...] stacked-step batches: step axis replicated, batch dim
    (axis 1) sharded over every mesh axis — the layout
    `train.loop.make_multi_step` scans over."""
    return NamedSharding(mesh, P(None, tuple(mesh.axis_names)))


def stack_batches(mesh: Mesh, batches: Sequence[Any]) -> Any:
    """Stack K per-step batch dicts into one [K, B, ...] super-batch,
    sharded per `superbatch_sharding`. Host (numpy) leaves stack on host;
    device leaves (e.g. the GT mesh straight from on-device synthesis)
    stack on device — neither side round-trips."""
    sh = superbatch_sharding(mesh)
    import jax.numpy as jnp

    def stack(*xs):
        if any(isinstance(x, jax.Array) for x in xs):
            return jax.device_put(jnp.stack([jnp.asarray(x) for x in xs]),
                                  sh)
        return np.stack(xs)

    stacked = jax.tree_util.tree_map(stack, *batches)
    # one batched device_put for every host leaf (per-call latency
    # dominates small copies — see shard_batch)
    leaves, treedef = jax.tree_util.tree_flatten(stacked)
    host_idx = [i for i, x in enumerate(leaves)
                if not isinstance(x, jax.Array)]
    if host_idx:
        moved = jax.device_put([leaves[i] for i in host_idx],
                               [sh] * len(host_idx))
        for i, v in zip(host_idx, moved):
            leaves[i] = v
    return jax.tree_util.tree_unflatten(treedef, leaves)


class EpochDeviceStream:
    """One host->device transfer per EPOCH for index-only batches.

    With the device-side input pipeline (`TRAIN.gt_in_step="full"`) a
    batch is just (row indices, flip flags, rotation angles) — ~12 bytes
    per sample — so the whole epoch's batches fit in one [NB, B, ...]
    tensor (a few MB even at dataset scale). Shipping that in ONE
    `device_put` and slicing per-dispatch payloads out of the
    device-resident tensor removes every per-dispatch transfer from the
    training loop: on relay-attached hosts each `device_put` costs a full
    ~30 ms round-trip that does NOT overlap device compute (the measured
    e2e table in docs/PERFORMANCE.md), and even on directly attached
    hosts it removes NB/k dispatch-path copies.

    Every host batch must have identical leaf shapes (configure the
    pipeline with drop_last=True); ragged tails are rejected up front.
    Called with the epoch's list of host batch dicts; yields
    `(payload, n)` pairs where payload is a device-resident [k, B, ...]
    super-batch (sharded per `superbatch_sharding`, ready for
    `make_multi_step`) for full groups and a [B, ...] batch (sharded per
    `batch_sharding`) for epoch-tail singles. The slice programs compile
    once per (k, shapes) and take the group offset as a traced scalar.
    """

    def __init__(self, mesh: Mesh, k: int):
        import functools

        import jax.numpy as jnp  # noqa: F401  (jit under the hood)

        self.mesh = mesh
        self.k = max(1, int(k))
        self._sh = superbatch_sharding(mesh)

        def _slice(epoch, i, k):
            return jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_slice_in_dim(x, i, k, axis=0),
                epoch)

        def _index(epoch, i):
            return jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, i, axis=0, keepdims=False), epoch)

        # sharding propagates from the epoch tensor: [k, B, ...] keeps
        # superbatch sharding, [B, ...] drops to batch sharding — axis 0
        # is replicated, so neither slice needs communication
        self._slice_k = jax.jit(functools.partial(_slice, k=self.k))
        self._index_1 = jax.jit(_index)

    def __call__(self, host_batches):
        if not host_batches:
            return
        # validate BEFORE np.stack: a jax.Array leaf would silently coerce
        # to numpy inside np.stack (paying the device->host round-trip this
        # class exists to avoid), and ragged batch shapes (drop_last=False
        # tails) would fail inside np.stack with an opaque broadcast error
        first = jax.tree_util.tree_leaves(host_batches[0])
        for x in first:
            if isinstance(x, jax.Array):
                raise ValueError(
                    "EpochDeviceStream expects host (numpy) batches — "
                    "index-only pipelines never carry device leaves")
        shapes0 = [x.shape for x in first]
        for k, hb in enumerate(host_batches[1:], start=1):
            shapes = [x.shape for x in jax.tree_util.tree_leaves(hb)]
            if shapes != shapes0:
                raise ValueError(
                    f"EpochDeviceStream needs uniform batch shapes (use "
                    f"drop_last=True): batch 0 has {shapes0[:3]}..., "
                    f"batch {k} has {shapes[:3]}...")
        stacked = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs), *host_batches)
        leaves, treedef = jax.tree_util.tree_flatten(stacked)
        moved = jax.device_put(leaves, [self._sh] * len(leaves))
        epoch = jax.tree_util.tree_unflatten(treedef, moved)
        nb, k, i = len(host_batches), self.k, 0
        while i < nb:
            if k > 1 and i + k <= nb:
                yield self._slice_k(epoch, np.int32(i)), k
                i += k
            else:
                # epoch tail: singles reuse the already-compiled
                # one-step program (same policy as BatchPipeline._items)
                yield self._index_1(epoch, np.int32(i)), 1
                i += 1


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place every array in a (possibly nested) batch with its leading dim
    sharded across the mesh. All leaves ride ONE batched device_put call —
    per-call latency dominates small host->device copies (through a TPU
    relay each call costs a full round-trip), so N separate puts cost N
    round-trips."""
    sh = batch_sharding(mesh)
    leaves, treedef = jax.tree_util.tree_flatten(batch)
    out = jax.device_put(leaves, [sh] * len(leaves))
    return jax.tree_util.tree_unflatten(treedef, out)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """device_put every leaf replicated over the mesh. NOTE: device_put
    may alias (not copy) buffers whose shard on a device already matches —
    if the replicated tree is then passed to a donating jitted step, the
    donation can delete the ORIGINAL tree's buffers too. Don't reuse the
    input tree after feeding the replicated copy to a donating step; deep
    copy first (tree_map(jnp.array, ...)) if you must."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(batch: Any, multiple: int) -> tuple[Any, int]:
    """Pad leading dims up to a device-count multiple (repeating the last
    element) so a ragged final eval batch still shards evenly.
    Returns (padded_batch, original_size)."""
    leaves = jax.tree_util.tree_leaves(batch)
    n = leaves[0].shape[0]
    bad = [x.shape for x in leaves if x.shape[0] != n]
    if bad:
        raise ValueError(
            f"pad_to_multiple: every leaf must share the leading batch "
            f"dim {n}; got leaves with shapes {bad[:3]}")
    pad = (-n) % multiple

    def _pad(x):
        if isinstance(x, jax.Array):   # device-resident leaves stay there
            import jax.numpy as jnp
            reps = jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])
            return jnp.concatenate([x, reps], axis=0)
        reps = np.repeat(x[-1:], pad, axis=0)
        return np.concatenate([x, reps], axis=0)

    if pad == 0:
        return batch, n
    return jax.tree_util.tree_map(_pad, batch), n
