"""Data-parallel eval driver with exact aggregation.

The reference tester accumulates running error sums over batches
(reference: lib/core/base.py:224-230); a mean of batch means over-weights a
ragged final batch. Here every eval step returns per-sample errors, each
batch is padded to a device multiple and sharded over the dp mesh
(training and eval scale on the same pod slice), and the pad tail is
dropped before summing — so the result is exactly the per-sample mean, on
any device count.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np

from ..parallel import mesh as pmesh
from .loop import jit_data_parallel

# per-sample error keys an eval step may emit
ERROR_KEYS = ("joint_err", "surface_err")


def run_eval(
    eval_step,
    state,
    pipeline,
    mesh=None,
    collect_out: Sequence[str] = (),
    collect_batch: Sequence[str] = (),
) -> Dict[str, Any]:
    """Run `eval_step(state, batch)` over a batch iterable.

    mesh: dp mesh; when given, batches are padded to a multiple of
    mesh.size (repeating the last sample) and sharded across it, and state
    is expected to be replicated on the same mesh.
    collect_out / collect_batch: per-sample output / input keys to gather
    (concatenated over batches, pad tail trimmed).

    Returns {err_key: exact mean, ...} for every ERROR_KEYS emitted, plus
    'count' and the collected arrays.
    """
    if mesh is not None:
        jeval = jit_data_parallel(eval_step, mesh, donate_state=False)
        multiple = mesh.size
    else:
        jeval = jax.jit(eval_step)
        multiple = 1

    sums: Dict[str, Any] = {}
    count = 0
    dup = set(collect_out) & set(collect_batch)
    if dup:
        raise ValueError(
            f"collect_out and collect_batch overlap on {sorted(dup)}: "
            "the gathered results would interleave outputs and inputs")
    gathered: Dict[str, list] = {k: [] for k in
                                 tuple(collect_out) + tuple(collect_batch)}
    for batch in pipeline:
        padded, n = pmesh.pad_to_multiple(batch, multiple)
        if mesh is not None:
            padded = pmesh.shard_batch(mesh, padded)
        out = jeval(state, padded)
        for k in ERROR_KEYS:
            if k in out:
                # accumulate ON DEVICE: a host fetch per batch per key
                # costs a full device round-trip and serializes eval
                sums[k] = sums.get(k, 0.0) + out[k][:n].sum()
        for k in collect_out:
            gathered[k].append(np.asarray(out[k])[:n])
        for k in collect_batch:
            gathered[k].append(np.asarray(batch[k])[:n])
        count += n

    result: Dict[str, Any] = {"count": count}
    for k, v in sums.items():
        result[k] = float(v) / max(count, 1)   # ONE sync per key, at end
    for k, chunks in gathered.items():
        if chunks:
            result[k] = np.concatenate(chunks)
    return result
