"""Batch pipeline: shuffling, mixed-dataset sampling, and batch iteration.

Replaces the reference's DataLoader(16 workers) + MultipleDatasets wrapper
(reference: lib/core/base.py:20-43, data/multiple_datasets.py). Host work
per batch is a few cheap numpy transforms; the heavy GT synthesis runs on
device in one jitted program per batch (gt_synth), so no worker-process
pool is needed for parity throughput.
"""
from __future__ import annotations

import threading
from queue import Empty, Queue
from typing import Dict, Iterator, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .base import SmplPoseDataset, mixed_epoch_indices
from .gt_synth import GtSynthesizer


class BatchPipeline:
    """Iterates dict batches over one or more datasets.

    Multiple datasets reproduce the reference's mixing: epoch length =
    max_len * n_dbs samples, each drawn from a uniformly random dataset;
    batch size is shared across the mix (reference: base.py:22,40-43).
    """

    def __init__(self, datasets: Sequence[SmplPoseDataset],
                 synthesizer: GtSynthesizer, batch_size: int,
                 shuffle: bool = True, seed: int = 0,
                 stage: str = "gator", drop_last: bool = True,
                 prefetch: int = 2, mode: str = "full"):
        self.datasets = list(datasets)
        # "full": ready batches (make_batch). "raw": pre-synthesis batches
        # (make_raw_batch — SMPL/camera params instead of meshes, for
        # in-step GT synthesis). "index": index-only batches
        # (make_index_batch — the step gathers everything from the
        # device-resident table). "packed": host-assembled 2D input +
        # device-resident targets (make_packed_batch — the det-input /
        # mixed-dataset fast path, data/packed.py). "device": index-only
        # packed batches — the 2D input (incl. detector-noise synthesis)
        # assembles IN-STEP too (packed.make_device_batch).
        if mode not in ("full", "raw", "index", "packed", "device"):
            raise ValueError(f"unknown BatchPipeline mode {mode!r}")
        self.mode = mode
        self.synth = synthesizer
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.stage = stage
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._epoch = 0
        # optional hook applied INSIDE the prefetch worker (e.g.
        # parallel.shard_batch): host->device transfers then overlap the
        # consumer's step dispatches instead of sitting on its critical
        # path (a few ms per MB through a TPU relay). With chunk == 1 it
        # receives one batch dict; with chunk > 1 a LIST of up to `chunk`
        # batch dicts (e.g. to stack into a multi-step super-batch).
        self.transfer = None
        # group this many consecutive batches into one yielded item
        # (requires a `transfer` hook to combine them)
        self.chunk = 1
        # epoch-granular transfer hook (e.g. parallel.EpochDeviceStream):
        # receives the WHOLE epoch's host batches at once and yields
        # (payload, n) pairs — index-only mode ships ~12 B/sample, so one
        # device_put covers the epoch and per-dispatch transfers vanish.
        # Takes precedence over `transfer`/`chunk` grouping.
        self.epoch_transfer = None

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __len__(self):
        if len(self.datasets) == 1:
            n = len(self.datasets[0])
        else:
            n = max(len(d) for d in self.datasets) * len(self.datasets)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def _plan(self, rng) -> List[np.ndarray]:
        """List of [B, 2] (dataset_id, index) arrays, one per batch."""
        if len(self.datasets) == 1:
            n = len(self.datasets[0])
            order = rng.permutation(n) if self.shuffle else np.arange(n)
            pairs = np.stack([np.zeros(n, np.int64), order], axis=1)
        else:
            pairs = mixed_epoch_indices(
                [len(d) for d in self.datasets], rng)
            if self.shuffle:
                pairs = pairs[rng.permutation(len(pairs))]
        nb = len(self)
        return [pairs[i * self.batch_size:(i + 1) * self.batch_size]
                for i in range(nb)]

    def _make(self, pairs: np.ndarray, rng) -> Dict[str, np.ndarray]:
        out = self._make_host(pairs, rng)
        return self.transfer(out) if self.transfer is not None else out

    def _items(self, plan, rng) -> Iterator:
        """Yield the epoch's work items: per-batch dicts (chunk == 1) or
        transfer()-combined groups of up to `chunk` batches."""
        if self.epoch_transfer is not None:
            if self.mode not in ("index", "packed", "device"):
                raise ValueError(
                    "BatchPipeline.epoch_transfer needs mode='index', "
                    "'packed', or 'device' — only those batches are small "
                    "enough to ship a whole epoch in one transfer")
            hosts = [self._make_host(p, rng) for p in plan]
            for payload, n in self.epoch_transfer(hosts):
                yield (payload, n) if self.chunk > 1 else payload
            return
        if self.chunk <= 1:
            for pairs in plan:
                yield self._make(pairs, rng)
            return
        if self.transfer is None:
            raise ValueError("BatchPipeline.chunk > 1 needs a transfer "
                             "hook to combine the grouped batches")
        for i in range(0, len(plan), self.chunk):
            group = plan[i:i + self.chunk]
            if len(group) < self.chunk:
                # epoch tail: emit singles — a partial group would compile
                # a SECOND multi-step program just for this one dispatch
                # (remote compiles cost minutes on relay-attached hosts)
                for p in group:
                    yield self.transfer([self._make_host(p, rng)])
            else:
                yield self.transfer(
                    [self._make_host(p, rng) for p in group])

    def _make_host(self, pairs: np.ndarray, rng) -> Dict[str, np.ndarray]:
        parts = []
        order = np.empty(len(pairs), np.int64)
        pos = 0
        for d_id in range(len(self.datasets)):
            sel = np.nonzero(pairs[:, 0] == d_id)[0]
            if len(sel) == 0:
                continue
            ds = self.datasets[d_id]
            if self.mode == "raw":
                part = ds.make_raw_batch(pairs[sel, 1], rng,
                                         stage=self.stage)
            elif self.mode == "index":
                part = ds.make_index_batch(pairs[sel, 1], rng,
                                           stage=self.stage)
            elif self.mode == "packed":
                part = ds.make_packed_batch(pairs[sel, 1], rng)
            elif self.mode == "device":
                from .packed import make_device_batch
                part = make_device_batch(ds, pairs[sel, 1], rng)
            else:
                part = ds.make_batch(pairs[sel, 1], self.synth, rng,
                                     stage=self.stage)
            parts.append(part)
            order[sel] = np.arange(pos, pos + len(sel))
            pos += len(sel)
        if len(parts) == 1:
            # single dataset: `order` is the identity, and re-indexing
            # would pull the on-device [B, V, 3] mesh to host — hand the
            # part through untouched (the mesh stays a device array)
            return parts[0]

        # restore the interleaved order so mixing isn't blocky; device
        # leaves (the GT mesh) merge on device, host leaves in numpy
        def merge(vals):
            if isinstance(vals[0], jax.Array):
                return jnp.concatenate(vals)[jnp.asarray(order)]
            return np.concatenate(vals)[order]

        return {k: merge([p[k] for p in parts]) for k in parts[0]}

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng((self.seed, self._epoch))
        plan = self._plan(rng)
        if self.prefetch <= 0:
            yield from self._items(plan, rng)
            return

        # background-thread prefetch: overlaps host assembly of batch k+1
        # with device compute on batch k. Worker failures re-raise in the
        # consumer (a swallowed error would silently truncate the epoch);
        # abandoning the iterator mid-epoch unblocks and stops the worker.
        q: Queue = Queue(maxsize=self.prefetch)
        stop = object()
        abort = threading.Event()

        def worker():
            try:
                for item in self._items(plan, rng):
                    if abort.is_set():
                        return
                    q.put(item)
                q.put(stop)
            except BaseException as exc:   # noqa: BLE001 — relayed
                q.put(exc)

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
            th.join()
        finally:
            abort.set()
            try:                # unblock a worker waiting on a full queue
                while True:
                    q.get_nowait()
            except Empty:
                pass
