"""Static-shape batching iterator.

XLA compiles one program per shape, so every batch this yields has the
same shape: the last partial batch is padded by repetition and flagged
via a boolean ``valid`` mask (eval divides by mask sum, so padding never
skews metrics). The reference instead sets ``drop_last=True``
(shapenet_loader.py:86) or silently evaluates the ragged tail.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator

import numpy as np


def prefetch(it: Iterator, size: int = 2) -> Iterator:
    """Run an iterator in a background thread with a bounded buffer.

    The host-side equivalent of the reference's dataloader workers
    (num_workers=4, kpconv_loader.py:199-201): batch assembly and numpy
    augmentation overlap with device steps. Exceptions propagate.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()
    stop = threading.Event()

    def put(item) -> bool:
        # bounded put that gives up when the consumer abandoned the
        # generator (break / steps_per_epoch cutoff) — otherwise the
        # worker would block in q.put forever, leaking the thread and
        # its pinned batches every epoch
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in it:
                if not put(item):
                    return
            put(_END)
        except BaseException as e:  # propagate into the consumer
            put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def _pad_to(arrs: list, batch_size: int):
    n = len(arrs)
    if n == batch_size:
        return np.stack(arrs), np.ones(batch_size, bool)
    pad = [arrs[-1]] * (batch_size - n)
    valid = np.zeros(batch_size, bool)
    valid[:n] = True
    return np.stack(arrs + pad), valid


def _pad_rows(arr: np.ndarray, batch_size: int):
    n = arr.shape[0]
    if n == batch_size:
        return arr, np.ones(batch_size, bool)
    pad = np.repeat(arr[-1:], batch_size - n, axis=0)
    valid = np.zeros(batch_size, bool)
    valid[:n] = True
    return np.concatenate([arr, pad]), valid


def _cls_batch_from(dataset, chunk, batch_size: int, with_normals: bool):
    """Assemble one classification batch from item indices (shared by
    the serial iterator and the worker pool). Datasets exposing a
    vectorized ``get_batch(idx)`` (ModelNet40) skip the per-item python
    loop — ~4x feed rate on a single core."""
    if hasattr(dataset, "get_batch"):
        pts, nrm, lab = dataset.get_batch(np.asarray(chunk, np.int64))
        xyz, valid = _pad_rows(pts, batch_size)
        batch = {
            "xyz": xyz.astype(np.float32, copy=False),
            "label": _pad_rows(lab, batch_size)[0].astype(
                np.int32, copy=False),
            "valid": valid,
        }
        if with_normals:
            batch["feats"] = _pad_rows(nrm, batch_size)[0].astype(
                np.float32, copy=False)
        return batch
    pts, nrm, lab = [], [], []
    for i in chunk:
        p, n, l = dataset[int(i)]
        pts.append(p); nrm.append(n); lab.append(l)
    xyz, valid = _pad_to(pts, batch_size)
    labels, _ = _pad_to(lab, batch_size)
    batch = {
        "xyz": xyz.astype(np.float32),
        "label": labels.astype(np.int32),
        "valid": valid,
    }
    if with_normals:
        batch["feats"] = _pad_to(nrm, batch_size)[0].astype(np.float32)
    return batch


def _seg_batch_from(dataset, chunk, batch_size: int):
    """Assemble one part-seg batch from item indices."""
    pts, lab, seg = [], [], []
    for i in chunk:
        p, l, s = dataset[int(i)]
        pts.append(p); lab.append(l); seg.append(s)
    xyz, valid = _pad_to(pts, batch_size)
    return {
        "xyz": xyz.astype(np.float32),
        "label": _pad_to(lab, batch_size)[0].astype(np.int32),
        "seg": _pad_to(seg, batch_size)[0].astype(np.int32),
        "valid": valid,
    }


def _chunks(n_items: int, batch_size: int, shuffle: bool, seed: int,
            drop_last: bool):
    order = np.arange(n_items)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    out = []
    for start in range(0, n_items, batch_size):
        chunk = order[start : start + batch_size]
        if len(chunk) < batch_size and drop_last:
            break
        out.append(chunk)
    return out


def cls_batches(
    dataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = False,
    with_normals: bool = True,
    workers: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield ``{"xyz", "feats"?, "label", "valid"}`` batches from a
    classification dataset of ``(pts, normals, label)`` items.

    ``workers > 0``: assemble batches in a fork-based process pool
    (data/workers.py) — the analogue of the reference's dataloader
    num_workers (kpconv_loader.py:199-201)."""
    chunks = _chunks(len(dataset), batch_size, shuffle, seed, drop_last)
    if workers > 0:
        from pointcloudlib_tpu.data.workers import pool_batches

        yield from pool_batches(dataset, chunks, "cls", batch_size,
                                workers, with_normals=with_normals,
                                seed=seed)
        return
    for chunk in chunks:
        yield _cls_batch_from(dataset, chunk, batch_size, with_normals)


def kpconv_cls_batches(
    dataset,
    batch_size: int,
    sampler,
    rng: np.random.Generator,
    epoch_n: int | None = None,
    augment: bool = True,
    rotation: str = "none",
    drop_last: bool = True,
    bucket_of=None,
) -> Iterator[Dict[str, np.ndarray]]:
    """KPConv epoch iterator: potential-sampled indices + per-cloud
    KPConv augmentation.

    Mirrors the reference KPConv pipeline — prepare_batch_indices picks
    the epoch's lowest-potential items (kpconv_loader.py:709-794,
    epoch_n = epoch_steps × batch_num items) and augmentation_transform
    applies rotation/aniso-scale/symmetry/noise per cloud
    (kpconv_loader.py:415-491; Modelnet40Config defaults: no rotation,
    scale 0.8–1.2, all symmetries, noise 0.001). ``sampler`` is a
    :class:`pointcloudlib_tpu.data.sampler.PotentialSampler`.

    ``bucket_of`` (a ``BucketedCalibration.bucket_of``-style callable
    on the augmented cloud) enables occupancy-bucketed batching — the
    static-shape equivalent of the reference's point-budget batching
    (kpconv_loader.py:704): clouds accumulate per bucket and a batch is
    emitted (with a ``"bucket"`` key) whenever one fills, so each batch
    runs the pyramid shapes its occupancy class calibrated.
    """
    from pointcloudlib_tpu.data.sampler import kpconv_augment

    n = epoch_n if epoch_n is not None else len(dataset)
    order = sampler.sample(n)

    def emit(items, bucket=None):
        pts = [it[0] for it in items]
        lab = [it[1] for it in items]
        xyz, valid = _pad_to(pts, batch_size)
        labels, _ = _pad_to(lab, batch_size)
        out = {
            "xyz": xyz.astype(np.float32),
            "label": labels.astype(np.int32),
            "valid": valid,
        }
        if bucket is not None:
            out["bucket"] = bucket
        return out

    if bucket_of is None:
        for start in range(0, len(order), batch_size):
            chunk = order[start : start + batch_size]
            if len(chunk) < batch_size and drop_last:
                # same treatment as the bucketed tail: sampled-but-
                # untrained items get their potential bump back
                sampler.refund(chunk)
                return
            items = []
            for i in chunk:
                p, _nrm, l = dataset[int(i)]
                if augment:
                    p = kpconv_augment(p, rng, rotation=rotation)
                items.append((p.astype(np.float32), l))
            yield emit(items)
        return

    pend: Dict[int, list] = {}
    for i in order:
        p, _nrm, l = dataset[int(i)]
        if augment:
            p = kpconv_augment(p, rng, rotation=rotation)
        p = p.astype(np.float32)
        b = bucket_of(p)
        pend.setdefault(b, []).append((p, l, int(i)))
        if len(pend[b]) == batch_size:
            yield emit(pend.pop(b), bucket=b)
    if not drop_last:
        for b, items in sorted(pend.items()):
            if items:
                yield emit(items, bucket=b)
    else:
        # up to n_buckets×(batch_size−1) tail clouds accumulate here —
        # never silently: refund their potential bump so they lead the
        # next epoch's sample (the reference's point-budget batching
        # has no such loss; kpconv_loader.py:709-794), and say so.
        dropped = [idx for items in pend.values() for *_ , idx in items]
        if dropped:
            sampler.refund(dropped)
            print(f"kpconv bucketed batching: {len(dropped)} tail "
                  f"clouds deferred to next epoch (potentials refunded)")


def seg_batches(
    dataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = False,
    workers: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield ``{"xyz", "label", "seg", "valid"}`` batches from a part-seg
    dataset of ``(pts, label, seg)`` items. The default pads the tail
    batch (mask-flagged) like :func:`cls_batches` — training passes
    ``drop_last=True`` explicitly (static-shape BN batches).
    ``workers > 0``: fork-based batch-assembly pool (data/workers.py)."""
    chunks = _chunks(len(dataset), batch_size, shuffle, seed, drop_last)
    if workers > 0:
        from pointcloudlib_tpu.data.workers import pool_batches

        yield from pool_batches(dataset, chunks, "seg", batch_size,
                                workers, seed=seed)
        return
    for chunk in chunks:
        yield _seg_batch_from(dataset, chunk, batch_size)
