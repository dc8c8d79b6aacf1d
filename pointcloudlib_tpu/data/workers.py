"""Fork-based multi-process batch assembly.

The TPU analogue of the reference's dataloader worker processes
(kpconv_loader.py:199-201 num_workers=4, train_cls.py:426): per-item
numpy work (permutation, normalization, augmentation of 10k-point
clouds) runs in ``workers`` forked children while the main process
feeds the device. Fork (not spawn) so the dataset's cached arrays are
shared copy-on-write — a 2.4 GB ModelNet cache is never pickled.

Contracts:
  * workers touch ONLY numpy — never jax. Forking after jax backend
    init is safe exactly because children never call into the runtime.
  * each worker reseeds the dataset's augmentation rng with
    (seed, worker_id), so augment draws are independent across workers
    (a naive fork would clone the parent rng into every child).
  * bounded lookahead (2 batches per worker) — an epoch never
    accumulates in RAM when the consumer is slower than the pool.
"""

from __future__ import annotations

import itertools
import multiprocessing as mp
from collections import deque
from typing import Iterator, Sequence

import numpy as np

# worker-process globals, set once by the fork initializer
_WG: dict = {}


def _init_worker(dataset, kind, batch_size, with_normals, seed, counter):
    with counter.get_lock():
        wid = counter.value
        counter.value += 1
    # independent augmentation stream per worker (see module docstring)
    if hasattr(dataset, "_rng"):
        dataset._rng = np.random.default_rng([seed, wid])
    _WG.update(dataset=dataset, kind=kind, batch_size=batch_size,
               with_normals=with_normals)


def _make_batch(chunk):
    from pointcloudlib_tpu.data import loader

    if _WG["kind"] == "cls":
        return loader._cls_batch_from(
            _WG["dataset"], chunk, _WG["batch_size"], _WG["with_normals"]
        )
    return loader._seg_batch_from(_WG["dataset"], chunk, _WG["batch_size"])


def pool_batches(
    dataset,
    chunks: Sequence[np.ndarray],
    kind: str,
    batch_size: int,
    workers: int,
    with_normals: bool = True,
    seed: int = 0,
) -> Iterator[dict]:
    """Yield assembled batches for ``chunks`` (index arrays) in order,
    built by a ``workers``-process fork pool."""
    ctx = mp.get_context("fork")
    counter = ctx.Value("i", 0)
    with ctx.Pool(
        workers,
        initializer=_init_worker,
        initargs=(dataset, kind, batch_size, with_normals, seed, counter),
    ) as pool:
        window = 2 * workers
        it = iter(chunks)
        pending: deque = deque(
            pool.apply_async(_make_batch, (c,))
            for c in itertools.islice(it, window)
        )
        while pending:
            batch = pending.popleft().get()
            nxt = next(it, None)
            if nxt is not None:
                pending.append(pool.apply_async(_make_batch, (nxt,)))
            yield batch
