"""Live activation diffing for migrated checkpoints.

The reference audits a cross-framework port by hooking every torch
module and diffing activations at runtime against a recorded trace
(``hook()`` + auto_diff, /root/reference/train_cls.py:330-361). This
is the same tool for this framework: capture every flax module's
output on a batch, capture (or load) the torch side, align the two
streams, and print per-module max|Delta|.

Alignment: both flax ``capture_intermediates`` and torch forward
hooks record module outputs in CALL-COMPLETION order (post-order over
the module tree), so the two streams are order-aligned up to
granularity mismatches. Matching is greedy in-order on compatible
shapes; when layouts differ only by an axis permutation (torch
[B,C,N] conv layout vs our [B,N,C]) the diff tries every dim-matching
permutation and reports the best — a genuine mismatch stays large
under all of them.

Usage (both frameworks in one process — the reference hook's mode):

    from pointcloudlib_tpu.utils import actdiff
    jx = actdiff.capture_jax(model, variables, xyz, feats,
                             training=False)
    tc = actdiff.capture_torch(tnet, lambda m: m(x_torch))
    print(actdiff.format_table(actdiff.diff(jx, tc)))

Two-process mode (the torch side runs elsewhere): dump its stream
with ``capture_torch`` + ``save_trace`` (scripts/
dump_torch_activations.py is a template), then on this side

    python train_cls.py --model pointnet --diff-checkpoint ck.pt \
        --diff-trace torch_acts.npz --synthetic
"""

from __future__ import annotations

import itertools
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

Item = Tuple[str, np.ndarray]  # (module path, activation)


def capture_jax(model, variables, *args, **kwargs) -> List[Item]:
    """Run ``model.apply`` with ``capture_intermediates=True`` and
    return every module's ``__call__`` output as an ordered
    ``(path, array)`` list (call-completion order — flax sows at
    module return, and dict insertion order preserves it).

    The apply is jitted: on the tunneled axon TPU, eager execution
    remote-compiles every op individually (minutes for one forward);
    one compiled program is the only workable route there. Caveat:
    jit canonicalizes dict pytrees to SORTED key order, which would
    destroy the call-completion order — so the ordered (path, leaf)
    stream is extracted INSIDE the traced function, where the
    intermediates dict still carries flax's insertion order, and
    returned as a list (lists keep their order through jit)."""
    import jax

    paths: List[str] = []

    def fwd(v, a):
        _, state = model.apply(v, *a, capture_intermediates=True,
                               mutable=["intermediates"], **kwargs)
        del paths[:]
        outs = []

        def walk(tree, path):
            if not isinstance(tree, dict):
                return
            for key, sub in tree.items():
                if key == "__call__":
                    for out in sub if isinstance(sub, tuple) else (sub,):
                        leaves = [x for x in _leaves(out)
                                  if hasattr(x, "shape") and x.ndim > 0]
                        if leaves:
                            paths.append(path or "<root>")
                            outs.append(leaves[0])
                else:
                    walk(sub, f"{path}/{key}" if path else key)

        walk(state["intermediates"], "")
        return outs

    outs = jax.jit(fwd)(variables, args)
    return [(p, np.asarray(o)) for p, o in zip(paths, outs)]


def _leaves(x):
    if isinstance(x, (tuple, list)):
        for item in x:
            yield from _leaves(item)
    elif x is not None:
        yield x


def capture_torch(module, call: Callable) -> List[Item]:
    """Register forward hooks on every submodule of a torch module,
    invoke ``call(module)``, and return the ordered activation stream.
    Torch-free elsewhere: imported lazily, tests importorskip it."""
    items: List[Item] = []
    handles = []

    def hook(name):
        def fn(_mod, _inp, out):
            for leaf in _leaves(out):
                if hasattr(leaf, "detach"):
                    items.append(
                        (name or "<root>",
                         leaf.detach().cpu().numpy()))
                    break
        return fn

    for name, sub in module.named_modules():
        handles.append(sub.register_forward_hook(hook(name)))
    try:
        call(module)
    finally:
        for h in handles:
            h.remove()
    return items


def save_trace(path: str, items: Sequence[Item]) -> None:
    """npz with order-encoded keys (``0007|features/bn2``)."""
    np.savez_compressed(
        path, **{f"{i:04d}|{name}": arr
                 for i, (name, arr) in enumerate(items)})


def load_trace(path: str) -> List[Item]:
    with np.load(path) as z:
        keys = sorted(z.files)
        return [(k.split("|", 1)[1], z[k]) for k in keys]


def _best_permutation(a: np.ndarray, b: np.ndarray):
    """max|a - permute(b)| minimized over axis permutations of ``b``
    whose shape matches ``a`` (layout conventions differ between the
    frameworks; a real numeric mismatch stays large under all)."""
    best = None
    for perm in itertools.permutations(range(b.ndim)):
        if tuple(b.shape[p] for p in perm) != a.shape:
            continue
        d = float(np.max(np.abs(a - np.transpose(b, perm))))
        if best is None or d < best[0]:
            best = (d, perm)
        if best[0] == 0.0:
            break
    return best


_GAP = 1.0     # cost of leaving a stream entry unmatched
_CAP = 2.0     # match-cost ceiling: a wildly-diverged pair costs no
#                more than two gaps, so positional alignment survives
#                downstream of a real defect (every pair there is at
#                the cap and the DP prefers fewer gaps — the audit
#                then SHOWS the divergence instead of hiding it in
#                one-sided rows)


def diff(ours: Sequence[Item], theirs: Sequence[Item],
         atol: float = 1e-4) -> List[dict]:
    """Sequence-align two activation streams (Needleman-Wunsch).

    Both streams are in call-completion order; gaps absorb granularity
    mismatches (torch records functional-free modules like Conv+BN
    separately, our DenseBNAct also sows the fused post-activation
    output; containers appear on one side only). Match cost is the
    permutation-minimized relative diff (layouts differ: torch [B,C,N]
    vs our [B,N,C]) capped at ``_CAP``; shape-incompatible pairs can't
    match. Rows: matched pairs with ``max_abs``/``rel`` (rel =
    max|Delta| / max|ours|) and ``ok`` = max_abs <= atol*(1+max|ours|),
    plus one-sided rows for unmatched entries, in stream order."""
    na, nb = len(ours), len(theirs)
    aa = [np.asarray(a, np.float64) for _, a in ours]
    bb = [np.asarray(b, np.float64) for _, b in theirs]

    cache: dict = {}

    def cost(i, j):
        if (i, j) not in cache:
            a, b = aa[i], bb[j]
            if a.size != b.size or a.ndim != b.ndim:
                cache[i, j] = (np.inf, None, None)
            else:
                best = _best_permutation(a, b)
                if best is None:
                    cache[i, j] = (np.inf, None, None)
                else:
                    max_abs, perm = best
                    scale = float(np.max(np.abs(a))) if a.size else 0.0
                    cache[i, j] = (min(max_abs / (scale + 1e-12), _CAP),
                                   max_abs, perm)
        return cache[i, j]

    dp = np.full((na + 1, nb + 1), np.inf)
    dp[0, :] = np.arange(nb + 1) * _GAP
    dp[:, 0] = np.arange(na + 1) * _GAP
    for i in range(1, na + 1):
        for j in range(1, nb + 1):
            dp[i, j] = min(dp[i - 1, j - 1] + cost(i - 1, j - 1)[0],
                           dp[i - 1, j] + _GAP,
                           dp[i, j - 1] + _GAP)

    rows: List[dict] = []
    i, j = na, nb
    while i > 0 or j > 0:
        if (i > 0 and j > 0
                and dp[i, j] == dp[i - 1, j - 1] + cost(i - 1, j - 1)[0]):
            c, max_abs, perm = cost(i - 1, j - 1)
            name_a, a = ours[i - 1]
            scale = float(np.max(np.abs(aa[i - 1]))) if a.size else 0.0
            rows.append({
                "ours": name_a, "theirs": theirs[j - 1][0],
                "shape": tuple(a.shape), "perm": perm,
                "max_abs": max_abs,
                "rel": max_abs / (scale + 1e-12),
                "ok": max_abs <= atol * (1.0 + scale),
            })
            i, j = i - 1, j - 1
        elif i > 0 and dp[i, j] == dp[i - 1, j] + _GAP:
            rows.append({"ours": ours[i - 1][0], "theirs": None,
                         "shape": tuple(ours[i - 1][1].shape)})
            i -= 1
        else:
            rows.append({"ours": None, "theirs": theirs[j - 1][0],
                         "shape": tuple(theirs[j - 1][1].shape)})
            j -= 1
    rows.reverse()
    return rows


def format_table(rows: Sequence[dict]) -> str:
    out = [f"{'ours':<44} {'theirs':<34} {'shape':<20} "
           f"{'max|Δ|':>10} {'rel':>9}"]
    for r in rows:
        if r.get("theirs") is None:
            out.append(f"{r['ours']:<44} {'(only ours)':<34} "
                       f"{str(r['shape']):<20}")
        elif r.get("ours") is None:
            out.append(f"{'(only theirs)':<44} {r['theirs']:<34} "
                       f"{str(r['shape']):<20}")
        else:
            flag = "" if r["ok"] else "  <-- MISMATCH"
            out.append(
                f"{r['ours']:<44} {r['theirs']:<34} "
                f"{str(r['shape']):<20} {r['max_abs']:>10.3e} "
                f"{r['rel']:>9.2e}{flag}")
    matched = [r for r in rows if r.get("max_abs") is not None]
    bad = [r for r in matched if not r["ok"]]
    out.append(f"# matched {len(matched)}, mismatched {len(bad)}, "
               f"one-sided {len(rows) - len(matched)}")
    return "\n".join(out)


def diff_checkpoint(model_name: str, kind: str, checkpoint: str,
                    batch_xyz: np.ndarray,
                    batch_feats: Optional[np.ndarray] = None,
                    cls_onehot: Optional[np.ndarray] = None,
                    trace: Optional[str] = None,
                    dump: Optional[str] = None,
                    n_classes: int = 40,
                    atol: float = 1e-4) -> List[Item]:
    """CLI entry: import a torch checkpoint through utils.interop,
    run one batch through OUR model with intermediates captured, and
    either diff against a recorded torch-side trace (``trace=``,
    printing the table) or dump our stream (``dump=``) for the torch
    side to diff. Returns our captured stream."""
    import jax.numpy as jnp

    from pointcloudlib_tpu.models import get_cls_model, get_seg_model
    from pointcloudlib_tpu.utils.interop import get_importer

    sd = _load_state_dict(checkpoint)
    variables = get_importer(model_name, kind)(sd)
    if kind == "cls":
        model = get_cls_model(model_name, n_classes=n_classes)
        args = (jnp.asarray(batch_xyz),
                None if batch_feats is None else jnp.asarray(batch_feats))
    else:
        model = get_seg_model(model_name, part_num=n_classes)
        args = (jnp.asarray(batch_xyz), jnp.asarray(cls_onehot),
                None if batch_feats is None else jnp.asarray(batch_feats))
    items = capture_jax(model, variables, *args, training=False)
    if dump:
        save_trace(dump, items)
        print(f"dumped {len(items)} activations -> {dump}")
    if trace:
        print(format_table(diff(items, load_trace(trace), atol=atol)))
    return items


def _load_state_dict(path: str):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model_state_dict", "state_dict", "model"):
        if isinstance(obj, dict) and key in obj:
            obj = obj[key]
            break
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}
