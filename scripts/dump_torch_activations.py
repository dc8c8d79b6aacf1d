"""Record a torch model's activation stream for --diff-checkpoint.

Template for auditing a reference-framework checkpoint against this
framework (the counterpart of the reference's auto_diff hook,
/root/reference/train_cls.py:330-361). Run it WHERE THE TORCH MODEL
CODE LIVES, pointing it at the same batch you will feed
``train_cls.py --diff-checkpoint``:

    python dump_torch_activations.py ck.pt batch.npy trace.npz

then on this side:

    python train_cls.py --model pointnet --synthetic \
        --diff-checkpoint ck.pt --diff-trace trace.npz

Edit ``build_model`` to construct your architecture — everything else
is generic (the capture helper hooks every submodule).
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import torch

from pointcloudlib_tpu.utils import actdiff


def build_model():
    """EDIT ME: return the torch module matching the checkpoint."""
    raise SystemExit(
        "edit build_model() in this script to construct the torch "
        "architecture the checkpoint was trained with")


def main(ck_path, batch_path, out_path):
    net = build_model()
    obj = torch.load(ck_path, map_location="cpu", weights_only=False)
    for key in ("model_state_dict", "state_dict", "model"):
        if isinstance(obj, dict) and key in obj:
            obj = obj[key]
            break
    net.load_state_dict(obj)
    net.eval()
    pts = np.load(batch_path)  # [B, N, 3] — the diff batch
    x = torch.from_numpy(pts.transpose(0, 2, 1).astype(np.float32))
    with torch.no_grad():
        items = actdiff.capture_torch(net, lambda m: m(x))
    actdiff.save_trace(out_path, items)
    print(f"dumped {len(items)} activations -> {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:4])
