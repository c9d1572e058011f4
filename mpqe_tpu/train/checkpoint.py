"""Checkpointing: full training state (params, optimizer, step) via Orbax.

The reference only ``torch.save``s the best model state_dict with no
optimizer state or mid-run resume (SURVEY.md §5).  Here the whole
TrainState pytree round-trips, so runs resume exactly: params, optimizer
moments, and step counter.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover - orbax is baked into this image
    _HAS_ORBAX = False

from mpqe_tpu.train.loop import TrainState


def save_checkpoint(ckpt_dir: str, state: TrainState) -> str:
    """Save TrainState; returns the checkpoint path.

    Overwrites an existing checkpoint at the same step (e.g. a best-val
    save at the final step followed by the unconditional final save).
    """
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{state.step}"))
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
    }
    if _HAS_ORBAX:
        if os.path.isdir(path):
            import shutil

            shutil.rmtree(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, payload)
        ckptr.wait_until_finished()
    else:  # numpy fallback
        os.makedirs(path, exist_ok=True)
        flat, treedef = jax.tree_util.tree_flatten(payload)
        np.savez(
            os.path.join(path, "state.npz"),
            *[np.asarray(x) for x in flat],
        )
        with open(os.path.join(path, "treedef.txt"), "w") as f:
            f.write(str(treedef))
    return path


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of ``template`` (shapes must match)."""
    payload = {
        "params": template.params,
        "opt_state": template.opt_state,
        "step": np.asarray(template.step),
    }
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(path), payload)
    else:
        data = np.load(os.path.join(path, "state.npz"))
        flat, treedef = jax.tree_util.tree_flatten(payload)
        restored = jax.tree_util.tree_unflatten(
            treedef, [data[k] for k in data.files]
        )
    return TrainState(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=int(np.asarray(restored["step"])),
    )


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_")[1]), name))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(ckpt_dir, max(steps)[1])
