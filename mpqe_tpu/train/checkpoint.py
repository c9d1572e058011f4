"""Checkpointing: full training state (params, optimizer, step) via Orbax.

The reference only ``torch.save``s the best model state_dict with no
optimizer state or mid-run resume (SURVEY.md §5).  Here the whole
TrainState pytree round-trips, so runs resume exactly: params, optimizer
moments, and step counter.

``CheckpointManager`` adds the production behaviors (SURVEY.md §5 plan;
VERDICT round 1 item "async save"): saves overlap training (Orbax async
commit — the step loop keeps dispatching while the write happens), only
the best-k checkpoints by validation metric are kept (plus the latest /
final), and interrupted saves are harmless — Orbax writes to a tmp dir
and renames on commit, and ``latest_checkpoint`` ignores tmp dirs.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import List, Optional, Tuple

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
    """Newest COMMITTED checkpoint; Orbax tmp dirs from interrupted saves
    (``step_N.orbax-checkpoint-tmp-*``) fail the int parse and are
    skipped, so resume after a mid-save crash picks the previous good
    checkpoint."""
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


class CheckpointManager:
    """Async best-k checkpointing.

    ``save(state, metric)`` starts an async Orbax commit and returns
    immediately (training overlaps the write).  Checkpoints with a metric
    participate in best-k retention — when more than ``keep_best`` scored
    checkpoints exist, the worst ones are deleted; metric-less saves
    (e.g. the unconditional final save) are never pruned.  ``wait()``
    blocks until all in-flight commits finish; always call it (or
    ``close()``) before the process exits or before restoring.
    """

    def __init__(self, ckpt_dir: str, keep_best: int = 3):
        self.ckpt_dir = ckpt_dir
        self.keep_best = keep_best
        self._ckptr = ocp.StandardCheckpointer() if _HAS_ORBAX else None
        # best-k state survives restarts: scores.json next to the ckpt
        # dirs records (metric, step, path); reload + prune on resume so
        # a crashed run's stale best checkpoints are still retired
        self._scores_path = os.path.join(ckpt_dir, "scores.json")
        self._scored: List[Tuple[float, int, str]] = self._load_scores()
        if self._scored:
            self._prune()

    def _load_scores(self) -> List[Tuple[float, int, str]]:
        if not os.path.exists(self._scores_path):
            return []
        try:
            with open(self._scores_path) as f:
                entries = json.load(f)
        except (OSError, ValueError):
            return []
        out = []
        for e in entries:
            path = e["path"]
            if not os.path.isabs(path):  # stored relative to ckpt_dir
                path = os.path.abspath(os.path.join(self.ckpt_dir, path))
            if os.path.isdir(path):  # drop entries whose dir vanished
                out.append((float(e["metric"]), int(e["step"]), path))
        return out

    def _save_scores(self) -> None:
        os.makedirs(self.ckpt_dir, exist_ok=True)
        tmp = self._scores_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                [{"metric": m, "step": s,
                  "path": os.path.relpath(p, self.ckpt_dir)}
                 for m, s, p in self._scored], f)
        os.replace(tmp, self._scores_path)  # atomic: no torn scores.json

    def save(self, state: TrainState, metric: Optional[float] = None,
             wait: bool = False) -> str:
        path = os.path.abspath(
            os.path.join(self.ckpt_dir, f"step_{state.step}"))
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
        }
        if self._ckptr is not None:
            # settle in-flight commits BEFORE the existence check — an
            # async rename racing the check made Orbax refuse the path
            self._ckptr.wait_until_finished()
            if os.path.isdir(path):
                shutil.rmtree(path)
            self._ckptr.save(path, payload)  # async commit
            if wait:
                self._ckptr.wait_until_finished()
        else:  # numpy fallback (synchronous)
            save_checkpoint(self.ckpt_dir, state)
        if metric is not None:
            self._scored = [t for t in self._scored if t[2] != path]
            self._scored.append((float(metric), state.step, path))
            self._prune()
            self._save_scores()
        return path

    def _prune(self) -> None:
        if len(self._scored) <= self.keep_best:
            return
        # deleting only FINISHED dirs: block on in-flight commits first
        self.wait()
        self._scored.sort(key=lambda t: (t[0], t[1]))
        while len(self._scored) > self.keep_best:
            _, _, path = self._scored.pop(0)
            if os.path.isdir(path):
                shutil.rmtree(path)
        self._save_scores()

    def best(self) -> Optional[str]:
        if not self._scored:
            return None
        return max(self._scored, key=lambda t: (t[0], t[1]))[2]

    def wait(self) -> None:
        if self._ckptr is not None:
            self._ckptr.wait_until_finished()

    def close(self) -> None:
        self.wait()
