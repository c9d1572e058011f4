"""Import a trained reference (PyTorch) checkpoint into mpqe_tpu params.

A user of the reference has ``torch.save``d ``state_dict()`` files
(SURVEY.md §5 checkpoint row) — the only trained artifacts the reference
produces.  This module maps such a state dict onto the functional param
pytree of :mod:`mpqe_tpu.models.mpqe`, so existing trained models carry
over without retraining.

Naming conventions (the reference mount is empty — SURVEY.md preamble —
so these follow PyG's public ``RGCNConv`` parameter names plus SURVEY.md
§2.1's model reconstruction, and every assignment is overridable with an
explicit key map):

* per R-GCN layer ``i`` (keys matching ``...{convs|layers|rgcns}.{i}.*``):
    - ``root``   ``[d, d]``          -> ``layers[i].w_self``  (PyG applies
      ``x @ root`` — same orientation as ours, no transpose)
    - ``bias``   ``[d]``             -> ``layers[i].bias``
    - ``weight`` ``[B, d, d]`` with a sibling ``comp`` -> ``layers[i].basis``
    - ``comp``   ``[R, B]``          -> ``layers[i].coeff``
    - ``weight`` ``[R, d, d]`` (no ``comp``) -> ``layers[i].w_rel``
* entity embeddings: either ONE ``[n_entities, d]`` table -> ``emb.ent``,
  or the reference's per-mode ``nn.Embedding`` modules (``load_graph``
  builds one per mode; SURVEY.md §2.1 data-loading row).  Per-mode tables
  are matched to modes by name substring and assembled into the global
  table through ``node_maps`` (row ``j`` of mode ``m``'s table is global
  entity ``node_maps[m][j]`` — the same walk ``load_graph_pickle`` uses).
* variable embeddings: one ``[n_modes, d]`` tensor -> ``emb.var`` (rows in
  sorted-mode-name order, matching ``loader.load_graph_pickle``), or
  per-mode ``[d]`` / ``[1, d]`` tensors matched by mode name.

Known-unknowable caveats (documented, not guessed):

* **Relation id order**: this framework derives directed relation ids
  from a deterministic sorted walk of ``graph_data.pkl``
  (``loader.load_graph_pickle``); if the reference enumerated relations
  in a different order, per-relation rows (``coeff`` / ``w_rel``) must be
  permuted — pass ``rel_perm`` (array such that
  ``ours[r] = theirs[rel_perm[r]]``).
* torch ``nn.Linear`` stores ``[out, in]`` — explicit key-map entries
  accept ``{"transpose": true}`` for readout MLPs and similar.

Anything the classifier cannot place is an error by default
(``allow_partial=False``): silently leaving a leaf at random init would
produce a model that *runs* but scores garbage.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

_LAYER_RE = re.compile(r"(?:^|\.)(?:convs?|layers|rgcns?)\.(\d+)\.([A-Za-z_]+)$")


def export_mpqe_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_mpqe_params`: mpqe_tpu params as a
    reference-shaped state dict (same PyG/RGCNConv naming this module's
    classifier reads back — ``import(export(p)) == p`` is pinned by
    test).  Readout params (mlp/concat) keep this framework's own leaf
    names under ``readout.*`` — the reference's readout-module names are
    not recoverable (mount empty); the classifier's key map imports them.
    """
    out: Dict[str, np.ndarray] = {
        "enc.ent.weight": np.asarray(params["emb"]["ent"]),
        "mode_embeddings.weight": np.asarray(params["emb"]["var"]),
    }
    for i, layer in enumerate(params["layers"]):
        pre = f"rgcn.convs.{i}."
        out[pre + "root"] = np.asarray(layer["w_self"])
        out[pre + "bias"] = np.asarray(layer["bias"])
        if "basis" in layer:
            out[pre + "weight"] = np.asarray(layer["basis"])
            out[pre + "comp"] = np.asarray(layer["coeff"])
        else:
            out[pre + "weight"] = np.asarray(layer["w_rel"])
    for leaf, arr in params.get("readout", {}).items():
        out[f"readout.{leaf}"] = np.asarray(arr)
    return out


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into ``{key: float ndarray}``.

    Accepts a bare ``state_dict`` or common wrappers
    (``{"state_dict": ...}``, ``{"model": ...}``, ``{"model_state_dict":
    ...}``).
    """
    import pickle

    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except pickle.UnpicklingError:
        # the checkpoint wraps non-tensor objects the weights-only
        # unpickler refuses; retry permissively.  Only THIS error falls
        # back — a corrupt/truncated file must surface its real error,
        # not a second traceback from an unsafe reload.
        obj = torch.load(path, map_location="cpu", weights_only=False)
    except TypeError:
        # torch too old for the weights_only kwarg
        obj = torch.load(path, map_location="cpu")
    for wrapper in ("state_dict", "model_state_dict", "model"):
        if isinstance(obj, dict) and isinstance(obj.get(wrapper), dict):
            obj = obj[wrapper]
            break
    if not isinstance(obj, dict):
        raise ValueError(
            f"{path}: expected a state_dict (dict of tensors), got "
            f"{type(obj).__name__}")
    out: Dict[str, np.ndarray] = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[str(k)] = np.asarray(v)
    return out


@dataclasses.dataclass
class ShapeInfo:
    """Model shape inferred from the state dict's layer parameters."""

    embed_dim: int
    n_layers: int
    n_rels: int
    num_bases: Optional[int]


def infer_model_shape(sd: Dict[str, np.ndarray]) -> ShapeInfo:
    """Infer (embed_dim, n_layers, n_rels, num_bases) from layer keys."""
    layers: Dict[int, Dict[str, np.ndarray]] = {}
    for k, a in sd.items():
        m = _LAYER_RE.search(k)
        if m:
            layers.setdefault(int(m.group(1)), {})[m.group(2)] = a
    if not layers:
        raise ValueError(
            "no R-GCN layer parameters found (keys matching "
            "'{convs|layers|rgcns}.<i>.{root,bias,weight,comp}'); pass an "
            "explicit key map")
    n_layers = max(layers) + 1
    if sorted(layers) != list(range(n_layers)):
        raise ValueError(f"non-contiguous layer indices: {sorted(layers)}")
    first = layers[0]
    if "root" in first:
        d = int(first["root"].shape[0])
    elif "bias" in first:
        d = int(first["bias"].shape[0])
    else:
        d = int(first["weight"].shape[-1])
    if "comp" in first:
        n_rels, num_bases = (int(s) for s in first["comp"].shape)
    elif "weight" in first and first["weight"].ndim == 3:
        n_rels, num_bases = int(first["weight"].shape[0]), None
    else:
        raise ValueError(
            "layer 0 has neither 'comp' nor a 3-D 'weight'; cannot infer "
            "relation vocab")
    return ShapeInfo(embed_dim=d, n_layers=n_layers, n_rels=n_rels,
                     num_bases=num_bases)


@dataclasses.dataclass
class ImportReport:
    mapped: Dict[str, str]  # param path -> source key
    unused_keys: List[str]  # state-dict keys nothing consumed
    missing: List[str]  # required param paths left at init


def _set_path(params: Dict[str, Any], path: str, arr: np.ndarray,
              dtype) -> None:
    """Assign ``arr`` at dotted ``path`` (e.g. ``layers.0.w_self``),
    asserting the existing leaf's shape."""
    parts = path.split(".")
    node: Any = params
    for p in parts[:-1]:
        node = node[int(p)] if isinstance(node, list) else node[p]
    leaf = parts[-1]
    if leaf not in node:
        raise KeyError(
            f"param path {path!r} does not exist in this model config "
            f"(available here: {sorted(node)})")
    want = tuple(node[leaf].shape)
    if tuple(arr.shape) != want:
        raise ValueError(
            f"{path}: shape {tuple(arr.shape)} != expected {want}")
    import jax.numpy as jnp

    node[leaf] = jnp.asarray(arr, dtype=dtype)


def _required_paths(params: Dict[str, Any]) -> List[str]:
    req = ["emb.ent", "emb.var"]
    for i, layer in enumerate(params["layers"]):
        for leaf in layer:
            req.append(f"layers.{i}.{leaf}")
    for leaf in params.get("readout", {}):
        req.append(f"readout.{leaf}")
    return req


def _mode_pattern(mode: str) -> "re.Pattern":
    """Mode name as a dotted path component (``enc.features.<mode>.w``)."""
    return re.compile(r"(?:^|\.)" + re.escape(mode) + r"(?:\.|$)")


def _match_mode_key(keys: Sequence[str], mode: str) -> Optional[str]:
    """Find the unique key that names ``mode`` as a path component
    (``enc.features.<mode>.weight`` and friends)."""
    pat = _mode_pattern(mode)
    hits = [k for k in keys if pat.search(k)]
    if len(hits) == 1:
        return hits[0]
    if len(hits) > 1:
        raise ValueError(
            f"mode {mode!r} matches several state-dict keys: {hits}; "
            "disambiguate with an explicit key map")
    return None


def import_mpqe_params(
    sd: Dict[str, np.ndarray],
    cfg,
    rng_key,
    *,
    mode_names: Sequence[str],
    node_maps: Optional[Dict[str, Sequence[int]]] = None,
    key_map: Optional[Dict[str, Dict[str, Any]]] = None,
    rel_perm: Optional[np.ndarray] = None,
    allow_partial: bool = False,
) -> Tuple[Dict[str, Any], ImportReport]:
    """Map a reference state dict onto ``init_mpqe(rng_key, cfg)`` params.

    ``mode_names`` must be in mode-id order (``kg.mode_names`` — the
    sorted-name order ``load_graph_pickle`` assigns).  ``node_maps`` is
    the raw ``graph_data.pkl`` third element ``{mode: ids}`` (list of
    global ids, or dict ``{global_id: local_row}``); required only when
    the state dict carries per-mode entity tables.  ``key_map`` entries
    look like ``{"layers.0.w_self": {"key": "...", "transpose": false,
    "row_offset": 0}}`` and take precedence over the classifier.
    """
    from mpqe_tpu.models import mpqe as mpqe_mod

    params = mpqe_mod.init_mpqe(rng_key, cfg)
    mapped: Dict[str, str] = {}
    used: set = set()
    d = cfg.embed_dim

    def assign(path: str, arr: np.ndarray, src: str) -> None:
        if path in mapped:
            raise ValueError(
                f"both {mapped[path]!r} and {src!r} map to param {path}")
        if rel_perm is not None and path.split(".")[-1] in ("coeff", "w_rel"):
            arr = arr[np.asarray(rel_perm)]
        _set_path(params, path, arr, cfg.dtype)
        mapped[path] = src
        used.add(src)

    # 1. explicit key map wins
    for path, spec in (key_map or {}).items():
        if spec["key"] not in sd:
            raise KeyError(f"key map: {spec['key']!r} not in state dict")
        arr = sd[spec["key"]]
        if spec.get("transpose"):
            arr = arr.T
        off = int(spec.get("row_offset", 0))
        if off:
            arr = arr[off:]
        assign(path, arr, spec["key"])

    # 2. layer parameters by PyG RGCNConv naming
    groups: Dict[int, Dict[str, str]] = {}
    for k in sd:
        if k in used:
            continue
        m = _LAYER_RE.search(k)
        if m:
            groups.setdefault(int(m.group(1)), {})[m.group(2)] = k
    for i, leaves in sorted(groups.items()):
        if i >= cfg.n_layers:
            raise ValueError(
                f"state dict has layer index {i} but cfg.n_layers="
                f"{cfg.n_layers}")
        basis_mode = "comp" in leaves or cfg.num_bases is not None
        for leaf, k in sorted(leaves.items()):
            a = sd[k]
            if leaf == "root":
                tgt = "w_self"
            elif leaf == "bias":
                tgt = "bias"
            elif leaf == "comp":
                tgt = "coeff"
            elif leaf == "weight" and a.ndim == 3:
                tgt = "basis" if basis_mode else "w_rel"
            else:
                continue  # reported as unused
            path = f"layers.{i}.{tgt}"
            if path not in mapped:
                assign(path, a, k)

    # 3. embeddings from the remaining 2-D tensors
    rest = [k for k in sd if k not in used]

    # 3a. variable embeddings
    if "emb.var" not in mapped:
        def _names_a_mode(k: str) -> bool:
            # a key that names a specific mode is a per-mode ENTITY
            # table, even if its row count happens to equal n_modes
            return any(_mode_pattern(m).search(k) for m in mode_names)

        var_whole = [k for k in rest
                     if sd[k].shape == (cfg.n_modes, d)
                     and sd[k].shape != (cfg.n_entities, d)
                     and not _names_a_mode(k)]
        if len(var_whole) == 1:
            assign("emb.var", sd[var_whole[0]], var_whole[0])
        elif len(var_whole) > 1:
            raise ValueError(
                f"several [n_modes, d] tensors could be emb.var: "
                f"{var_whole}; disambiguate with a key map")
        else:
            # per-mode variable rows ([d] or [1, d]) matched by name
            per_mode = {}
            cand = [k for k in rest
                    if sd[k].shape in ((d,), (1, d))]
            for mi, mode in enumerate(mode_names):
                k = _match_mode_key(cand, mode)
                if k is not None:
                    per_mode[mi] = k
            if len(per_mode) == len(mode_names):
                var = np.stack(
                    [sd[per_mode[mi]].reshape(d)
                     for mi in range(len(mode_names))])
                import jax.numpy as jnp

                params["emb"]["var"] = jnp.asarray(var, dtype=cfg.dtype)
                for mi in range(len(mode_names)):
                    mapped.setdefault("emb.var", per_mode[mi])
                    used.add(per_mode[mi])

    rest = [k for k in rest if k not in used]

    # 3b. entity embeddings
    if "emb.ent" not in mapped:
        whole = [k for k in rest if sd[k].shape == (cfg.n_entities, d)]
        if len(whole) == 1:
            assign("emb.ent", sd[whole[0]], whole[0])
        elif len(whole) > 1:
            raise ValueError(
                f"several [n_entities, d] tensors could be emb.ent: "
                f"{whole}; disambiguate with a key map")
        else:
            # per-mode tables assembled through node_maps
            cand = [k for k in rest if sd[k].ndim == 2
                    and sd[k].shape[1] == d]
            picks: Dict[str, str] = {}
            for mode in mode_names:
                k = _match_mode_key(cand, mode)
                if k is not None:
                    picks[mode] = k
            if picks:
                if node_maps is None:
                    raise ValueError(
                        "state dict has per-mode entity tables "
                        f"({sorted(picks.values())}) — node_maps from "
                        "graph_data.pkl is required to place their rows "
                        "in the global entity table")
                if sorted(picks) != sorted(mode_names):
                    raise ValueError(
                        "per-mode entity tables found for "
                        f"{sorted(picks)} but modes are "
                        f"{sorted(mode_names)}")
                ent = np.array(params["emb"]["ent"], dtype=np.float32,
                               copy=True)
                claimed = np.zeros(cfg.n_entities, dtype=bool)
                for mode, k in picks.items():
                    ids = node_maps[mode]
                    if isinstance(ids, dict):
                        # {global_id: local_row}; local rows must be a
                        # dense 0..len-1 permutation or rows would land
                        # on arbitrary entities
                        gl = np.full(len(ids), -1, dtype=np.int64)
                        for g, loc in ids.items():
                            loc = int(loc)
                            if not 0 <= loc < len(ids) or gl[loc] != -1:
                                raise ValueError(
                                    f"node_maps[{mode!r}]: local rows "
                                    "are not a dense 0..n-1 permutation "
                                    f"(row {loc} duplicate or out of "
                                    "range)")
                            gl[loc] = int(g)
                    else:
                        gl = np.asarray(list(ids), dtype=np.int64)
                    # globals need the same discipline as local rows:
                    # in range, unique within the mode, and not claimed
                    # by another mode — otherwise rows silently land on
                    # (or overwrite) the wrong entities
                    if gl.size and (gl.min() < 0
                                    or gl.max() >= cfg.n_entities):
                        raise ValueError(
                            f"node_maps[{mode!r}]: global entity ids "
                            f"outside [0, {cfg.n_entities})")
                    if np.unique(gl).size != gl.size:
                        raise ValueError(
                            f"node_maps[{mode!r}]: duplicate global ids")
                    if claimed[gl].any():
                        raise ValueError(
                            f"node_maps[{mode!r}]: global ids already "
                            "claimed by another mode")
                    claimed[gl] = True
                    a = sd[k]
                    if a.shape[0] != len(gl):
                        raise ValueError(
                            f"{k}: {a.shape[0]} rows but mode {mode!r} "
                            f"has {len(gl)} entities; if the table has "
                            "a padding row, set row_offset in a key map "
                            "entry for emb.ent")
                    ent[gl] = a
                    used.add(k)
                    mapped.setdefault("emb.ent", k)
                import jax.numpy as jnp

                params["emb"]["ent"] = jnp.asarray(ent, dtype=cfg.dtype)

    missing = [p for p in _required_paths(params) if p not in mapped]
    unused = [k for k in sd if k not in used]
    if missing and not allow_partial:
        raise ValueError(
            "state dict did not cover these params (pass a key map, or "
            f"allow_partial=True to keep them at random init): {missing}; "
            f"unconsumed state-dict keys: {unused}")
    return params, ImportReport(mapped=mapped, unused_keys=unused,
                                missing=missing)
