"""Query-answering server: trained checkpoint -> top-k entity answers.

The reference stops at offline evaluation; a production framework also
needs a SERVING path.  ``QueryServer`` wraps trained MPQE parameters for
low-latency query answering:

  * entity embeddings are L2-normalized ONCE at load (cosine scoring
    becomes one ``[B, d] @ [d, n_entities]`` MXU matmul);
  * incoming queries are grouped per structure and encoded in one device
    call each — the per-query-relation encoder (``encode_dense_multi``)
    means queries of DIFFERENT formulas batch together, so a mixed
    request needs at most 7 dispatches (typically 1-2);
  * batch shapes are padded to power-of-two buckets, so every
    (structure, bucket, k) program compiles exactly once per process;
    ``warmup()`` precompiles them ahead of traffic;
  * candidates are mode-masked (only entities of the target's type
    compete) and ranked by ``lax.top_k`` on-device — the host receives
    ``[B, k]`` ids/scores, nothing larger.

``serve.py`` at the repo root is the CLI (load a run dir, answer
sampled or piped queries, report latency).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mpqe_tpu.data.batcher import bucket_size, template_edge_norm
from mpqe_tpu.models import mpqe as mpqe_mod
from mpqe_tpu.queries import STRUCTURES, Formula, Query


@dataclasses.dataclass
class Answer:
    """Top-k candidate answers for one query."""

    entity_ids: np.ndarray  # [k] int32
    scores: np.ndarray  # [k] float32


class QueryServer:
    """Serves MPQE (both layer kinds) and GQE checkpoints: ``cfg`` is an
    ``MPQEConfig`` or ``GQEConfig``; the rank program dispatches to the
    matching per-query-relation encoder (SoftAnd GQE ranks by
    conjunct-min scores over all candidates)."""

    def __init__(
        self,
        params: Dict,
        cfg,  # MPQEConfig or GQEConfig
        entity_mode: np.ndarray,
        max_batch: int = 8192,
        neighbor_table: Optional[Dict[str, Any]] = None,  # GQE
        # encoder="neighborhood": the fanout table ({"idx","mask"})
        table_dtype: str = "float32",
        # "bfloat16": half the rank-matmul table bytes (~1e-2 relative
        #   score error); "int8": quarter bytes + int8 MXU rate — the
        #   L2-normalized rows live in [-1, 1], so symmetric scale-127
        #   quantization needs no calibration (requires cosine scoring,
        #   i.e. cfg.scale_scores).  Quantization perturbs only the
        #   candidate side; recall-vs-f32 is pinned in tests.
    ):
        from mpqe_tpu.train.evaluation import _effective_max_batch

        self.cfg = cfg
        self.entity_mode = np.asarray(entity_mode, dtype=np.int32)
        # bound per-dispatch intermediates: the [B, n_entities] score
        # matrix always, plus [B, d, do] w_rel gathers for full-weight
        per_row = cfg.n_entities
        if isinstance(cfg, mpqe_mod.MPQEConfig) and cfg.num_bases is None:
            per_row = max(per_row, cfg.embed_dim * cfg.embed_dim)
        eff = _effective_max_batch(cfg, max_batch, per_row)
        # round DOWN to a power of two: _pack pads to bucket sizes and
        # warmup() walks power-of-two buckets only — a non-pow2 cap would
        # make the first capped-size production request pay a fresh JIT
        # compile (minutes over the remote-relay backend)
        self.max_batch = 1 << (eff.bit_length() - 1)
        self._rank_fns: Dict[Tuple[str, int], Any] = {}
        if table_dtype not in ("float32", "bfloat16", "int8"):
            raise ValueError(f"unknown table_dtype {table_dtype!r}")
        if table_dtype == "int8" and not cfg.scale_scores:
            raise ValueError(
                "table_dtype='int8' needs cosine scoring "
                "(cfg.scale_scores): quantization relies on normalized "
                "rows being bounded by [-1, 1]")
        self.table_dtype = table_dtype
        from mpqe_tpu.parallel.rank_shard import quantize_rows

        if getattr(cfg, "decoder", None) == "box" and table_dtype != "float32":
            raise ValueError(
                "box-decoder serving scores L1 box distances against the "
                "raw f32 entity table; table_dtype variants apply to the "
                "cosine rank matmul only")
        ent = params["emb"]["ent"].astype(jnp.float32)
        if cfg.scale_scores and getattr(cfg, "decoder", None) != "box":
            ent = ent / (jnp.linalg.norm(ent, axis=-1, keepdims=True) + 1e-12)
        self.params = dict(params)
        # the quantization formulas live in ONE place (rank_shard) so the
        # single-chip and sharded paths cannot drift
        self._ent_norm_t = quantize_rows(jnp.asarray(ent), table_dtype).T
        self._mode_dev = jnp.asarray(self.entity_mode)
        self._nbr = (None if neighbor_table is None else
                     {"idx": jnp.asarray(neighbor_table["idx"]),
                      "mask": jnp.asarray(neighbor_table["mask"])})
        if (getattr(cfg, "encoder", "direct") == "neighborhood"
                and self._nbr is None):
            raise ValueError(
                "GQEConfig.encoder='neighborhood' checkpoints need "
                "neighbor_table= (build_neighbor_table(kg))")

    # ------------------------------------------------------------------
    def _rank_fn(self, structure: str, k: int):
        # instance-level cache (NOT functools.lru_cache on the bound
        # method, which would pin every server instance + its params in a
        # module-global cache for process lifetime)
        cached = self._rank_fns.get((structure, k))
        if cached is not None:
            return cached
        from mpqe_tpu.parallel.rank_shard import quantized_scores

        cfg = self.cfg
        table_dtype = self.table_dtype

        def all_scores(q, ent_norm_t):
            q = q.astype(jnp.float32)
            if cfg.scale_scores:
                q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
            return quantized_scores(q, ent_norm_t, table_dtype)

        def fn(params, ent_norm_t, mode_arr, ne, nm, er, en, tgt_mode,
               nbr=None):
            if isinstance(cfg, mpqe_mod.MPQEConfig):
                # _auto: fused Pallas multi kernel on TPU when eligible
                q = mpqe_mod.encode_dense_multi_auto(
                    params, cfg, structure, ne, nm, er, en)
                scores = all_scores(q, ent_norm_t)
            else:  # GQE baselines
                from mpqe_tpu.models import gqe as gqe_mod

                if getattr(cfg, "decoder", None) == "bibox":
                    # hybrid: cosine rank rides the (possibly quantized)
                    # normalized table; the box head reads the raw f32
                    # params table inside bibox_score_all
                    branches = gqe_mod.branch_vectors(
                        params, cfg, structure, ne, er, nbr)

                    def fused(rep):
                        vec, box = rep
                        return (all_scores(vec, ent_norm_t)
                                + cfg.bibox_w * gqe_mod.box_score_all(
                                    params, cfg, box))

                    if cfg.soft_and:
                        scores = jnp.min(jnp.stack(
                            [fused(b) for b in branches], 0), axis=0)
                    else:
                        scores = fused(gqe_mod._intersect_bibox(
                            cfg, params, branches))
                elif getattr(cfg, "decoder", None) == "box":
                    branches = gqe_mod.branch_vectors(
                        params, cfg, structure, ne, er, nbr)
                    if cfg.soft_and:
                        scores = jnp.min(jnp.stack(
                            [gqe_mod.box_score_all(params, cfg, b)
                             for b in branches], 0), axis=0)
                    else:
                        scores = gqe_mod.box_score_all(
                            params, cfg,
                            gqe_mod._intersect_box(cfg, params, branches))
                elif cfg.soft_and:
                    branches = gqe_mod.branch_vectors(
                        params, cfg, structure, ne, er, nbr)
                    scores = jnp.min(jnp.stack(
                        [all_scores(b, ent_norm_t) for b in branches], 0),
                        axis=0)
                else:
                    q = gqe_mod.encode_dense_multi(
                        params, cfg, structure, ne, nm, er, en, nbr)
                    scores = all_scores(q, ent_norm_t)
            mode_ok = mode_arr[None, :] == tgt_mode[:, None]
            scores = jnp.where(mode_ok, scores, -jnp.inf)
            return jax.lax.top_k(scores, k)

        jitted = jax.jit(fn)
        self._rank_fns[(structure, k)] = jitted
        return jitted

    # ------------------------------------------------------------------
    def _pack(self, queries: Sequence[Query]):
        spec = STRUCTURES[queries[0].formula.structure]
        n = len(queries)
        B = min(bucket_size(n), self.max_batch)
        ne = np.zeros((B, spec.n_nodes), np.int32)
        nm = np.zeros((B, spec.n_nodes), np.int32)
        er = np.zeros((B, spec.n_edges), np.int32)
        en = np.ones((B, spec.n_edges), np.float32)
        tm = np.zeros((B,), np.int32)
        for i, q in enumerate(queries):
            for a_i, s in enumerate(spec.anchor_slots):
                ne[i, s] = q.anchors[a_i]
            nm[i] = q.formula.node_modes
            er[i] = q.formula.rels
            en[i] = template_edge_norm(spec, q.formula.rels)
            tm[i] = q.formula.node_modes[spec.target_slot]
        return B, ne, nm, er, en, tm

    def answer(self, queries: Sequence[Query], k: int = 10) -> List[Answer]:
        """Top-k answers per query (mode-masked cosine ranking).  Queries
        may mix structures and formulas freely."""
        out: List[Optional[Answer]] = [None] * len(queries)
        by_structure: Dict[str, List[int]] = {}
        for i, q in enumerate(queries):
            by_structure.setdefault(q.formula.structure, []).append(i)
        for structure, idxs in by_structure.items():
            for lo in range(0, len(idxs), self.max_batch):
                part = idxs[lo: lo + self.max_batch]
                self._answer_group(
                    structure, [queries[i] for i in part], part, k, out)
        return out  # type: ignore[return-value]

    def _answer_group(self, structure, qs, positions, k, out):
        B, ne, nm, er, en, tm = self._pack(qs)
        fn = self._rank_fn(structure, k)
        top_scores, top_ids = fn(
            self.params, self._ent_norm_t, self._mode_dev,
            jnp.asarray(ne), jnp.asarray(nm), jnp.asarray(er),
            jnp.asarray(en), jnp.asarray(tm), self._nbr,
        )
        top_scores = np.asarray(top_scores)
        top_ids = np.asarray(top_ids)
        for j, pos in enumerate(positions):
            out[pos] = Answer(entity_ids=top_ids[j], scores=top_scores[j])

    def warmup(self, structures: Sequence[str], batch: int, k: int = 10):
        """Precompile every (structure, bucket<=batch, k) program."""
        for structure in structures:
            spec = STRUCTURES[structure]
            b = 1
            while b <= bucket_size(batch):
                q = Query(
                    Formula(structure, tuple([0] * spec.n_edges),
                            tuple([0] * spec.n_nodes)),
                    tuple([0] * spec.n_anchors), 0, (), (),
                )
                self.answer([q] * b, k=k)
                b *= 2


class ShardedQueryServer(QueryServer):
    """Serving over a row-sharded entity table (tables that exceed one
    chip — the config-5 / 10M-entity regime where even the [N, d] table
    can't live on one device, let alone a [B, N] score matrix).

    Same request surface as :class:`QueryServer` (``answer``/``warmup``,
    so ``netserve`` serves it unchanged), different device layout:

    * encode-side params keep the entity table row-sharded over the
      mesh's ``model`` axis (GSPMD inserts the anchor-row gather
      collectives — the same layout the ``--parallel spmd`` train step
      leaves the table in);
    * ranking runs ``parallel/rank_shard.make_sharded_topk_fn``:
      each shard scores the batch against ITS rows, takes a local
      top-k, and an ``all_gather`` + merge produces the global top-k —
      no [B, N] matrix ever exists, on any device.

    MPQE checkpoints only (the GQE baselines' per-query relation
    gathers are single-chip paths)."""

    def __init__(
        self,
        params: Dict,
        cfg,
        entity_mode: np.ndarray,
        mesh,
        max_batch: int = 8192,
        table_dtype: str = "float32",  # bf16/int8 shrink EACH SHARD's
        # candidate rows 2x/4x — the same lever as the single-chip
        # quantization, applied where memory pressure motivated
        # sharding in the first place (encode params stay f32)
    ):
        from mpqe_tpu.parallel import mesh as mesh_lib
        from mpqe_tpu.parallel import rank_shard
        from mpqe_tpu.train.evaluation import _effective_max_batch

        if not isinstance(cfg, mpqe_mod.MPQEConfig):
            raise ValueError(
                "sharded serving supports MPQE checkpoints only")
        self.cfg = cfg
        self.mesh = mesh
        self.entity_mode = np.asarray(entity_mode, dtype=np.int32)
        # per-shard score rows are n_entities / n_shards wide
        n_shards = mesh.shape[mesh_lib.model_axis(mesh)]
        per_row = max(cfg.n_entities // n_shards, 1)
        if cfg.num_bases is None:
            per_row = max(per_row, cfg.embed_dim * cfg.embed_dim)
        eff = _effective_max_batch(cfg, max_batch, per_row)
        self.max_batch = 1 << (eff.bit_length() - 1)
        self._rank_fns: Dict[Tuple[str, int], Any] = {}
        self._nbr = None

        # encode-side: table rows padded + sharded over the model axis
        self.params = rank_shard.shard_encode_params(dict(params), mesh)
        self.table_dtype = table_dtype
        if table_dtype == "float32":
            # ranking reuses the ENCODE table buffer (rank_shard
            # normalizes f32 per dispatch) — a second row-sharded f32
            # copy would double the dominant HBM buffer in exactly the
            # table-exceeds-one-chip regime this class exists for
            self._ent_norm_t = self.params["emb"]["ent"]
            self._mode_dev = rank_shard.shard_modes(
                mesh, jnp.asarray(self.entity_mode),
                self._ent_norm_t.shape[0])
        else:
            # quantized ranking copy (bf16: half, int8: quarter bytes)
            table = rank_shard.quantize_table(
                jnp.asarray(params["emb"]["ent"], jnp.float32),
                table_dtype, bool(cfg.scale_scores))
            self._ent_norm_t, self._mode_dev, _ = rank_shard.shard_table(
                mesh, table, jnp.asarray(self.entity_mode))
        self._rank_shard = rank_shard

    def _rank_fn(self, structure: str, k: int):
        cached = self._rank_fns.get((structure, k))
        if cached is not None:
            return cached
        cfg = self.cfg
        topk = self._rank_shard.make_sharded_topk_fn(
            self.mesh, cfg, k, table_dtype=self.table_dtype)

        def fn(params, ent_s, mode_s, ne, nm, er, en, tgt_mode, nbr=None):
            q = mpqe_mod.encode_dense_multi_auto(
                params, cfg, structure, ne, nm, er, en)
            return topk(ent_s, mode_s, q.astype(jnp.float32), tgt_mode)

        jitted = jax.jit(fn)
        self._rank_fns[(structure, k)] = jitted
        return jitted
