"""Training loop: curriculum, bucketed jit train steps, convergence checks.

Reference: mpqe/train_helpers.py ``run_train``/``run_batch``/``check_conv``
(SURVEY.md §2.1, §3.1): each step samples a random formula within a random
query structure, runs a margin-ranking batch; curriculum trains 1-chain
("edge") queries only until the loss converges (burn-in), then mixes all
structures; periodic eval with checkpoint-on-best; early stop on
validation plateau.

TPU-first differences: one jitted train-step per (structure, batch-bucket,
n_neg) — compiled ahead of the hot loop, never recompiled; host work per
step is integer array packing only (and moves to the C++ batcher when
enabled).
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mpqe_tpu.data.batcher import DenseQueryBatch
from mpqe_tpu.models import mpqe as mpqe_mod
from mpqe_tpu.queries import INTERSECTION_STRUCTURES, Formula, Query
from mpqe_tpu.train import evaluation


@dataclasses.dataclass
class TrainConfig:
    lr: float = 0.01
    # const | cosine (decay to lr/100 over max_steps) | warmup_cosine
    # (linear 0 -> lr over warmup_steps, then cosine to lr/100)
    lr_schedule: str = "const"
    warmup_steps: int = 0
    grad_clip_norm: float = 0.0  # 0 = no clipping
    weight_decay: float = 0.0  # >0 switches adam -> adamw
    batch_size: int = 512
    n_neg: int = 1
    max_steps: int = 100_000
    burn_in_structure: str = "1-chain"
    conv_window: int = 100  # loss window for convergence checks
    conv_tol: float = 1e-4
    val_every: int = 1000
    patience: int = 5  # eval rounds without val improvement -> stop
    hard_neg_prob: float = 0.5  # P(use hard negatives) on intersection batches
    # margin for hard-negative batches (0 = use cfg.margin, the
    # reference convention).  Measured round 5 (BASELINE.md round-5
    # quality table): demanding the full cosine margin (1.0 on [-1,1]
    # scores) against strict-subset satisfiers never saturates and
    # distorts the encoder; a small ranking margin (0.2) preserves
    # plain APR while still ordering pos > hard.
    hard_margin: float = 0.0
    seed: int = 0
    optimizer: str = "adam"


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    if tc.lr_schedule == "cosine":
        lr = optax.cosine_decay_schedule(
            tc.lr, decay_steps=max(tc.max_steps, 1), alpha=0.01)
    elif tc.lr_schedule == "warmup_cosine":
        w = max(tc.warmup_steps, 1)
        lr = optax.warmup_cosine_decay_schedule(
            0.0, tc.lr, warmup_steps=w,
            decay_steps=max(tc.max_steps, w + 1),
            end_value=tc.lr * 0.01)
    elif tc.lr_schedule == "const":
        lr = tc.lr
    else:
        raise ValueError(tc.lr_schedule)
    if tc.optimizer == "adam":
        # weight decay applies to every param incl. the entity table
        # (standard adamw semantics — decoupled, schedule-scaled)
        base = (optax.adamw(lr, weight_decay=tc.weight_decay)
                if tc.weight_decay > 0 else optax.adam(lr))
    elif tc.optimizer == "sgd":
        if tc.weight_decay > 0:
            raise ValueError("weight_decay requires optimizer='adam'")
        base = optax.sgd(lr)
    else:
        raise ValueError(tc.optimizer)
    if tc.grad_clip_norm > 0:
        return optax.chain(
            optax.clip_by_global_norm(tc.grad_clip_norm), base)
    return base


def train_config_from_run(run_cfg) -> TrainConfig:
    """TrainConfig matching the optimizer a run dir was trained with.

    Checkpoint restore needs a template whose opt_state PYTREE STRUCTURE
    matches the saved one — grad clipping (optax.chain) and adamw change
    that structure, so evaluate/serve/export must rebuild the optimizer
    from the run's ``config.json`` (train.py's ``vars(args)``) rather
    than assume defaults.  Missing keys (older runs, imported
    checkpoints) fall back to the defaults they were built with.
    """
    g = run_cfg.get
    return TrainConfig(
        lr=g("lr", 0.01) or 0.01,
        lr_schedule=g("lr_schedule") or "const",
        warmup_steps=g("warmup_steps") or 0,
        optimizer=g("optimizer") or "adam",
        grad_clip_norm=g("grad_clip") or 0.0,
        weight_decay=g("weight_decay") or 0.0,
        max_steps=g("steps") or 100_000,
    )


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def make_train_step(
    cfg,
    optimizer: optax.GradientTransformation,
    batch_loss_fn: Optional[Callable] = None,
    loss_consts: Optional[Dict[str, Any]] = None,
) -> Callable:
    """Jitted (params, opt_state, batch arrays) -> (params, opt_state, loss).

    ``structure`` is static — jax caches one executable per (structure,
    array-shape bucket).  ``batch_loss_fn(params, cfg, structure, *arrays)``
    defaults to the MPQE dense-batch margin loss; pass
    ``models.gqe.dense_batch_loss`` (with a GQEConfig) for the baselines.

    ``loss_consts`` is a kwargs dict of per-run array pytrees forwarded
    to ``batch_loss_fn`` (e.g. ``{"neighbor_table": ...}``).  They ride
    as TRACED arguments of the jitted step — never functools.partial or
    closure-capture large arrays into the loss, which bakes them into
    the HLO as constants and overflows the remote-relay compile request
    (CLAUDE.md / docs/design.md §6).
    """
    if batch_loss_fn is None:
        batch_loss_fn = mpqe_mod.dense_batch_loss

    def step_fn(
        consts, params, opt_state, structure: str,
        node_entity, node_mode, edge_rel, edge_norm,
        target, negatives, neg_mask, query_mask,
    ):
        def loss_fn(p):
            return batch_loss_fn(
                p, cfg, structure, node_entity, node_mode, edge_rel,
                edge_norm, target, negatives, neg_mask, query_mask,
                **consts,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jit_step = jax.jit(step_fn, static_argnums=(3,), donate_argnums=(1, 2))
    return functools.partial(jit_step, loss_consts or {})


def make_multistep_train_step(
    cfg,
    optimizer: optax.GradientTransformation,
    batch_loss_fn: Optional[Callable] = None,
    loss_consts: Optional[Dict[str, Any]] = None,
) -> Callable:
    """K train steps per dispatch: batch arrays gain a leading [K] axis and
    a ``lax.scan`` consumes them on-device.  Amortizes host->device dispatch
    latency K-fold (essential on remote-relay backends, useful everywhere);
    returns per-step losses ``[K]``.  ``loss_consts`` as in
    :func:`make_train_step` (shared across the K scanned steps)."""
    if batch_loss_fn is None:
        batch_loss_fn = mpqe_mod.dense_batch_loss

    def step_fn(
        consts, params, opt_state, structure: str,
        node_entity, node_mode, edge_rel, edge_norm,
        target, negatives, neg_mask, query_mask,
    ):
        def body(carry, xs):
            p, o = carry
            ne, nm, er, en, tg, ng, nmsk, qmsk = xs

            def loss_fn(pp):
                return batch_loss_fn(
                    pp, cfg, structure, ne, nm, er, en, tg, ng, nmsk, qmsk,
                    **consts,
                )

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = optimizer.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state),
            (node_entity, node_mode, edge_rel, edge_norm,
             target, negatives, neg_mask, query_mask),
        )
        return params, opt_state, losses

    jit_step = jax.jit(step_fn, static_argnums=(3,), donate_argnums=(1, 2))
    return functools.partial(jit_step, loss_consts or {})


def run_multistep(
    train_step: Callable, state: TrainState, batches
) -> List[float]:
    """Stack K same-structure batches and run one scanned dispatch."""
    structure = batches[0].structure
    stack = lambda f: jnp.asarray(np.stack([getattr(b, f) for b in batches]))
    state.params, state.opt_state, losses = train_step(
        state.params, state.opt_state, structure,
        stack("node_entity"), stack("node_mode"),
        stack("edge_rel"), stack("edge_norm"),
        stack("target"), stack("negatives"),
        stack("neg_mask"), stack("query_mask"),
    )
    state.step += len(batches)
    return [float(l) for l in np.asarray(losses)]


def run_multistep_stacked(
    train_step: Callable, state: TrainState, batch: DenseQueryBatch
) -> List[float]:
    """One scanned dispatch over a PRE-STACKED [K, ...] batch (produced by
    BatchPipeline(steps_per_call=K) on its background thread) — the
    prefetch path's multistep entry: no host-side stacking here."""
    state.params, state.opt_state, losses = train_step(
        state.params, state.opt_state, batch.structure,
        jnp.asarray(batch.node_entity), jnp.asarray(batch.node_mode),
        jnp.asarray(batch.edge_rel), jnp.asarray(batch.edge_norm),
        jnp.asarray(batch.target), jnp.asarray(batch.negatives),
        jnp.asarray(batch.neg_mask), jnp.asarray(batch.query_mask),
    )
    losses = np.asarray(losses)
    state.step += len(losses)
    return [float(l) for l in losses]


def run_step(
    train_step: Callable,
    state: TrainState,
    batch: DenseQueryBatch,
) -> float:
    state.params, state.opt_state, loss = train_step(
        state.params, state.opt_state, batch.structure,
        jnp.asarray(batch.node_entity), jnp.asarray(batch.node_mode),
        jnp.asarray(batch.edge_rel), jnp.asarray(batch.edge_norm),
        jnp.asarray(batch.target), jnp.asarray(batch.negatives),
        jnp.asarray(batch.neg_mask), jnp.asarray(batch.query_mask),
    )
    state.step += 1
    return float(loss)


def check_conv(losses: collections.deque, tol: float) -> bool:
    """Converged when the relative improvement between the two halves of
    the loss window falls below tol (reference check_conv semantics)."""
    if len(losses) < losses.maxlen:
        return False
    arr = np.asarray(losses)
    half = len(arr) // 2
    old, new = arr[:half].mean(), arr[half:].mean()
    if old <= 0:
        return True
    return (old - new) / abs(old) < tol


def warmup_train_step(
    train_step: Callable,
    cfg,
    tc: TrainConfig,
    structures,
) -> None:
    """Ahead-of-time compile every (structure, batch-bucket) executable so
    the hot loop never hits a compile (SURVEY.md §7 step 6: bucket AOT
    compilation cache).  Throwaway params/opt_state are built, threaded
    through the compiles, and discarded."""
    from mpqe_tpu.queries import STRUCTURES as _S

    optimizer = make_optimizer(tc)
    if not isinstance(cfg, mpqe_mod.MPQEConfig):
        return  # non-MPQE configs: caller compiles via its first step
    params = mpqe_mod.init_mpqe(jax.random.PRNGKey(0), cfg)
    opt_state = optimizer.init(params)
    B, K = tc.batch_size, tc.n_neg
    for structure in structures:
        spec = _S[structure]
        ne = jnp.zeros((B, spec.n_nodes), jnp.int32)
        nm = jnp.zeros((B, spec.n_nodes), jnp.int32)
        er = jnp.zeros((spec.n_edges,), jnp.int32)
        en = jnp.ones((spec.n_edges,), jnp.float32)
        tgt = jnp.zeros((B,), jnp.int32)
        neg = jnp.zeros((B, K), jnp.int32)
        nmask = jnp.ones((B, K), jnp.float32)
        qmask = jnp.ones((B,), jnp.float32)
        params, opt_state, _ = train_step(
            params, opt_state, structure, ne, nm, er, en, tgt, neg,
            nmask, qmask,
        )


@dataclasses.dataclass
class TrainLogEntry:
    step: int
    loss: float
    structure: str
    phase: str
    seconds: float


def run_train(
    state: TrainState,
    cfg,
    tc: TrainConfig,
    train_queries: Dict[str, Dict[Formula, List[Query]]],
    val_queries: Optional[Dict[str, Dict[Formula, List[Query]]]] = None,
    log_fn: Optional[Callable[[Dict[str, Any]], None]] = None,
    checkpoint_fn: Optional[Callable[[TrainState, float], None]] = None,
    train_step: Optional[Callable] = None,
    multi_step: Optional[Callable] = None,
    batch_loss_fn: Optional[Callable] = None,
    loss_consts: Optional[Dict[str, Any]] = None,
    eval_encode_fn: Optional[Callable] = None,
    kg=None,
    warmup: bool = False,
    prefetch: int = 0,
    steps_per_call: int = 1,
    train_stores=None,  # pre-built {structure: [FormulaStore]} overrides
    neighbor_table=None,  # GQE neighborhood-encoder table (eval side)
    trace: Optional[Tuple[int, int, str]] = None,
    # (skip_steps, n_steps, log_dir): capture a jax.profiler trace of
    # n_steps once skip_steps have run this call (past compiles/warmup)
    should_stop: Optional[Callable[[], bool]] = None,
    # polled each step: True -> stop cleanly (graceful preemption; the
    # caller then saves its normal final checkpoint and exits 0)
) -> TrainState:
    """Curriculum training until convergence / max_steps / patience.

    ``prefetch > 0`` packs batches in a background thread (C++ packer,
    device-put ahead of use) via data.pipeline.BatchPipeline — one
    pipeline per curriculum phase (burn-in draws only the burn-in
    structure).  ``prefetch == 0`` packs synchronously in-loop.
    """
    rng = np.random.default_rng(tc.seed)
    optimizer = make_optimizer(tc)
    hard_step = hard_multi = None
    if train_step is None:
        train_step = make_train_step(
            cfg, optimizer, batch_loss_fn, loss_consts=loss_consts)
        if steps_per_call > 1 and multi_step is None:
            multi_step = make_multistep_train_step(
                cfg, optimizer, batch_loss_fn, loss_consts=loss_consts)
        if tc.hard_margin > 0.0:
            # hard-negative batches train at a reduced margin (measured
            # round 5; TrainConfig.hard_margin doc) — one extra compiled
            # executable per structure, same optimizer
            hcfg = dataclasses.replace(cfg, margin=tc.hard_margin)
            hard_step = make_train_step(
                hcfg, optimizer, batch_loss_fn, loss_consts=loss_consts)
            if steps_per_call > 1:
                hard_multi = make_multistep_train_step(
                    hcfg, optimizer, batch_loss_fn,
                    loss_consts=loss_consts)
    elif tc.hard_margin > 0.0:
        raise ValueError(
            "hard_margin needs the default train step (custom "
            "spmd/halo steps own their loss margin)")
    elif steps_per_call > 1 and multi_step is None:
        # a supplied step (spmd/halo) owns its own jit/sharding — silently
        # running it one-dispatch-per-step would ignore the K the caller
        # asked for; distributed callers pass their own scanned step
        # (spmd.make_spmd_multistep_train_step /
        # halo_train.make_halo_multistep_train_step)
        raise ValueError(
            "steps_per_call > 1 with a custom train_step needs a matching "
            "custom multi_step (--parallel spmd/halo_* builds one)"
        )
    if steps_per_call <= 1:
        multi_step = None  # the scanned path only engages for K > 1

    # Flatten query lists into array-native FormulaStores once; per-step
    # batch packing then runs through the C++ host runtime when available
    # (pure-numpy packer otherwise) — no Python-object work in the hot loop.
    from mpqe_tpu.data import native as native_mod
    from mpqe_tpu.data.store import build_stores, pack_dense_batch_np

    # (or taken pre-built from ``train_stores`` — the array-native
    # raw-edge path, store.stores_from_edges, at KG scale)
    stores = (train_stores if train_stores is not None
              else build_stores(train_queries, kg=kg))
    use_native = native_mod.available()

    structures = [s for s in stores if stores[s]]
    if warmup:
        warmup_train_step(train_step, cfg, tc, structures)
    # validation path: batched single-sweep eval (per-query-relation
    # encoders cover both MPQE layer kinds and the GQE baselines); the
    # per-formula path remains for caller-supplied custom encoders
    eval_set = None
    if val_queries and eval_encode_fn is None:
        eval_set = evaluation.make_eval_set(val_queries)

    def run_validation():
        if eval_set is not None:
            return evaluation.evaluate_batched(
                state.params, cfg, eval_set, neighbor_table=neighbor_table)
        return evaluation.evaluate(
            state.params, cfg, val_queries, encode_fn=eval_encode_fn)

    burn_in = tc.burn_in_structure in structures and len(structures) > 1
    losses: collections.deque = collections.deque(maxlen=tc.conv_window)
    best_val = -np.inf
    bad_evals = 0
    phase = "burn_in" if burn_in else "full"
    # validation fires on *crossing* a val_every boundary, not on exact
    # multiples — with steps_per_call=K the step counter strides by K, and
    # `step % val_every == 0` would silently validate only at
    # lcm(K, val_every) intervals.
    last_val_bucket = state.step // tc.val_every

    pipeline = None

    def make_pipeline(ph):
        from mpqe_tpu.data.pipeline import BatchPipeline

        structs = [tc.burn_in_structure] if ph == "burn_in" else structures
        return BatchPipeline(
            stores, batch_size=tc.batch_size, n_neg=tc.n_neg,
            structures=structs, hard_neg_prob=tc.hard_neg_prob,
            seed=tc.seed, prefetch=prefetch,
            steps_per_call=steps_per_call if multi_step is not None else 1,
        ).start()

    if prefetch > 0:
        pipeline = make_pipeline(phase)

    trace_start = trace_stop = -1
    tracing = False
    if trace is not None:
        skip, n_trace, trace_dir = trace
        trace_start = state.step + skip
        trace_stop = trace_start + max(n_trace, 1)

    target_step = state.step + tc.max_steps
    try:
        while state.step < target_step:
            if should_stop is not None and should_stop():
                if log_fn:
                    log_fn({"step": state.step, "event": "preempt_stop"})
                break
            if trace_start >= 0 and not tracing and state.step >= trace_start:
                jax.profiler.start_trace(trace_dir)
                tracing = True
                if log_fn:
                    log_fn({"step": state.step, "event": "trace_start",
                            "trace_dir": trace_dir})
            if pipeline is not None:
                batch = next(pipeline)
                structure = batch.structure
            else:
                if phase == "burn_in":
                    structure = tc.burn_in_structure
                else:
                    structure = structures[rng.integers(len(structures))]
                f_stores = stores[structure]
                fstore = f_stores[rng.integers(len(f_stores))]
                pick = rng.integers(
                    0, fstore.n_queries, size=min(tc.batch_size, fstore.n_queries)
                ).astype(np.int64)
                use_hard = (
                    structure in INTERSECTION_STRUCTURES
                    and rng.random() < tc.hard_neg_prob
                )
                seed = int(rng.integers(2**62))
                if use_native:
                    batch = native_mod.pack_dense_batch_native(
                        fstore, pick, tc.batch_size, tc.n_neg, seed, use_hard
                    )
                else:
                    batch = pack_dense_batch_np(
                        fstore, pick, tc.batch_size, tc.n_neg, seed, use_hard
                    )
            t0 = time.perf_counter()
            use_hard_margin = (hard_step is not None
                               and getattr(batch, "used_hard", False))
            if multi_step is not None:
                ms = hard_multi if use_hard_margin else multi_step
                if pipeline is not None:
                    # the producer thread already packed + stacked K batches
                    k_losses = run_multistep_stacked(ms, state, batch)
                else:
                    # pack K-1 more same-formula batches and scan them on-device
                    extra = []
                    for _ in range(steps_per_call - 1):
                        pk = rng.integers(
                            0, fstore.n_queries,
                            size=min(tc.batch_size, fstore.n_queries),
                        ).astype(np.int64)
                        sd = int(rng.integers(2**62))
                        pack = (native_mod.pack_dense_batch_native if use_native
                                else pack_dense_batch_np)
                        extra.append(pack(fstore, pk, tc.batch_size, tc.n_neg,
                                          sd, use_hard))
                    k_losses = run_multistep(ms, state, [batch] + extra)
                dt = time.perf_counter() - t0
                losses.extend(k_losses)
                loss = k_losses[-1]
                if log_fn:
                    log_fn({
                        "step": state.step, "loss": loss,
                        "loss_mean_k": float(np.mean(k_losses)),
                        "structure": structure, "phase": phase, "seconds": dt,
                        "k": len(k_losses),
                    })
            else:
                loss = run_step(
                    hard_step if use_hard_margin else train_step,
                    state, batch)
                dt = time.perf_counter() - t0
                losses.append(loss)
                if log_fn:
                    log_fn({
                        "step": state.step, "loss": loss, "structure": structure,
                        "phase": phase, "seconds": dt,
                    })

            if tracing and state.step >= trace_stop:
                jax.profiler.stop_trace()
                tracing = False
                trace_start = -1
                if log_fn:
                    log_fn({"step": state.step, "event": "trace_done",
                            "trace_dir": trace_dir})

            if phase == "burn_in" and check_conv(losses, tc.conv_tol):
                phase = "full"
                losses.clear()
                if pipeline is not None:
                    pipeline.stop()
                    pipeline = make_pipeline(phase)
                if log_fn:
                    log_fn({"step": state.step, "event": "burn_in_done"})

            if val_queries and state.step // tc.val_every > last_val_bucket:
                last_val_bucket = state.step // tc.val_every
                res = run_validation()
                metric = res.macro_auc
                if log_fn:
                    log_fn({"step": state.step, "val": res.flat()})
                if not np.isfinite(metric):
                    # no scoreable validation queries (e.g. raw val edges
                    # without sampled negatives): don't let NaN count as "no
                    # improvement" and silently early-stop / skip best-ckpt
                    if log_fn:
                        log_fn({"step": state.step,
                                "event": "val_unscoreable_skipped"})
                elif metric > best_val:
                    best_val = metric
                    bad_evals = 0
                    if checkpoint_fn:
                        checkpoint_fn(state, metric)
                else:
                    bad_evals += 1
                    if bad_evals >= tc.patience and phase == "full":
                        if log_fn:
                            log_fn({"step": state.step, "event": "early_stop"})
                        break
            elif phase == "full" and not val_queries and check_conv(losses, tc.conv_tol):
                break
    finally:
        # the profiler session must close even when the step raises
        # (device OOM, pipeline error, Ctrl-C): stop_trace is what
        # flushes the trace, and a leaked session breaks any retry
        if tracing:
            jax.profiler.stop_trace()
        if pipeline is not None:
            pipeline.stop()
    return state


def init_train_state(
    key: jax.Array, cfg, tc: TrainConfig,
    init_fn: Optional[Callable] = None,
) -> TrainState:
    params = (init_fn or mpqe_mod.init_mpqe)(key, cfg)
    optimizer = make_optimizer(tc)
    return TrainState(params=params, opt_state=optimizer.init(params))
