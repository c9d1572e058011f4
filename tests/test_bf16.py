"""bf16 compute path: model trains and evaluates in bfloat16 params."""

import jax
import jax.numpy as jnp
import numpy as np

from mpqe_tpu.data.sampler import QuerySampler, make_random_kg
from mpqe_tpu.models import mpqe as mpqe_mod
from mpqe_tpu.queries import group_queries_by_formula
from mpqe_tpu.train import evaluation
from mpqe_tpu.train import loop as loop_mod


def test_bf16_training_decreases_loss():
    kg = make_random_kg(n_entities=100, n_modes=2, n_base_rels=3,
                        n_triples=200, seed=41)
    sampler = QuerySampler(kg, seed=1)
    train_q = group_queries_by_formula(
        sampler.sample_queries("1-chain", 200, n_neg=8))
    cfg = mpqe_mod.MPQEConfig(
        n_entities=kg.n_entities, n_modes=kg.n_modes, n_rels=kg.n_rels,
        embed_dim=32, n_layers=1, readout="sum", dtype=jnp.bfloat16,
    )
    tc = loop_mod.TrainConfig(lr=0.01, batch_size=64, n_neg=4,
                              max_steps=150, conv_tol=-1.0, val_every=10_000)
    state = loop_mod.init_train_state(jax.random.PRNGKey(0), cfg, tc)
    assert state.params["emb"]["ent"].dtype == jnp.bfloat16
    losses = []
    state = loop_mod.run_train(
        state, cfg, tc, train_q,
        log_fn=lambda r: losses.append(r["loss"]) if "loss" in r else None,
    )
    assert np.mean(losses[-20:]) < 0.5 * np.mean(losses[:20])
    # eval still works (scores computed fp32 internally)
    res = evaluation.evaluate(state.params, cfg, train_q, n_neg=8)
    assert res.macro_auc > 0.8
