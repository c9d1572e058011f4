"""Aux subsystems: profiling roofline, checkify guards, metrics writer."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpqe_tpu.train.metrics import MetricsWriter
from mpqe_tpu.utils import debug as debug_mod
from mpqe_tpu.utils import profiling


def test_roofline_sanity():
    r = profiling.rgcn_dense_roofline(
        batch=131072, n_nodes=4, n_edges=3, steps=2, d=128,
        n_entities=1_000_000,
    )
    assert r.flops > 0 and r.hbm_bytes > 0
    assert r.min_seconds == max(r.compute_s, r.memory_s)
    assert r.bound in ("memory", "compute")


def test_loop_time_monotonic_workload():
    # per-iteration work must dominate host dispatch noise on a loaded
    # CPU (an 8x8 loop body was below noise and flaked); a 256x256
    # matmul chain over a wide n gap gives a robustly positive delta
    @jax.jit
    def step(n):
        x = jnp.ones((256, 256))

        def body(i, acc):
            return acc @ x + 1.0

        return jnp.sum(jax.lax.fori_loop(0, n, body, x))

    dt = profiling.loop_time(step, n_small=2, n_large=202)
    assert 0 < dt < 1.0


def test_checked_raises_on_nan():
    def f(x):
        return jnp.log(x)  # nan for negative input

    cf = debug_mod.checked(f)
    np.testing.assert_allclose(np.asarray(cf(jnp.asarray(2.0))), np.log(2.0))
    with pytest.raises(Exception):
        cf(jnp.asarray(-1.0))


def test_assert_all_finite():
    good = {"a": jnp.ones(3), "b": [jnp.zeros(2)]}
    debug_mod.assert_all_finite(good)
    bad = {"a": jnp.asarray([1.0, np.nan])}
    with pytest.raises(FloatingPointError):
        debug_mod.assert_all_finite(bad)


def test_metrics_writer(tmp_path):
    with MetricsWriter(str(tmp_path / "run")) as m:
        m.write_config({"lr": 0.1, "nested": {"x": np.float32(2.0)}})
        m.log({"step": 1, "loss": np.float32(0.5)})
        m.log({"step": 2, "loss": 0.25, "structure": "1-chain"})
    lines = open(tmp_path / "run" / "metrics.jsonl").read().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["step"] == 1 and abs(rec["loss"] - 0.5) < 1e-9 and "ts" in rec
    cfgf = json.load(open(tmp_path / "run" / "config.json"))
    assert cfgf["nested"]["x"] == 2.0


def test_step_timer():
    t = profiling.StepTimer()
    for _ in range(5):
        with t.measure():
            pass
    s = t.summary()
    assert s["steps"] == 5 and s["p95_s"] >= 0


def test_pin_platform_from_env(monkeypatch):
    # cpu (or any non-axon list) is pinned in-process; axon/empty are
    # no-ops — sitecustomize's axon monkeypatch otherwise initializes
    # the TPU backend even under JAX_PLATFORMS=cpu, and that init hangs
    # when the relay is down (mpqe_tpu/utils/platform.py)
    import jax

    from mpqe_tpu.utils.platform import pin_platform_from_env

    calls = []
    monkeypatch.setattr(jax.config, "update",
                        lambda k, v: calls.append((k, v)))
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    pin_platform_from_env()
    assert calls == [("jax_platforms", "cpu")]

    calls.clear()
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    pin_platform_from_env()
    monkeypatch.setenv("JAX_PLATFORMS", "")
    pin_platform_from_env()
    monkeypatch.delenv("JAX_PLATFORMS")
    pin_platform_from_env()
    assert calls == []
