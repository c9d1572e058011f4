"""In-process platform pinning for CLI entrypoints.

The image's sitecustomize registers the axon TPU PJRT plugin and
monkeypatches ``jax.get_backend`` so the axon backend is initialized
even when ``JAX_PLATFORMS`` selects another platform — and that init
BLOCKS indefinitely when the TPU relay is unreachable (observed during
a round-3 relay outage: ``JAX_PLATFORMS=cpu train.py`` subprocesses
hung inside ``_axon_get_backend_uncached``).  The documented escape
hatch (CLAUDE.md) is ``jax.config.update("jax_platforms", ...)``, which
the monkeypatch honors; this helper applies it in-process whenever the
env var asks for a non-axon platform, so subprocess-launched CLIs
(tests, tools/resilient_train.py supervision) behave the same as
in-process callers that already pin via jax.config.
"""

from __future__ import annotations

import os


def relay_alive(timeout_s: float = 150.0) -> bool:
    """Probe the default (axon) backend in a SUBPROCESS with a hard
    timeout.

    The relay can be down for hours (observed round 3), and a hung
    backend init cannot be interrupted in-process (it blocks inside the
    PJRT plugin's C extension) — so the probe must run out-of-process.
    Returns True iff a tiny jitted computation completes within
    ``timeout_s``.  ~10-60 s when the relay is healthy (one remote
    compile); the generous default absorbs a slow-but-alive relay.
    """
    import subprocess
    import sys

    code = (
        "import jax, jax.numpy as jnp\n"
        "print(float(jax.jit(lambda x: (x @ x).sum())"
        "(jnp.ones((128, 128)))))\n"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, timeout=timeout_s)
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False
    except OSError:
        return False


def pin_platform_from_env() -> None:
    """Honor a non-axon ``JAX_PLATFORMS`` env var in-process.

    No-op when the var is unset/empty or includes axon (the normal TPU
    path).  Call at the top of ``main()`` in every CLI entrypoint,
    before the first jax dispatch.
    """
    plats = os.environ.get("JAX_PLATFORMS", "").strip()
    if not plats or "axon" in plats:
        return
    import jax

    jax.config.update("jax_platforms", plats)
