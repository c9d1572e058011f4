"""Debug & numerical-safety utilities ("sanitizer" analog; SURVEY.md §5).

The reference has no race detection or sanitizers.  The TPU build's
equivalents:

  * ``checked(fn)`` — checkify-wrapped jit: NaN/Inf and out-of-bounds
    index errors become Python exceptions with locations instead of
    silent garbage;
  * ``assert_all_finite`` — host-side pytree guard for tests/loops;
  * ``pallas_interpret()`` — context manager forcing all Pallas kernels
    through the interpreter (the Pallas "sanitizer" mode);
  * deterministic seeding helpers (jax.random threefry keys are already
    deterministic; this pins numpy/host RNG too).
"""

from __future__ import annotations

import contextlib
import random
from typing import Any, Callable

import jax
import numpy as np
from jax.experimental import checkify


def checked(fn: Callable, *jit_kwargs_static, **jit_kwargs) -> Callable:
    """checkify + jit: returned fn raises on NaN/Inf/OOB with location."""
    errs = checkify.float_checks | checkify.index_checks
    cfn = checkify.checkify(fn, errors=errs)
    jfn = jax.jit(cfn, **jit_kwargs)

    def wrapper(*args, **kw):
        err, out = jfn(*args, **kw)
        err.throw()
        return out

    return wrapper


def assert_all_finite(tree: Any, name: str = "pytree") -> None:
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad = np.count_nonzero(~np.isfinite(arr))
            raise FloatingPointError(
                f"{name}{jax.tree_util.keystr(path)}: {bad} non-finite values"
            )


@contextlib.contextmanager
def pallas_interpret():
    """Force Pallas kernels through the interpreter (debugging on any
    backend; catches OOB reads the compiled kernel would silently mask)."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def seed_everything(seed: int) -> jax.Array:
    """Pin host RNGs and return a root JAX key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
