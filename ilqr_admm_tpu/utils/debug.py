"""NaN/inf guards and debug instrumentation (SURVEY §5 race/NaN story).

The reference scatters ad-hoc NaN handling (`costs[isnan] = 1e5`
`isls.py:362`, `cs_[isnan] = 0` Tutorial c16). Here the line-search NaN
guard is built into the solvers; this module adds opt-in *detection*:

- `checked(fn)`: wrap a jitted function with `checkify` float checks so
  NaN/inf production raises with a location instead of propagating;
- `assert_finite(tree, name)`: host-side pytree finiteness assert;
- `debug_nan_hook()`: enable jax's global nan debugging for a scope.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Callable

import jax
from jax.experimental import checkify


def checked(fn: Callable) -> Callable:
    """Wrap fn so float errors (NaN/inf/div) raise structured errors.

    Returns a function with the same signature; call `.throw()` semantics
    are handled internally (errors raise ValueError on the host).
    """
    cfn = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_finite(tree, name: str = "value"):
    """Host-side finiteness check over a pytree (blocks on device values)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            key = jax.tree_util.keystr(path)
            raise FloatingPointError(
                f"{name}{key} contains {np.size(arr) - np.isfinite(arr).sum()} "
                f"non-finite entries"
            )


@contextmanager
def debug_nan_hook():
    """Scope with jax_debug_nans enabled (recompiles, host-synchronous)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
