"""Backend dispatch for geometry math: numpy on the host, jnp on device.

The SAME formulas serve two callers: jitted device programs (pipelines,
bench) and per-item dataset math in loader worker processes. The workers
must never touch JAX — forked children of a JAX-initialized process
deadlock on inherited runtime locks, and per-item jnp dispatch would go to
the default (TPU) backend anyway. Each public geometry function therefore
picks its namespace from its inputs: all-numpy in -> numpy math out,
any JAX array/tracer in -> jnp math (with MXU-safe precision="highest").
"""
from __future__ import annotations

import numpy as np

_HOST_TYPES = (np.ndarray, np.generic, int, float, bool, list, tuple,
               type(None))


def array_namespace(*arrays):
    """numpy iff every input is host data; jnp otherwise (incl. tracers)."""
    for a in arrays:
        if not isinstance(a, _HOST_TYPES):
            import jax.numpy as jnp

            return jnp
    return np


def einsum(xp, subscripts, *operands):
    """einsum with precision='highest' on the jnp path (TPU einsum defaults
    to bf16 accumulation; geometry needs f32)."""
    if xp is np:
        return np.einsum(subscripts, *operands)
    return xp.einsum(subscripts, *operands, precision="highest")
