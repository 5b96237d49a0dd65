"""Device-safe constant materialization.

This environment's TPU backend cannot move complex64 over the host↔device
wire (see core/runtime.to_host).  Large traced constants are hoisted by jax
into runtime parameters — so a complex numpy constant (DFT matrix, FFT'd tap
vector, tone table) closed over by a jitted function becomes a *complex
upload* and poisons the session.  `jnp_const` ships real/imag planes and
recombines on device.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["jnp_const"]


def jnp_const(x) -> jax.Array:
    x = np.asarray(x)
    if np.iscomplexobj(x):
        return jax.lax.complex(
            jnp.asarray(np.ascontiguousarray(x.real).astype(np.float32)),
            jnp.asarray(np.ascontiguousarray(x.imag).astype(np.float32)),
        )
    return jnp.asarray(x)
