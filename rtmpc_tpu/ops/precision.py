"""Explicit matmul precision for the numerically sensitive device path.

On TPU, JAX's *default* f32 matmul precision feeds the MXU single-pass
bf16 operands (~1e-2 relative error), while mat-vec products run exact
f32 on the VPU.  The same code therefore looks numerically fine unbatched
but silently degrades under ``vmap`` (a batched matvec IS a matmul) —
enough to destabilize the ADMM and interior-point iterations, whose KKT
operators are deliberately stiff (equality rows are weighted by
``rho_eq_scale ~ 1e3``), and to poison closed-loop trajectory parity.

Every matmul on the solve/protocol path therefore pins
``precision=HIGHEST`` (full f32 accumulation).  The operands here are
tiny (n <= a few hundred), so the extra MXU passes are negligible next to
HBM traffic; correctness is not.

Empirically on a v5 chip (see bench history): with default precision the
batched flagship rollout diverges to NaN on step 1; with HIGHEST it
matches the float64 CPU oracle to ~1e-5.
"""

import jax
import jax.numpy as jnp

__all__ = ["HIGHEST", "mm"]

HIGHEST = jax.lax.Precision.HIGHEST


def mm(a, b):
    """``a @ b`` with full-f32 accumulation on every backend."""
    return jnp.matmul(a, b, precision=HIGHEST)
