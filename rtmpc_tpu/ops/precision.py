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

``HIGH`` (3-pass bf16, ~1e-6-class error) is ~1.5x faster end-to-end and
empirically stable on the shipped benchmarks (feasibility and residuals
match HIGHEST; trajectories agree to f32 solver tolerance) — select it
with ``set_matmul_precision("high")`` or ``RTMPC_MATMUL_PRECISION=high``.
The default stays HIGHEST: single-pass bf16 (``"default"``) is known to
diverge and is rejected.
"""

import os

import jax
import jax.numpy as jnp

__all__ = ["HIGHEST", "mm", "set_matmul_precision", "get_matmul_precision"]

HIGHEST = jax.lax.Precision.HIGHEST

_VALID = {"high": jax.lax.Precision.HIGH,
          "highest": jax.lax.Precision.HIGHEST}


def _resolve(name: str) -> jax.lax.Precision:
    key = str(name).lower()
    if key not in _VALID:
        raise ValueError(
            f"invalid matmul precision {name!r}: valid values are "
            f"{sorted(_VALID)} ('default'/single-pass bf16 is rejected — "
            "it diverges on the solve path, see module docstring)")
    return _VALID[key]


_PRECISION = _resolve(os.environ.get("RTMPC_MATMUL_PRECISION", "highest"))
_mm_traced = False      # set once mm() has been traced under jit


def set_matmul_precision(name: str) -> None:
    """Set the solve-path matmul precision: "high" or "highest".

    Takes effect at trace time — call before jitting/compiling rollouts.
    The precision is baked into compiled functions; changing it afterwards
    only affects NEW traces (jit caches keyed on the same function/shapes
    keep the old precision), so a warning is emitted in that case.
    """
    global _PRECISION
    new = _resolve(name)
    if _mm_traced and new != _PRECISION:
        import warnings
        warnings.warn(
            "set_matmul_precision() called after solve-path functions were "
            "already traced: existing jit caches keep the previous "
            "precision. Call jax.clear_caches() (or re-create the jitted "
            "functions) for the change to take effect.",
            RuntimeWarning, stacklevel=2)
    _PRECISION = new


def get_matmul_precision() -> str:
    return ("high" if _PRECISION == jax.lax.Precision.HIGH else "highest")


def mm(a, b):
    """``a @ b`` with (at least) 3-pass-bf16 accumulation on every
    backend — never the divergence-inducing single-pass default."""
    global _mm_traced
    if not _mm_traced and isinstance(a, jax.core.Tracer):
        _mm_traced = True
    return jnp.matmul(a, b, precision=_PRECISION)
