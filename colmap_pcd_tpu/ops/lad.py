"""Least absolute deviations (L1) fitting via ADMM, as one XLA program.

Re-designs optim/least_absolute_deviations.{h,cc} (SolveLeastAbsoluteDeviations,
least_absolute_deviations.h:66): min ||Ax - b||_1 by ADMM (Boyd et al.),
  x   <- (A^T A)^-1 A^T (b + z - u)
  z   <- shrink(A x_hat - b + u, 1/rho)
  u   <- u + A x_hat - b - z
with over-relaxation x_hat = alpha*Ax + (1-alpha)*(z_old + b).

The reference factorizes the sparse normal equations once with a sparse
Cholesky; here the problems are small and dense (frame fitting, robust
alignment), so we precompute a dense Cholesky factor and run the iteration
under lax.while_loop — one device program, no host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class LADOptions(NamedTuple):
    rho: float = 1.0            # augmented Lagrangian parameter
    alpha: float = 1.0          # over-relaxation (1.0 .. 1.8)
    max_num_iterations: int = 1000
    absolute_tolerance: float = 1e-4
    relative_tolerance: float = 1e-2


def _shrinkage(v: Array, kappa: float) -> Array:
    return jnp.maximum(0.0, v - kappa) - jnp.maximum(0.0, -v - kappa)


def solve_least_absolute_deviations(
    A: Array, b: Array, x0: Array | None = None, opts: LADOptions = LADOptions()
) -> Array:
    """min_x ||Ax - b||_1 for dense A [M,N] (M >= N, full column rank)."""
    A = jnp.asarray(A, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    M, N = A.shape
    x_init = jnp.zeros(N, jnp.float32) if x0 is None else jnp.asarray(x0, jnp.float32)

    AtA = A.T @ A + 1e-9 * jnp.eye(N, dtype=jnp.float32)
    L = jnp.linalg.cholesky(AtA)

    def x_update(rhs):
        y = jax.scipy.linalg.solve_triangular(L, A.T @ rhs, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

    sqrt_m = jnp.sqrt(jnp.asarray(float(M)))

    def body(state):
        x, z, u, it, _ = state
        x = x_update(b + z - u)
        Ax = A @ x
        Ax_hat = opts.alpha * Ax + (1.0 - opts.alpha) * (z + b)
        z_old = z
        z = _shrinkage(Ax_hat - b + u, 1.0 / opts.rho)
        u = u + Ax_hat - b - z
        r_norm = jnp.linalg.norm(Ax - z - b)
        s_norm = jnp.linalg.norm(-opts.rho * A.T @ (z - z_old))
        eps_pri = sqrt_m * opts.absolute_tolerance + opts.relative_tolerance * jnp.maximum(
            jnp.linalg.norm(Ax), jnp.maximum(jnp.linalg.norm(-z), jnp.linalg.norm(b))
        )
        eps_dual = sqrt_m * opts.absolute_tolerance + opts.relative_tolerance * jnp.linalg.norm(
            opts.rho * A.T @ u
        )
        done = (r_norm < eps_pri) & (s_norm < eps_dual)
        return x, z, u, it + 1, done

    def cond(state):
        *_, it, done = state
        return (it < opts.max_num_iterations) & (~done)

    z0 = jnp.zeros(M, jnp.float32)
    u0 = jnp.zeros(M, jnp.float32)
    x, *_ = jax.lax.while_loop(
        cond, body, (x_init, z0, u0, jnp.asarray(0, jnp.int32), jnp.asarray(False))
    )
    return x


solve_least_absolute_deviations_jit = jax.jit(
    solve_least_absolute_deviations, static_argnames=("opts",)
)
