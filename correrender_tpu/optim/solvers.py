"""Least-squares solvers in JAX.

Role parity with the reference's solver zoo (src/Optimization/OLS/:
Eigen dense LU/QR/Chol/SVD, QuadProg++/eigen-qp/OSQP for
non-negativity, and the custom CUDA CGLS/LSQR kernels
OLS/CudaSolver.cu, cgls.cuh, lsqr.cuh). Here every solver is a jitted
JAX function; the iterative ones work matrix-free on normal-equation
products and the QP is a projected-gradient scheme.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("iters",))
def cgls(a: jnp.ndarray, b: jnp.ndarray, iters: int = 100,
         shift: float = 0.0):
    """Conjugate-gradient least squares for min ‖Ax − b‖² + shift‖x‖²."""
    at_b = a.T @ b
    x0 = jnp.zeros_like(at_b)

    def body(_, state):
        x, r, p, gamma = state
        q = a @ p
        delta = jnp.sum(q * q) + shift * jnp.sum(p * p)
        alpha = gamma / jnp.maximum(delta, 1e-30)
        x = x + alpha * p
        r = r - alpha * q
        s = a.T @ r - shift * x
        gamma_new = jnp.sum(s * s)
        beta = gamma_new / jnp.maximum(gamma, 1e-30)
        p = s + beta * p
        return x, r, p, gamma_new

    r0 = b - a @ x0
    s0 = a.T @ r0
    state = (x0, r0, s0, jnp.sum(s0 * s0))
    x, *_ = jax.lax.fori_loop(0, iters, body, state)
    return x


@functools.partial(jax.jit, static_argnames=("iters",))
def lsqr(a: jnp.ndarray, b: jnp.ndarray, iters: int = 100):
    """Golub–Kahan LSQR for min ‖Ax − b‖² (single right-hand side)."""
    beta = jnp.linalg.norm(b)
    u = b / jnp.maximum(beta, 1e-30)
    v_vec = a.T @ u
    alpha = jnp.linalg.norm(v_vec)
    v_vec = v_vec / jnp.maximum(alpha, 1e-30)
    w = v_vec
    x = jnp.zeros(a.shape[1], a.dtype)
    phi_bar = beta
    rho_bar = alpha

    def body(_, state):
        x, w, u, v, alpha, phi_bar, rho_bar = state
        u_new = a @ v - alpha * u
        beta = jnp.linalg.norm(u_new)
        u_new = u_new / jnp.maximum(beta, 1e-30)
        v_new = a.T @ u_new - beta * v
        alpha_new = jnp.linalg.norm(v_new)
        v_new = v_new / jnp.maximum(alpha_new, 1e-30)
        rho = jnp.sqrt(rho_bar**2 + beta**2)
        c = rho_bar / rho
        s = beta / rho
        theta = s * alpha_new
        rho_bar_new = -c * alpha_new
        phi = c * phi_bar
        phi_bar_new = s * phi_bar
        x = x + (phi / rho) * w
        w = v_new - (theta / rho) * w
        return x, w, u_new, v_new, alpha_new, phi_bar_new, rho_bar_new

    state = (x, w, u, v_vec, alpha, phi_bar, rho_bar)
    x, *_ = jax.lax.fori_loop(0, iters, body, state)
    return x


@functools.partial(jax.jit, static_argnames=("iters",))
def solve_nonneg(ata: jnp.ndarray, atb: jnp.ndarray, iters: int = 200):
    """Non-negative least squares on normal equations via projected
    gradient with Lipschitz step (replaces QuadProg++/eigen-qp/OSQP).

    The Lipschitz constant comes from power iteration and the warm
    start from a Cholesky solve: SVD/LU lowerings take minutes to
    compile on TPU, power iteration + Cholesky compile in seconds."""
    v = jnp.ones((ata.shape[0],), ata.dtype)

    def power(_, v):
        w = ata @ v
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = jax.lax.fori_loop(0, 30, power, v)
    lip = v @ (ata @ v)  # Rayleigh quotient ≈ λ_max (ata is PSD)
    step = 1.0 / jnp.maximum(lip, 1e-30)
    reg = ata + 1e-6 * jnp.eye(ata.shape[0], dtype=ata.dtype)
    chol = jax.scipy.linalg.cho_factor(reg)
    x0 = jnp.maximum(jax.scipy.linalg.cho_solve(chol, atb), 0.0)

    def body(_, x):
        grad = ata @ x - atb
        return jnp.maximum(x - step * grad, 0.0)

    return jax.lax.fori_loop(0, iters, body, x0)


def solve_dense(ata, atb, method: str = "cholesky"):
    """Direct normal-equation solvers (Eigen-parity: lu/cholesky/qr/svd).

    Default cholesky compiles in seconds on TPU; lu/qr/svd lowerings
    can take minutes to compile there — prefer them on CPU only.
    """
    reg = ata + 1e-8 * jnp.eye(ata.shape[0])
    if method in ("cholesky", "chol"):
        c = jnp.linalg.cholesky(reg)
        return jax.scipy.linalg.cho_solve((c, True), atb)
    if method == "lu":
        return jnp.linalg.solve(reg, atb)
    if method == "qr":
        q, r = jnp.linalg.qr(reg)
        return jax.scipy.linalg.solve_triangular(r, q.T @ atb, lower=False)
    if method == "svd":
        return jnp.linalg.lstsq(reg, atb)[0]
    raise ValueError(f"unknown dense solver {method!r}")
