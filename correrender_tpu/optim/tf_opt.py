"""Transfer-function optimization.

Fit an RGBA LUT for field B such that B's rendering matches field A
rendered with a known TF. Reference: src/Optimization/TFOptimization.*
(worker-thread request/reply GUI harness) with methods OLS / GD /
DiffDVR (OptDefines.hpp:32-40); TF sizes from ``possibleTfSizes``
{2..256} (TFOptimization.hpp:47-49).

The linear model (OLS/GD): every voxel constrains
``two_hot(B[v]) · X ≈ TF_A(A[v])`` — rows are voxel TF-bin weights,
exactly the reference's normal-equation construction
(Data/Shaders/TF/NormalEquations.glsl), built here as two MXU
contractions. DiffDVR differentiates the *actual renderer* instead
(jax.grad through render/dvr.py — the reference needed a hand-written
adjoint GLSL pass for this).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from correrender_tpu.optim import solvers
from correrender_tpu.render.classify import classify
from correrender_tpu.render.tf import TransferFunction


def _two_hot(values: jnp.ndarray, domain, resolution: int) -> jnp.ndarray:
    lo, hi = domain
    u = jnp.clip((values - lo) / (hi - lo), 0.0, 1.0) * (resolution - 1)
    u = jnp.where(jnp.isnan(values), -2.0, u)
    bins = jnp.arange(resolution, dtype=jnp.float32)
    return jnp.maximum(1.0 - jnp.abs(u[..., None] - bins), 0.0)


def optimize_tf_ols(
    field_a: jnp.ndarray,
    tf_a: TransferFunction,
    field_b: jnp.ndarray,
    tf_size: int = 64,
    domain_b=None,
    solver: str = "cholesky",
    nonneg: bool = True,
    iters: int = 200,
) -> TransferFunction:
    """Least-squares TF fit (reference TFOptimizerOLS).

    Args:
      field_a: ``(Z, Y, X)`` source field with known TF ``tf_a``.
      field_b: ``(Z, Y, X)`` target field to fit a TF for.
      tf_size: LUT resolution of the fitted TF.
      solver: "cholesky" | "lu" | "qr" | "svd" | "cgls" | "lsqr".
      nonneg: clamp to a physically-valid (≥ 0) LUT via projected NNLS.
    """
    a_vals = field_a.reshape(-1)
    b_vals = field_b.reshape(-1)
    if domain_b is None:
        domain_b = (float(jnp.nanmin(b_vals)), float(jnp.nanmax(b_vals)))
    target = classify(
        a_vals, tf_a.lut, jnp.asarray(tf_a.domain, jnp.float32),
        premultiply=False,
    )  # (V, 4)
    w = _two_hot(b_vals, domain_b, tf_size)  # (V, R)
    if solver in ("cgls", "lsqr"):
        # Iterative solvers work on (w, target) directly — the (R, R)
        # normal equations are only formed for the dense/NNLS branches
        # (building them here anyway doubled the fit's dominant cost,
        # round-3 review), and the caller's iteration budget applies.
        fn = solvers.cgls if solver == "cgls" else solvers.lsqr
        x = jnp.stack(
            [fn(w, target[:, c], iters=iters) for c in range(4)],
            axis=-1,
        )
    else:
        ata = jnp.einsum("vr,vs->rs", w, w,
                         preferred_element_type=jnp.float32)
        atb = jnp.einsum("vr,vc->rc", w, target,
                         preferred_element_type=jnp.float32)
        if nonneg:
            x = jnp.stack(
                [solvers.solve_nonneg(ata, atb[:, c], iters=iters)
                 for c in range(4)], axis=-1,
            )
        else:
            x = solvers.solve_dense(ata, atb, solver)
    lut = jnp.clip(x, 0.0, 1.0)
    return TransferFunction(lut=lut, domain=tuple(domain_b))


def optimize_tf_gd(
    field_a,
    tf_a: TransferFunction,
    field_b,
    tf_size: int = 64,
    domain_b=None,
    epochs: int = 200,
    learning_rate: float = 0.05,
    optimizer: str = "adam",
) -> TransferFunction:
    """Adam/SGD on the voxel-matching loss (reference GD/OptimizerPass)."""
    a_vals = field_a.reshape(-1)
    b_vals = field_b.reshape(-1)
    if domain_b is None:
        domain_b = (float(jnp.nanmin(b_vals)), float(jnp.nanmax(b_vals)))
    target = classify(
        a_vals, tf_a.lut, jnp.asarray(tf_a.domain, jnp.float32),
        premultiply=False,
    )
    w = _two_hot(b_vals, domain_b, tf_size)

    def loss_fn(lut):
        pred = w @ lut
        return jnp.mean((pred - target) ** 2)

    lut0 = jnp.full((tf_size, 4), 0.5, jnp.float32)
    grad_fn = jax.grad(loss_fn)
    use_adam = optimizer == "adam"

    # One jit around the whole epoch loop: the step counter must stay
    # a traced value — as a Python int it re-specializes (and on TPU
    # re-COMPILES) every epoch.
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(lut, n):
        def body(i, carry):
            lut, m, v = carry
            g = grad_fn(lut)
            if not use_adam:
                return jnp.clip(lut - learning_rate * g, 0.0, 1.0), m, v
            t = (i + 1).astype(jnp.float32)
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            mhat = m / (1 - 0.9**t)
            vhat = v / (1 - 0.999**t)
            lut = lut - learning_rate * mhat / (jnp.sqrt(vhat) + 1e-8)
            return jnp.clip(lut, 0.0, 1.0), m, v

        zeros = jnp.zeros_like(lut)
        lut, _, _ = jax.lax.fori_loop(0, n, body, (lut, zeros, zeros))
        return lut

    return TransferFunction(lut=run(lut0, epochs), domain=tuple(domain_b))


def optimize_tf_diffdvr(
    field_a,
    tf_a: TransferFunction,
    field_b,
    camera,
    tf_size: int = 32,
    domain_b=None,
    epochs: int = 60,
    learning_rate: float = 0.1,
    image_size=(64, 64),
    smoothing_weight: float = 1e-3,
    loss: str = "l2",
    attenuation: float = 100.0,
) -> TransferFunction:
    """Differentiable-DVR TF fit: gradients through the ray-marcher.

    The reference implements forward + adjoint GLSL passes with an
    image loss and a smoothing prior (src/Optimization/DiffDVR/,
    Data/Shaders/TF/DvrForward.glsl / DvrAdjoint.glsl / Loss.glsl /
    SmoothingPrior.glsl); here the adjoint is jax.grad of the same
    renderer used for display (the BASELINE.json north-star item).
    """
    from correrender_tpu.render.dvr import dvr_render

    b_vals = field_b.reshape(-1)
    if domain_b is None:
        domain_b = (float(jnp.nanmin(b_vals)), float(jnp.nanmax(b_vals)))
    target = jax.lax.stop_gradient(
        dvr_render(field_a, camera, tf_a, image_size=image_size,
                   attenuation=attenuation)
    )

    def render_with(lut):
        tf_b = TransferFunction(lut=lut, domain=tuple(domain_b))
        return dvr_render(field_b, camera, tf_b, image_size=image_size,
                          attenuation=attenuation)

    def loss_fn(lut):
        img = render_with(lut)
        if loss == "l1":
            data_term = jnp.mean(jnp.abs(img - target))
        else:
            data_term = jnp.mean((img - target) ** 2)
        smooth = jnp.mean((lut[1:] - lut[:-1]) ** 2)
        return data_term + smoothing_weight * smooth

    lut0 = jnp.full((tf_size, 4), 0.5, jnp.float32)
    grad_fn = jax.grad(loss_fn)

    # Single jit over all epochs (one compile, one dispatch — the
    # per-epoch Python loop costs a tunnel round-trip per op here).
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(lut, n):
        def body(i, carry):
            lut, m, v = carry
            g = grad_fn(lut)
            t = (i + 1).astype(jnp.float32)
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            mhat = m / (1 - 0.9**t)
            vhat = v / (1 - 0.999**t)
            lut = jnp.clip(
                lut - learning_rate * mhat / (jnp.sqrt(vhat) + 1e-8),
                0.0, 1.0,
            )
            return lut, m, v

        zeros = jnp.zeros_like(lut)
        lut, _, _ = jax.lax.fori_loop(0, n, body, (lut, zeros, zeros))
        return lut

    return TransferFunction(lut=run(lut0, epochs), domain=tuple(domain_b))


@dataclasses.dataclass
class TFOptimizer:
    """Request/execute wrapper mirroring the reference's
    TFOptimizationWorker settings surface (method, TF size, epochs)."""

    method: str = "ols"  # "ols" | "gd" | "diffdvr"
    tf_size: int = 64
    epochs: int = 200
    solver: str = "cholesky"

    POSSIBLE_TF_SIZES = (2, 4, 8, 16, 32, 64, 128, 256)

    def run(self, field_a, tf_a, field_b, camera=None, **kw):
        if self.tf_size not in self.POSSIBLE_TF_SIZES:
            raise ValueError(
                f"tf_size must be one of {self.POSSIBLE_TF_SIZES}"
            )
        if self.method == "ols":
            return optimize_tf_ols(
                field_a, tf_a, field_b, self.tf_size,
                solver=self.solver, **kw,
            )
        if self.method == "gd":
            return optimize_tf_gd(
                field_a, tf_a, field_b, self.tf_size,
                epochs=self.epochs, **kw,
            )
        if self.method == "diffdvr":
            if camera is None:
                raise ValueError("diffdvr needs a camera")
            return optimize_tf_diffdvr(
                field_a, tf_a, field_b, camera, self.tf_size,
                epochs=min(self.epochs, 100), **kw,
            )
        raise ValueError(f"unknown method {self.method!r}")


class TFOptimizationWorker:
    """Background TF-optimization worker with a request/reply queue.

    Mirrors the reference's dedicated worker thread
    (src/Optimization/TFOptimization.hpp:51-90: ``queueRequest`` from
    the GUI thread, non-blocking ``getReply`` polled per frame) so an
    interactive frontend never blocks on a fit. One daemon thread
    drains requests in order; replies carry the request id.
    """

    def __init__(self):
        import queue
        import threading

        self._requests: "queue.Queue" = queue.Queue()
        self._replies: "queue.Queue" = queue.Queue()
        self._next_id = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        while True:
            item = self._requests.get()
            if item is None:
                self._requests.task_done()
                return
            req_id, optimizer, args, kw = item
            try:
                result = optimizer.run(*args, **kw)
                self._replies.put((req_id, result, None))
            except Exception as exc:  # surfaced via get_reply
                self._replies.put((req_id, None, exc))
            finally:
                self._requests.task_done()

    def queue_request(self, optimizer: "TFOptimizer", *args, **kw) -> int:
        """Enqueue a fit; returns a request id for matching the reply."""
        req_id = self._next_id
        self._next_id += 1
        self._requests.put((req_id, optimizer, args, kw))
        return req_id

    def get_reply(self, block: bool = False, timeout=None):
        """Poll for the next finished fit.

        Returns ``(request_id, result)`` or ``None`` when nothing is
        ready (reference getReply semantics). A failed fit re-raises
        its exception here, on the caller's thread.
        """
        import queue

        try:
            req_id, result, exc = self._replies.get(
                block=block, timeout=timeout
            )
        except queue.Empty:
            return None
        if exc is not None:
            raise exc
        return req_id, result

    def join(self, timeout=None):
        """Block until all queued requests are processed.

        Uses the queue's unfinished-task counter (``task_done`` in
        ``_loop``) so an in-flight fit — already dequeued but still
        running — also blocks ``join``.
        """
        import time as _time

        if timeout is None:
            self._requests.join()
            return
        deadline = _time.time() + timeout
        while self._requests.unfinished_tasks:
            if _time.time() > deadline:
                return
            _time.sleep(0.01)

    def shutdown(self):
        self._requests.put(None)
        self._thread.join(timeout=5)
