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
from correrender_tpu.render.classify import classify, two_hot_weights
from correrender_tpu.render.tf import TransferFunction

#: Voxels × tf_size budget for the dense (V, R) weight intermediate —
#: past this the normal equations are accumulated in voxel slabs
#: (a 256³ field at R=256 would otherwise materialize a ~17 GB
#: tensor; round-3 review).
_DENSE_WEIGHT_ELEMS = 64 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("tf_size",))
def _normal_eq_slab(a_vals, b_vals, lut_a, domain_a, domain_b, tf_size):
    """One slab's contribution to the normal equations:
    (AᵀA, AᵀB) for rows two_hot(B[v]) and targets TF_A(A[v])."""
    target = classify(a_vals, lut_a, domain_a, premultiply=False)
    w = two_hot_weights(b_vals, domain_b, tf_size)
    ata = jnp.einsum("vr,vs->rs", w, w,
                     preferred_element_type=jnp.float32)
    atb = jnp.einsum("vr,vc->rc", w, target,
                     preferred_element_type=jnp.float32)
    return ata, atb, jnp.sum(target * target, axis=0)


def _normal_equations(a_vals, b_vals, tf_a, domain_b, tf_size):
    """Accumulate (AᵀA, AᵀB, Σtarget²) over voxel slabs so the dense
    (V, R) weight tensor never materializes past the budget."""
    v = a_vals.shape[0]
    slab = max(_DENSE_WEIGHT_ELEMS // max(tf_size, 1), 1)
    domain_a = jnp.asarray(tf_a.domain, jnp.float32)
    domain_b_arr = jnp.asarray(domain_b, jnp.float32)
    ata = jnp.zeros((tf_size, tf_size), jnp.float32)
    atb = jnp.zeros((tf_size, 4), jnp.float32)
    btb = jnp.zeros((4,), jnp.float32)
    for v0 in range(0, v, slab):
        pa, pb, pc = _normal_eq_slab(
            a_vals[v0 : v0 + slab], b_vals[v0 : v0 + slab],
            tf_a.lut, domain_a, domain_b_arr, tf_size,
        )
        ata, atb, btb = ata + pa, atb + pb, btb + pc
    return ata, atb, btb


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
      nonneg: clamp to a physically-valid (≥ 0) LUT via projected NNLS
        (dense solvers). With "cgls"/"lsqr" on a small problem the
        unconstrained iterative solution is merely CLIPPED to [0, 1]
        — choose a dense solver when true NNLS matters.
    """
    a_vals = field_a.reshape(-1)
    b_vals = field_b.reshape(-1)
    if domain_b is None:
        domain_b = (float(jnp.nanmin(b_vals)), float(jnp.nanmax(b_vals)))
    small = a_vals.shape[0] * tf_size <= _DENSE_WEIGHT_ELEMS
    if solver in ("cgls", "lsqr") and small:
        # Iterative solvers work on (w, target) directly — the (R, R)
        # normal equations are only formed for the dense/NNLS branches
        # (building them here anyway doubled the fit's dominant cost,
        # round-3 review), and the caller's iteration budget applies.
        target = classify(
            a_vals, tf_a.lut, jnp.asarray(tf_a.domain, jnp.float32),
            premultiply=False,
        )  # (V, 4)
        w = two_hot_weights(b_vals, domain_b, tf_size)  # (V, R)
        fn = solvers.cgls if solver == "cgls" else solvers.lsqr
        x = jnp.stack(
            [fn(w, target[:, c], iters=iters) for c in range(4)],
            axis=-1,
        )
    else:
        ata, atb, _ = _normal_equations(
            a_vals, b_vals, tf_a, domain_b, tf_size
        )
        if solver in ("cgls", "lsqr"):
            # Past the dense-weight budget the iterative solvers run
            # on the (R, R) normal equations instead (mathematically
            # the same least-squares solution; R ≤ 256 keeps the
            # squared conditioning benign).
            x = jnp.stack(
                [solvers.cgls(ata, atb[:, c], iters=iters)
                 for c in range(4)], axis=-1,
            )
        elif nonneg:
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
    """Adam/SGD on the voxel-matching loss (reference GD/OptimizerPass).

    The MSE over voxels is a quadratic in the LUT —
    ``(lutᵀAᵀA lut − 2 lutᵀAᵀB + BᵀB)/V`` — so the loop runs on the
    accumulated (R, R) normal equations: the gradient is identical to
    differentiating through the dense (V, R) weight matrix, without
    materializing it (or paying a V-sized matmul per epoch).
    """
    if optimizer not in ("adam", "sgd"):
        raise ValueError(
            f"unknown optimizer {optimizer!r}; one of adam/sgd"
        )
    a_vals = field_a.reshape(-1)
    b_vals = field_b.reshape(-1)
    if domain_b is None:
        domain_b = (float(jnp.nanmin(b_vals)), float(jnp.nanmax(b_vals)))
    ata, atb, _ = _normal_equations(
        a_vals, b_vals, tf_a, domain_b, tf_size
    )
    lut0 = jnp.full((tf_size, 4), 0.5, jnp.float32)
    lut = _gd_run(
        lut0, ata, atb,
        jnp.float32(a_vals.shape[0]), jnp.float32(learning_rate),
        n=int(epochs), use_adam=optimizer == "adam",
    )
    return TransferFunction(lut=lut, domain=tuple(domain_b))


# Module-level jit (lr and the normal equations are traced): per-call
# closures re-compiled the whole epoch loop on every interactive
# tf_optimize command (round-3 review).
@functools.partial(jax.jit, static_argnames=("n", "use_adam"))
def _gd_run(lut0, ata, atb, v_count, lr, n, use_adam):
    def grad_fn(lut):
        # d/dlut mean((w·lut − target)²) = 2 (AᵀA lut − AᵀB) / V
        return 2.0 * (ata @ lut - atb) / v_count

    def body(i, carry):
        lut, m, v = carry
        g = grad_fn(lut)
        if not use_adam:
            return jnp.clip(lut - lr * g, 0.0, 1.0), m, v
        t = (i + 1).astype(jnp.float32)
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        mhat = m / (1 - 0.9**t)
        vhat = v / (1 - 0.999**t)
        lut = lut - lr * mhat / (jnp.sqrt(vhat) + 1e-8)
        return jnp.clip(lut, 0.0, 1.0), m, v

    zeros = jnp.zeros_like(lut0)
    lut, _, _ = jax.lax.fori_loop(0, n, body, (lut0, zeros, zeros))
    return lut


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

    if loss not in ("l1", "l2"):
        raise ValueError(f"unknown loss {loss!r}; one of l1/l2")
    b_vals = field_b.reshape(-1)
    if domain_b is None:
        domain_b = (float(jnp.nanmin(b_vals)), float(jnp.nanmax(b_vals)))
    target = jax.lax.stop_gradient(
        dvr_render(field_a, camera, tf_a, image_size=image_size,
                   attenuation=attenuation)
    )
    lut0 = jnp.full((tf_size, 4), 0.5, jnp.float32)
    run = _diffdvr_program(camera, tuple(image_size), loss,
                           float(attenuation), int(epochs))
    lut = run(
        field_b, target, lut0,
        jnp.asarray(domain_b, jnp.float32),
        jnp.float32(learning_rate), jnp.float32(smoothing_weight),
    )
    return TransferFunction(lut=lut, domain=tuple(domain_b))


#: Compiled diffdvr epoch loops, keyed per static configuration (the
#: camera rides the trace as constants) — a per-call closure
#: re-compiled the whole renderer+adjoint graph on every interactive
#: tf_optimize command (round-3 review). Bounded: camera sweeps evict.
_DIFFDVR_PROGRAMS: dict = {}


def _diffdvr_program(camera, image_size, loss, attenuation, n):
    key = (camera.position, camera.look_at_point, camera.up,
           camera.fovy, camera.z_near, camera.z_far,
           image_size, loss, attenuation, n)
    run = _DIFFDVR_PROGRAMS.get(key)
    if run is not None:
        return run
    from correrender_tpu.render.dvr import dvr_render

    @jax.jit
    def run(field_b, target, lut0, domain, lr, sw):
        def loss_fn(lut):
            tf_b = TransferFunction(lut=lut, domain=domain)
            img = dvr_render(field_b, camera, tf_b,
                             image_size=image_size,
                             attenuation=attenuation)
            if loss == "l1":
                data_term = jnp.mean(jnp.abs(img - target))
            else:
                data_term = jnp.mean((img - target) ** 2)
            smooth = jnp.mean((lut[1:] - lut[:-1]) ** 2)
            return data_term + sw * smooth

        grad_fn = jax.grad(loss_fn)

        def body(i, carry):
            lut, m, v = carry
            g = grad_fn(lut)
            t = (i + 1).astype(jnp.float32)
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            mhat = m / (1 - 0.9**t)
            vhat = v / (1 - 0.999**t)
            lut = jnp.clip(
                lut - lr * mhat / (jnp.sqrt(vhat) + 1e-8),
                0.0, 1.0,
            )
            return lut, m, v

        zeros = jnp.zeros_like(lut0)
        lut, _, _ = jax.lax.fori_loop(0, n, body, (lut0, zeros, zeros))
        return lut

    if len(_DIFFDVR_PROGRAMS) >= 8:
        _DIFFDVR_PROGRAMS.clear()
    _DIFFDVR_PROGRAMS[key] = run
    return run


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
        self._closed = False
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
        """Enqueue a fit; returns a request id for matching the reply.

        Raises RuntimeError after shutdown(): the worker loop has
        exited, so a silently-enqueued request would never be
        processed and a blocking get_reply()/join() on it would hang.
        """
        if self._closed:
            raise RuntimeError(
                "TFOptimizationWorker.queue_request after shutdown()"
            )
        req_id = self._next_id
        self._next_id += 1
        self._requests.put((req_id, optimizer, args, kw))
        return req_id

    def get_reply(self, block: bool = False, timeout=None):
        """Poll for the next finished fit.

        Returns ``(request_id, result)`` or ``None`` when nothing is
        ready (reference getReply semantics). A failed fit re-raises
        its exception here, on the caller's thread, with the failing
        request's id attached as ``exc.request_id`` so callers with
        multiple outstanding requests can tell which one died.
        """
        import queue

        try:
            req_id, result, exc = self._replies.get(
                block=block, timeout=timeout
            )
        except queue.Empty:
            return None
        if exc is not None:
            exc.request_id = req_id
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
        self._closed = True
        self._requests.put(None)
        self._thread.join(timeout=5)
