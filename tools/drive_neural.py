"""Drive the neural correlation calculator end-to-end on hardware.

Trains the SRN surrogate against the classical estimator on a
synthetic correlated ensemble (the SSDBM'24-style loop in
calculators/neural.py::fit), then scores the surrogate field against
the classical Pearson field at held-out reference points. Records
training wall time + field PSNR — the end-to-end evidence that the
neural path runs at realistic sizes on the chip, not just in unit
tests.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def main(grid=48, members=100, steps=3000, refs=48):
    print(jax.devices())
    from correrender_tpu.core.fields import VolumeData, GridMetadata
    from correrender_tpu.calculators.neural import (
        NeuralCorrelationCalculator,
    )
    from correrender_tpu.calculators.correlation import correlate_field

    rng = np.random.default_rng(0)
    # Smoothly varying correlation structure: latent field + noise
    # whose mixing weight varies over the volume.
    base = rng.standard_normal((1, 1, 1, members)).astype(np.float32)
    zz, yy, xx = np.meshgrid(
        np.linspace(0, 1, grid), np.linspace(0, 1, grid),
        np.linspace(0, 1, grid), indexing="ij",
    )
    w = (0.2 + 0.8 * np.sin(3 * xx) * np.cos(2 * yy + zz))[..., None]
    stack = (w * base + np.sqrt(np.maximum(1 - w * w, 0.0))
             * rng.standard_normal((grid, grid, grid, members))
             ).astype(np.float32)

    vd = VolumeData(GridMetadata(xs=grid, ys=grid, zs=grid,
                                 ts=1, es=members))
    vd.add_field("f", lambda t, e: stack[..., e])

    calc = NeuralCorrelationCalculator(
        field_name="f", measure="pearson", train_steps=steps,
    )
    vd.add_calculator(calc)

    t0 = time.perf_counter()
    loss = calc.fit(num_reference_points=refs, seed=1)
    # fit() is async at the tail: sync BEFORE taking t1, or the queued
    # final steps execute during the first eval and skew both numbers
    # (block_until_ready does not block on the axon backend — sum the
    # loss/params instead).
    jax.tree_util.tree_map(
        lambda a: float(jnp.sum(jnp.abs(a))), calc.params)
    t1 = time.perf_counter()

    # Held-out evaluation: 8 fresh reference points.
    errs, rng2 = [], np.random.default_rng(7)
    for _ in range(8):
        x, y, z = (int(v) for v in rng2.integers(4, grid - 4, 3))
        calc.set_reference_point(x, y, z)
        pred = np.asarray(calc.compute(0, 0))
        truth = np.asarray(
            correlate_field(jnp.asarray(stack), jnp.asarray(stack[z, y, x]),
                            "pearson")
        )
        ok = np.isfinite(pred) & np.isfinite(truth)
        errs.append(np.mean((pred[ok] - truth[ok]) ** 2))
    t2 = time.perf_counter()
    mse = float(np.mean(errs))
    psnr = 10 * np.log10(4.0 / mse)  # range of corr values is 2
    print(
        f"grid={grid}^3 members={members} steps={steps} refs={refs}: "
        f"train={t1 - t0:.1f}s eval8={t2 - t1:.1f}s "
        f"final_loss={float(loss):.5f} heldout_mse={mse:.5f} "
        f"psnr={psnr:.1f} dB"
    )


if __name__ == "__main__":
    main()
