"""Golden-image regression tests for the renderers.

Small deterministic scenes rendered on CPU and compared against stored
arrays (tests/goldens/*.npz). Regenerate intentionally with:

    python tests/test_goldens.py regenerate

A renderer change that shifts output must update the goldens in the
same commit (and justify the shift).
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _scenes():
    from scipy.ndimage import gaussian_filter

    from correrender_tpu.render import Camera, TransferFunction
    from correrender_tpu.render.dvr import dvr_render
    from correrender_tpu.render.dvr_fast import dvr_shearwarp
    from correrender_tpu.render.iso import iso_render
    from correrender_tpu.render.iso_fast import iso_shearwarp

    rng = np.random.default_rng(7)
    vol = jnp.asarray(
        gaussian_filter(rng.uniform(size=(24, 24, 24)).astype(np.float32),
                        2.0)
    )
    n = 24
    z, y, x = np.meshgrid(*[np.linspace(0, 1, n)] * 3, indexing="ij")
    sphere = jnp.asarray(
        np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2).astype(
            np.float32
        )
    )
    cam = Camera(position=(0.1, 0.25, 0.85))
    tf = TransferFunction.from_colormap(
        "coolwarm", domain=(0.0, 1.0),
        opacity_points=((0.0, 0.0), (1.0, 0.9)),
    )
    size = (64, 48)
    return {
        "dvr_marcher": lambda: dvr_render(
            vol, cam, tf, image_size=size, voxel_step=0.5,
            background=(0, 0, 0, 0),
        ),
        "dvr_shearwarp": lambda: dvr_shearwarp(
            vol, cam, tf, image_size=size, background=(0, 0, 0, 0)
        ),
        "iso_marcher": lambda: iso_render(
            sphere, cam, 0.3, image_size=size, background=(0, 0, 0, 0)
        ),
        "iso_shearwarp": lambda: iso_shearwarp(
            sphere, cam, 0.3, image_size=size, background=(0, 0, 0, 0)
        ),
    }


@pytest.mark.parametrize("name", list(_scenes().keys()))
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated yet")
    got = np.asarray(_scenes()[name]())
    want = np.load(path)["image"]
    # Tolerate tiny numeric drift; structural changes must fail.
    assert got.shape == want.shape
    diff = np.abs(got - want)
    assert diff.mean() < 5e-3, f"{name}: mean drift {diff.mean():.5f}"
    assert (diff > 0.1).mean() < 0.01, (
        f"{name}: {100 * (diff > 0.1).mean():.2f}% pixels changed > 0.1"
    )


def regenerate():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, fn in _scenes().items():
        np.savez_compressed(
            os.path.join(GOLDEN_DIR, f"{name}.npz"),
            image=np.asarray(fn()),
        )
        print(f"wrote {name}")


if __name__ == "__main__":
    # Usage: PYTHONPATH=. python tests/test_goldens.py regenerate
    if len(sys.argv) > 1 and sys.argv[1] == "regenerate":
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, repo)
        import jax

        jax.config.update("jax_platforms", "cpu")
        regenerate()
