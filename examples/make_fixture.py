#!/usr/bin/env python3
"""Generate the linear_4x4 synthetic box ensemble.

Same planted-correlation design as the reference's
scripts/generate_synth_box_ensembles.py (a grid of boxes whose member
series are linearly correlated with hidden factors), at a size that
renders in seconds: 128 x 128 x 32 voxels x 100 members.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from correrender_tpu.io import writers
from correrender_tpu.utils import fixtures

out = os.path.join(os.path.dirname(__file__), "linear_4x4.nc")
data = fixtures.synth_box_ensemble(xs=128, ys=128, zs=32, members=100)
writers.write_netcdf(out, data[:, None], name="q")  # (E, T, Z, Y, X)
print(f"wrote {out} {data.shape}")
