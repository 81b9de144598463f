"""Compare two EXR images: RMSE + max abs diff.

Usage: python tools/rmse.py a.exr b.exr
The reference workflow diffs EXRs externally in HDRView (readme.md:36-38);
this is the headless equivalent used for golden comparisons.
"""

import sys

import numpy as np

sys.path.insert(0, ".")
from yuki_tpu.app.exr import read_exr  # noqa: E402


def main():
    a = read_exr(sys.argv[1])
    b = read_exr(sys.argv[2])
    if a.shape != b.shape:
        print(f"shape mismatch: {a.shape} vs {b.shape}")
        sys.exit(2)
    diff = a.astype(np.float64) - b.astype(np.float64)
    rmse = float(np.sqrt(np.mean(diff**2)))
    print(
        f"rmse={rmse:.6g} max_abs={float(np.abs(diff).max()):.6g} "
        f"mean_a={a.mean():.6g} mean_b={b.mean():.6g}"
    )


if __name__ == "__main__":
    main()
