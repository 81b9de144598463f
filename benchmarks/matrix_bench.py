"""Matrix4x4 inversion/multiply micro-benchmark.

Parity with the reference's `bench` crate (bench/src/main.rs:5-93): times
full-pivot Gauss-Jordan inversion across the same matrix classes
(identity / S / SR / SRT / SRT-perspective) plus 4x4 multiplies, reporting
us/op.  Host-side numpy here (transforms are a host-tier concern; device
transforms are baked into scene arrays).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from yuki_tpu import transforms as tf  # noqa: E402

ITERS = 20000


def bench(name, m):
    t = tf.Transform.from_matrix(m)
    start = time.perf_counter()
    for _ in range(ITERS):
        tf.invert_full_pivot(t.m)
    secs = time.perf_counter() - start
    print(f"invert {name:12s}: {secs * 1e6 / ITERS:8.2f} us/op")


def main():
    ident = np.eye(4, dtype=np.float32)
    s = tf.scale(2.0, 3.0, 4.0).m
    sr = (tf.rotation_euler((0.3, 0.4, 0.5)) @ tf.scale(2, 3, 4)).m
    srt = (tf.translation((1, 2, 3))
           @ tf.rotation_euler((0.3, 0.4, 0.5)) @ tf.scale(2, 3, 4)).m
    persp = srt.copy()
    persp[3, :] = [0.1, 0.0, 1.0, 0.0]

    for name, m in [("identity", ident), ("scale", s), ("scale_rot", sr),
                    ("srt", srt), ("srt_persp", persp)]:
        bench(name, m)

    a = tf.Transform.from_matrix(srt)
    b = tf.Transform.from_matrix(sr)
    start = time.perf_counter()
    for _ in range(ITERS):
        _ = a @ b
    secs = time.perf_counter() - start
    print(f"multiply          : {secs * 1e6 / ITERS:8.2f} us/op")


if __name__ == "__main__":
    main()
