"""Honest on-chip timing for the axon backend.

block_until_ready on ARRAY outputs does not reliably block on this
backend (measured: dense_trace at 1M rays "completed" in 0.05 ms — 10x
below its compute floor — while the same call behind a scalar .sum()
fetch reads ~28 ms).  Scalar host fetches DO drain the queue.  So:
time a loop of reps calls and end the timed region with a device_get of
a tiny slice of the LAST output — the device queue is FIFO, so the last
result being fetchable means every rep finished.
"""

import os
import time


def enable_compile_cache():
    """Persistent compilation cache (same dir as the app/bench): repeat
    benchmark runs of unchanged graphs skip the minutes-long remote
    compile."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("YUKI_TPU_CACHE",
                       os.path.expanduser("~/.yuki_tpu_cache")),
    )


def _drain(out):
    import jax

    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    x = leaves[-1]
    jax.device_get(x if x.ndim == 0 else x.reshape(-1)[:1])


def drained(label, fn, *args, reps: int = 5):
    """Print and return the drained per-call time of fn(*args)."""
    out = fn(*args)
    _drain(out)  # warmup/compile
    t0 = time.monotonic()
    for _ in range(reps):
        out = fn(*args)
    _drain(out)
    dt = (time.monotonic() - t0) / reps
    print(f"  {label}: {dt * 1e3:.1f} ms", flush=True)
    return dt
