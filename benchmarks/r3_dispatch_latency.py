"""Axon-backend dispatch semantics probe.

Finding (first run, 2026-08-18): block_until_ready on ARRAY outputs does
not block — dense_trace at 1M rays "returned" in 0.05 ms, 10x below its
compute floor, and 8 chained 1M-ray traces in 0.2 ms.  Only a host fetch
(device_get / float()) drains the queue.  Consequences:
  - every benchmark that timed array-returning calls via
    block_until_ready may under- or mis-report (see _timing.drained);
  - scalar-summing timers (cornell_stages, knockout) were honest.

This probe measures, with the drain protocol:
  1. R_fetch: round trip of a trivial dispatch + scalar fetch.
  2. Throughput of K chained trivial dispatches + one drain.
  3. dense_trace 1M: per-call drained, and with a per-rep scalar fetch
     (difference = the fetch round trip amortization).
  4. stream closest on a colonnade bounce wave: drained per-call, to
     recalibrate the round-3 cost model.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/r3_dispatch_latency.py > /tmp/r3_latency.log 2>&1 &
"""

import time

from _timing import drained


def main():
    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()}", flush=True)

    x = jnp.zeros((8, 128), jnp.float32) + 1.0
    trivial = jax.jit(lambda x: x * 1.000001 + 0.000001)
    y = trivial(x)
    jax.device_get(y.reshape(-1)[:1])

    # 1. Per-call with a scalar fetch every rep (latency-bound).
    reps = 20
    t0 = time.monotonic()
    for _ in range(reps):
        y = trivial(x)
        jax.device_get(y.reshape(-1)[:1])
    r_fetch = (time.monotonic() - t0) / reps
    print(f"  trivial + per-rep fetch: {r_fetch * 1e3:.2f} ms", flush=True)

    # 2. Chained, one drain (throughput-bound).
    for k in (32,):
        t0 = time.monotonic()
        y = x
        for _ in range(k):
            y = trivial(y)
        jax.device_get(y.reshape(-1)[:1])
        dt = time.monotonic() - t0
        print(f"  {k} chained trivial + drain: {dt * 1e3:.2f} ms "
              f"({dt / k * 1e3:.3f} ms each)", flush=True)

    # 3. dense_trace 1M rays.
    import numpy as np

    from yuki_tpu.ops.trace import dense_trace, pack_triangles
    from yuki_tpu.scene.cornell import cornell

    scene, _, _ = cornell()
    tris = scene.data.tris
    tp = pack_triangles(tris.p0, tris.p1, tris.p2)
    n = 1048576
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tm = jnp.full(n, 1e30, jnp.float32)

    run = jax.jit(lambda tp, o, d, tm: dense_trace(tp, o, d, tm)[0])
    drained("dense_trace 1M drained  ", run, tp, o, d, tm, reps=10)
    runs = jax.jit(lambda tp, o, d, tm: dense_trace(tp, o, d, tm)[0].sum())
    t0 = time.monotonic()
    for _ in range(10):
        float(jax.device_get(runs(tp, o, d, tm)))
    dt = (time.monotonic() - t0) / 10
    print(f"  dense_trace 1M + per-rep scalar fetch: {dt * 1e3:.1f} ms",
          flush=True)

    # 4. Colonnade stream closest, drained (cost-model recalibration).
    import sys

    sys.path.insert(0, "/root/repo/benchmarks")
    from r3_cross_sweep import bounce_wave

    from yuki_tpu.ops import trace_stream as ts
    from yuki_tpu.scene.testscenes import colonnade

    scene_l, cam_l, _ = colonnade()
    ch = scene_l.data.chunks
    meta = scene_l.meta
    ob, db, tb = bounce_wave(scene_l, cam_l)
    float(jax.device_get(tb.sum()))

    def _cl2(ch, o, d, t):
        lists, ov = ts.candidate_lists_2l(ch, o, d, t, ts.C_MAIN)
        return ts.stream_closest_l(
            ch, lists, ov, o, d, t,
            mult=meta.slot_mult_tight, mult_wide=meta.slot_mult)

    cl = jax.jit(_cl2)
    drained("stream closest 2l drained", cl, ch, ob, db, tb, reps=5)
    cands = jax.jit(
        lambda ch, o, d, t: ts.candidate_lists_2l(ch, o, d, t, ts.C_MAIN))
    drained("2l candidates drained    ", cands, ch, ob, db, tb, reps=5)


if __name__ == "__main__":
    main()
