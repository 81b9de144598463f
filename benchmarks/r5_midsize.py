"""Round-5: on-chip validation of the fused wave's streamed-triangle
band (64 < n_tris <= MAX_TRIS_WAVE, ops/path_fused.py fori_loop
sweeps).  The parity tests run interpret-mode on CPU; this compiles the
loop through real Mosaic on the ~142-tri midsize dense scene and
compares the full render against the XLA chain, plus times both.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/r5_midsize.py > /tmp/r5_midsize.log 2>&1 &
"""

import importlib.util
import sys
import time

import numpy as np

import _timing


def main():
    _timing.enable_compile_cache()
    import jax

    print("backend=", jax.default_backend(), flush=True)

    sys.path.insert(0, "/root/repo")
    spec = importlib.util.spec_from_file_location(
        "tpf", "/root/repo/tests/test_path_fused.py"
    )
    tpf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tpf)

    from yuki_tpu.ops import path_fused

    st = tpf._midsize_dense()
    meta = st[0].meta
    print(f"n_tris={meta.n_tris} traversal={meta.traversal}", flush=True)
    assert path_fused.MAX_TRIS < meta.n_tris <= path_fused.MAX_TRIS_WAVE

    t0 = time.monotonic()
    ref, rr = tpf._render(st, "off", depth=3)
    print(f"xla chain: {time.monotonic() - t0:.1f}s (incl compile)",
          flush=True)
    t0 = time.monotonic()
    got, rg = tpf._render(st, "auto", depth=3)  # real Mosaic compile
    print(f"fused wave: {time.monotonic() - t0:.1f}s (incl compile)",
          flush=True)

    bad = np.abs(got - ref) > 1e-4 + 1e-4 * np.abs(ref)
    n_px = bad.reshape(-1, 3).shape[0]
    print(f"rays ref={rr} got={rg}; divergent px "
          f"{int(bad.any(axis=-1).sum())}/{n_px}; "
          f"mean ref={ref.mean():.6f} got={got.mean():.6f}", flush=True)

    # Timing at a production-ish wave (repeat renders, compiles cached).
    for mode in ("off", "auto"):
        t0 = time.monotonic()
        tpf._render(st, mode, depth=3)
        print(f"  {mode} re-render: {time.monotonic() - t0:.2f}s",
              flush=True)
    ok = (abs(rr - rg) <= max(16, rr * 0.01)
          and bad.any(axis=-1).sum() <= max(4, n_px // 12))
    print("PASS" if ok else "FAIL", flush=True)


if __name__ == "__main__":
    main()
