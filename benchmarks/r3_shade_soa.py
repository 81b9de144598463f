"""On-chip: decompose the per-bounce XLA shading glue (Cornell lever,
round-3 verdict item 3).  Hypotheses to separate at 1M rays:

  1. [N,3] AoS math wastes lanes / forces relayouts on dot/broadcast
     (vs three [N] planes).
  2. gather_materials' per-lane row gathers are the latency term.
  3. The stateless-hash sampler is the term (measured 3% on the
     reference CPU, sampling/mod.rs:92-96).
  4. Production bsdf_sample with CORNELL meta (matte-only static
     specialization) vs mixed-family meta.

    PYTHONPATH=/root/repo:/root/repo/benchmarks:/root/.axon_site \
        nohup python benchmarks/r3_shade_soa.py > /tmp/r3_soa.log 2>&1 &
"""

import numpy as np

N = 1 << 20


def main():
    import jax
    import jax.numpy as jnp

    from _timing import drained

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    a = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    m = jnp.asarray(rng.random(N).astype(np.float32))

    # --- 1. AoS vs SoA for a representative shading chain ------------
    def chain_aos(a, b, m):
        # normalize, dot, masked mix, scale-by-scalar-per-lane: the
        # shapes bsdf/lights/surface use everywhere.
        an = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
        bn = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
        c = jnp.sum(an * bn, axis=-1)
        out = jnp.where((c > 0.0)[..., None], an * c[..., None] + bn, bn)
        return out.sum()

    def chain_soa(ax, ay, az, bx, by, bz, m):
        il = jax.lax.rsqrt(ax * ax + ay * ay + az * az)
        jl = jax.lax.rsqrt(bx * bx + by * by + bz * bz)
        anx, any_, anz = ax * il, ay * il, az * il
        bnx, bny, bnz = bx * jl, by * jl, bz * jl
        c = anx * bnx + any_ * bny + anz * bnz
        pos = c > 0.0
        ox = jnp.where(pos, anx * c + bnx, bnx)
        oy = jnp.where(pos, any_ * c + bny, bny)
        oz = jnp.where(pos, anz * c + bnz, bnz)
        return ox.sum() + oy.sum() + oz.sum()

    f_aos = jax.jit(chain_aos)
    f_soa = jax.jit(chain_soa)
    planes = [a[:, k] for k in range(3)] + [b[:, k] for k in range(3)]
    for rep in range(3):
        drained("chain AoS [N,3] 1M", f_aos, a, b, m)
        drained("chain SoA 6x[N] 1M", f_soa, *planes, m)

    # --- 2/3/4: the real pieces on the real Cornell scene ------------
    from yuki_tpu import bsdf as B
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.scene.cornell import cornell
    from yuki_tpu.surface import Surface, make_surface
    from yuki_tpu.traverse import intersect

    sc, cam, _ = cornell()
    meta = sc.meta

    def unit(n):
        v = rng.standard_normal((n, 3)).astype(np.float32)
        return v / np.linalg.norm(v, axis=1, keepdims=True)

    ns = jnp.asarray(unit(N))
    t0 = jnp.asarray(unit(N))
    ss = t0 - ns * jnp.sum(t0 * ns, axis=1, keepdims=True)
    ss = ss / jnp.linalg.norm(ss, axis=1, keepdims=True)
    wo = jnp.asarray(unit(N))
    nmat = int(np.asarray(sc.data.materials.packed).shape[0])
    si = Surface(
        valid=jnp.ones(N, bool),
        p=jnp.asarray(rng.random((N, 3), np.float32)),
        n=ns, ns=ns, ss=ss,
        uv=jnp.asarray(rng.random((N, 2), np.float32)),
        wo=wo,
        material=jnp.asarray(rng.integers(0, nmat, N), jnp.int32),
        area_light=jnp.full(N, -1, jnp.int32),
    )
    u = jnp.asarray(rng.random((N, 2), np.float32))

    @jax.jit
    def f_gather(data, si):
        mp = B.gather_materials(data, si, meta)
        return mp.c0.sum() + mp.s0.sum() + mp.mtype.sum()

    drained("gather_materials 1M (cornell)", f_gather, sc.data, si)

    sampler = UniformSampler(1)
    ctx = SampleCtx(
        px=jnp.asarray(rng.integers(0, 1920, N), jnp.int32),
        py=jnp.asarray(rng.integers(0, 1080, N), jnp.int32),
        sample_index=jnp.uint32(0), seed=jnp.uint32(1),
    )

    @jax.jit
    def f_rng(ctx):
        total = jnp.zeros(())
        for dim in range(2, 9, 2):  # 4 get_2d pulls = one bounce's worth
            total = total + sampler.get_2d(ctx, dim).sum()
        return total

    drained("sampler 4x get_2d 1M", f_rng, ctx)

    @jax.jit
    def f_sample_cornell(data, si, u):
        mp = B.gather_materials(data, si, meta)
        bs = B.bsdf_sample(mp, si, si.wo, u, meta)
        return bs.f.sum() + bs.pdf.sum() + bs.wi.sum()

    drained("gather+bsdf_sample 1M (cornell matte-only)",
            f_sample_cornell, sc.data, si, u)

    @jax.jit
    def f_f_cornell(data, si):
        mp = B.gather_materials(data, si, meta)
        return B.bsdf_f(mp, si, si.wo, si.ss, meta).sum()

    drained("gather+bsdf_f 1M (cornell)", f_f_cornell, sc.data, si)

    # --- surface build from a real trace ------------------------------
    o = jnp.asarray(unit(N) * 0.1 + np.asarray([[278, 273, -500]],
                                               np.float32))
    d = jnp.asarray(unit(N))
    tm = jnp.full(N, 3.0e38)

    @jax.jit
    def f_surface(data, o, d, tm):
        hit = intersect(data, meta, o, d, tm)
        si = make_surface(data, hit, o, d)
        return si.p.sum() + si.ns.sum() + si.uv.sum()

    @jax.jit
    def f_trace_only(data, o, d, tm):
        hit = intersect(data, meta, o, d, tm)
        return hit.t.sum() + hit.prim.sum()

    drained("trace only 1M (cornell)", f_trace_only, sc.data, o, d, tm)
    drained("trace+make_surface 1M", f_surface, sc.data, o, d, tm)
    print("done", flush=True)


if __name__ == "__main__":
    main()
