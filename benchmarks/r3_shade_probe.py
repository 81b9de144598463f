"""On-chip: standalone XLA cost of the per-bounce shading pieces at 1M
rays (Cornell material mix), to size the payoff of a fused shade kernel
before building it.  Pieces: bsdf_sample, bsdf_f (per light), the full
NEE-setup fold (sans occlusion), and all three together.

    PYTHONPATH=/root/repo:/root/repo/benchmarks:/root/.axon_site \
        nohup python benchmarks/r3_shade_probe.py > /tmp/r3_shadep.log 2>&1 &
"""

import numpy as np

N = 1 << 20


def main():
    import jax
    import jax.numpy as jnp

    from _timing import drained
    from yuki_tpu import bsdf as B
    from yuki_tpu.surface import Surface
    from yuki_tpu.scene.cornell import cornell

    print(f"backend={jax.default_backend()}", flush=True)
    sc, cam, _ = cornell()
    meta = sc.meta

    rng = np.random.default_rng(0)

    def unit(n):
        v = rng.standard_normal((n, 3)).astype(np.float32)
        return v / np.linalg.norm(v, axis=1, keepdims=True)

    ns = jnp.asarray(unit(N))
    # tangent orthogonal to ns
    t0 = jnp.asarray(unit(N))
    ss = t0 - ns * jnp.sum(t0 * ns, axis=1, keepdims=True)
    ss = ss / jnp.linalg.norm(ss, axis=1, keepdims=True)
    wo = jnp.asarray(unit(N))
    si = Surface(
        valid=jnp.ones(N, bool),
        p=jnp.asarray(rng.random((N, 3), np.float32)),
        n=ns, ns=ns, ss=ss,
        uv=jnp.asarray(rng.random((N, 2), np.float32)),
        wo=wo,
        material=jnp.asarray(rng.integers(0, 3, N), jnp.int32),
        area_light=jnp.full(N, -1, jnp.int32),
    )
    mtypes = np.array([B.MAT_MATTE, B.MAT_GLASS, B.MAT_METAL])
    mp = B.MatParams(
        mtype=jnp.asarray(mtypes[rng.integers(0, 3, N)], jnp.int32),
        c0=jnp.asarray(rng.random((N, 3), np.float32)),
        c1=jnp.asarray(rng.random((N, 3), np.float32)),
        s0=jnp.asarray(rng.random(N).astype(np.float32) * 2.0),
        alpha=jnp.asarray(
            np.maximum(rng.random(N).astype(np.float32), 1e-3)
        ),
    )
    u = jnp.asarray(rng.random((N, 2), np.float32))
    wi = jnp.asarray(unit(N))

    @jax.jit
    def f_sample(mp, si, wo, u):
        bs = B.bsdf_sample(mp, si, wo, u, meta)
        return bs.f.sum() + bs.pdf.sum() + bs.wi.sum()

    @jax.jit
    def f_eval(mp, si, wo, wi):
        return B.bsdf_f(mp, si, wo, wi, meta).sum()

    drained("bsdf_sample 1M", f_sample, mp, si, wo, u)
    drained("bsdf_f 1M", f_eval, mp, si, wo, wi)

    # Full bounce-shading chain minus trace/occlusion, on the real scene
    # gather path: surface+materials+nee-setup+sample.
    from yuki_tpu import lights as L
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.vecmath import dot, is_black
    from yuki_tpu.surface import spawn_ray_to

    sampler = UniformSampler(1)
    ctx = SampleCtx(
        px=jnp.asarray(rng.integers(0, 1920, N), jnp.int32),
        py=jnp.asarray(rng.integers(0, 1080, N), jnp.int32),
        sample_index=jnp.uint32(0), seed=jnp.uint32(1),
    )

    @jax.jit
    def nee_setup(data, mp, si):
        total = jnp.zeros(())
        dim = 2
        for li_idx, ltype in enumerate(meta.light_types):
            uu = sampler.get_2d(ctx, dim)
            dim += 2
            ls = L.sample_li(data, li_idx, ltype, si, uu)
            f = B.bsdf_f(mp, si, si.wo, ls.l, meta)
            cos = jnp.clip(dot(si.ns, ls.l), 0.0, 1.0)
            worth = ~is_black(ls.li) & ~is_black(f) & (cos > 0.0)
            o_s, d_s = spawn_ray_to(si, ls.target)
            contrib = f * ls.li * (cos / jnp.maximum(ls.pdf, 1e-30))[..., None]
            total = total + jnp.where(worth[..., None], contrib, 0.0).sum()
            total = total + o_s.sum() + d_s.sum()
        return total

    drained("nee_setup 1M (all lights)", nee_setup, sc.data, mp, si)
    print("done", flush=True)


if __name__ == "__main__":
    main()
