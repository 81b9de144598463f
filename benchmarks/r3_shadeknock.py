"""In-graph shading-pass knockout for the Cornell dense path (round 3).

r3_knockout showed Cornell d5 = 85 ms with only ~23 ms of traversal:
~62 ms is XLA shading glue, but the standalone pass probes (r3_shade_probe)
all measure ~= the 6.5 ms dispatch floor, so the glue must be attributed
IN-GRAPH.  This script retraces the production path_li jit with one
shading pass at a time replaced by a cheap stub (monkeypatched before
trace), on the same 1M-ray film-ordered Cornell wave:

  full            : unmodified path_li
  no_bsdf_sample  : bsdf_sample -> constant diffuse bounce
  no_bsdf_f       : bsdf_f -> constant albedo/pi
  no_sample_li    : lights.sample_li -> constant overhead light
  no_surface      : make_surface -> synthetic surface (no gathers)
  no_materials    : gather_materials -> constant matte params

full - variant ~= that pass's true in-graph cost (fusion-coupling caveat:
stubs change neighboring fusions, so read deltas as attribution, not
budget lines).

    PYTHONPATH=/root/repo:/root/repo/benchmarks:/root/.axon_site \
        nohup python benchmarks/r3_shadeknock.py > /tmp/r3_shadeknock.log 2>&1 &
"""

import numpy as np

N_TILES = 4096
TD = 16


def main():
    import jax
    import jax.numpy as jnp

    from _timing import drained
    from yuki_tpu import bsdf as bsdf_mod
    from yuki_tpu import lights as lights_mod
    from yuki_tpu import surface as surface_mod
    from yuki_tpu import integrators
    from yuki_tpu.camera import Camera
    from yuki_tpu.integrators import PathParams, path_li
    from yuki_tpu.sampling import SampleCtx, UniformSampler
    from yuki_tpu.scene.cornell import cornell
    from yuki_tpu.vecmath import normalize as unit

    print(f"backend={jax.default_backend()}", flush=True)
    scene, cam_params, _ = cornell()
    data, meta = scene.data, scene.meta
    n = N_TILES * TD * TD
    camera = Camera.create(cam_params, 1920, 1080)
    tx = (np.arange(N_TILES) % 120) * TD
    ty = (np.arange(N_TILES) // 120) * TD
    px = np.broadcast_to(
        tx[:, None, None] + np.arange(TD)[None, :, None],
        (N_TILES, TD, TD),
    ).reshape(-1)
    py = np.broadcast_to(
        ty[:, None, None] + np.arange(TD)[None, None, :],
        (N_TILES, TD, TD),
    ).reshape(-1)
    px = jnp.asarray(px.astype(np.int32))
    py = jnp.asarray(py.astype(np.int32))
    sampler = UniformSampler(1)
    ctx = SampleCtx(px=px, py=py, sample_index=jnp.uint32(0),
                    seed=jnp.uint32(7))
    u = sampler.get_2d(ctx, 0)
    pf = jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32)], -1) + u
    o, d = camera.ray(pf)
    params = PathParams(5)

    real = dict(
        bsdf_sample=bsdf_mod.bsdf_sample,
        bsdf_f=bsdf_mod.bsdf_f,
        sample_li=lights_mod.sample_li,
        make_surface=surface_mod.make_surface,
        gather_materials=bsdf_mod.gather_materials,
    )

    def stub_bsdf_sample(mp, si, wo_w, u, meta=None):
        wi = unit(si.ns + 1e-3)
        return bsdf_mod.BsdfSample(
            wi=wi,
            f=jnp.full_like(si.p, 0.3),
            pdf=jnp.ones(si.p.shape[:-1]),
            is_specular=jnp.zeros(si.p.shape[:-1], bool),
        )

    def stub_bsdf_f(mp, si, wo_w, wi_w, meta=None):
        return jnp.full_like(si.p, 0.3)

    def stub_sample_li(scene, li_idx, ltype, si, u):
        real_ls = real["sample_li"](scene, li_idx, ltype, si, u)
        l = jnp.broadcast_to(
            jnp.asarray([0.0, 1.0, 0.0]), si.p.shape)
        return type(real_ls)(
            l=l,
            li=jnp.full_like(si.p, 2.0),
            pdf=jnp.ones(si.p.shape[:-1]),
            target=si.p + l,
            skip_light=jnp.zeros((), jnp.int32),
        )

    def stub_make_surface(scene, hit, o, d):
        real_si = real["make_surface"](scene, hit, o, d)
        p = o + hit.t[..., None] * d
        ns = unit(-d)
        ss = unit(jnp.cross(ns, jnp.asarray([0.57735, 0.57735, 0.57735])))
        return type(real_si)(
            valid=hit.hit, p=p, n=ns, ns=ns, ss=ss,
            uv=jnp.full(p.shape[:-1] + (2,), 0.5),
            wo=-d, material=jnp.zeros(p.shape[:-1], jnp.int32),
            area_light=jnp.full(p.shape[:-1], -1, jnp.int32),
        )

    def stub_gather_materials(scene, si, meta=None):
        mp = real["gather_materials"](scene, si, meta)
        ones = jnp.ones(si.p.shape[:-1])
        return type(mp)(*[
            (jnp.zeros_like(f) if jnp.issubdtype(f.dtype, jnp.integer)
             else jnp.ones_like(f) * 0.5)
            for f in mp
        ])

    def run(o, d):
        r = path_li(data, meta, params, sampler, ctx, o, d)
        return r.li.sum() + r.ray_count.sum()

    def timeit(label):
        fn = jax.jit(run)
        drained(f"{label} d5 1M", fn, o, d, reps=3)

    timeit("full")

    import yuki_tpu.integrators as intg
    bsdf_mod.bsdf_sample = stub_bsdf_sample
    timeit("no_bsdf_sample")
    bsdf_mod.bsdf_sample = real["bsdf_sample"]

    bsdf_mod.bsdf_f = stub_bsdf_f
    timeit("no_bsdf_f")
    bsdf_mod.bsdf_f = real["bsdf_f"]

    lights_mod.sample_li = stub_sample_li
    timeit("no_sample_li")
    lights_mod.sample_li = real["sample_li"]

    intg.make_surface = stub_make_surface
    timeit("no_surface")
    intg.make_surface = surface_mod.make_surface

    bsdf_mod.gather_materials = stub_gather_materials
    timeit("no_materials")
    bsdf_mod.gather_materials = real["gather_materials"]

    print("done", flush=True)


if __name__ == "__main__":
    main()
