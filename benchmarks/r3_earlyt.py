"""Early-t cull potential for closest-hit divergent calls (CPU stats).

Idea: the slot stream currently tests EVERY crossed chunk per ray.  A
front-to-back traversal (reference bvh.rs:160-232) prunes nodes entered
beyond the running best hit.  The wavefront analog is two-phase: test
each ray's minimum-entry-t chunk first (n x 1 slots mini-call), then
pack/test only the chunks whose slab ENTRY t is <= the phase-1 hit t.

This script measures the ceiling on real CPU-traced bounce waves:
  - survival = crossed chunks with t_enter <= t_hit (vs all crossed)
  - first-chunk hit rate (how often phase 1 produces a tight bound)
The pack+kernel terms of closest calls scale with survival.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/r3_earlyt.py > /tmp/r3_earlyt.log 2>&1 &
"""

import time

import numpy as np

from r3_kstats import ray_waves


def earlyt(label, scene):
    import jax
    import jax.numpy as jnp

    from yuki_tpu import traverse

    data, meta = scene.data, scene.meta
    print(f"== {label} ==", flush=True)
    t0 = time.monotonic()
    o1, d1, t1, _, _, _ = ray_waves(scene)
    print(f"  waves traced in {time.monotonic()-t0:.0f}s", flush=True)

    # True closest hits for the bounce wave (CPU XLA fallback engine).
    @jax.jit
    def trace(o, d, tm):
        return traverse.intersect(data, meta, o, d, tm)

    hit = jax.block_until_ready(
        trace(jnp.asarray(o1), jnp.asarray(d1), jnp.asarray(t1))
    )
    t_hit = np.asarray(hit.t)
    hit_ok = np.asarray(hit.hit)
    print(f"  bounce rays: {o1.shape[0]}, hits {hit_ok.mean()*100:.0f}%",
          flush=True)

    cb = np.asarray(data.chunks.treelet_bounds)
    lo, hi = cb[:, 0:3], cb[:, 3:6]
    k = data.chunks.leaf_size
    rows = np.asarray(data.chunks.tris_padded[:, 10]).reshape(-1, k)

    n = o1.shape[0]
    tot_crossed = 0
    tot_surv = 0  # t_enter <= t_hit (hit rays) or all (miss rays)
    tot_surv_first = 0  # survivors if phase-1 only bounds rays whose
    # FIRST (min-entry) chunk contains their hit
    first_hit = 0
    n_live = 0
    blk = 8192
    for i in range(0, n, blk):
        ob, db, tb = o1[i:i + blk], d1[i:i + blk], t1[i:i + blk]
        th = t_hit[i:i + blk]
        hk = hit_ok[i:i + blk]
        inv = np.where(db != 0.0, 1.0 / np.where(db == 0.0, 1.0, db), np.inf)
        tn = np.minimum((lo[None] - ob[:, None]) * inv[:, None],
                        (hi[None] - ob[:, None]) * inv[:, None]).max(axis=2)
        tf = np.maximum((lo[None] - ob[:, None]) * inv[:, None],
                        (hi[None] - ob[:, None]) * inv[:, None]).min(axis=2)
        crossed = (tn <= tf) & (tf >= 0.0) & (tn <= tb[:, None])
        live = crossed.any(axis=1)
        n_live += int(live.sum())
        tot_crossed += int(crossed.sum())
        entry = np.where(crossed, np.maximum(tn, 0.0), np.inf)
        # Survivors under a PERFECT t bound (phase 2 keeps entry <= t_hit).
        bound = np.where(hk, th, np.inf)
        surv = crossed & (entry <= bound[:, None])
        tot_surv += int(surv.sum())
        # Phase-1 realism: bound only exists if the min-entry chunk holds
        # the hit prim.  Map hit prim -> chunk via the row table.
        fc = np.argmin(entry, axis=1)  # first (min-entry) chunk per ray
        prim = np.asarray(hit.prim)[i:i + blk]
        in_first = hk & live & (rows[fc] == prim[:, None]).any(axis=1)
        first_hit += int(in_first.sum())
        bound2 = np.where(in_first, th, np.inf)
        surv2 = crossed & (entry <= bound2[:, None])
        tot_surv_first += int(surv2.sum())
    print(f"  crossed slots {tot_crossed} -> perfect-bound survivors "
          f"{tot_surv} ({tot_surv/max(tot_crossed,1)*100:.0f}%)", flush=True)
    if tot_surv_first:
        print(f"  first-chunk-hit rays {first_hit}/{n_live} "
              f"({first_hit/max(n_live,1)*100:.0f}%), phase-1 survivors "
              f"{tot_surv_first} ({tot_surv_first/max(tot_crossed,1)*100:.0f}%)",
              flush=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from yuki_tpu.scene.testscenes import colonnade

    scene, cam, _ = colonnade()
    scene.cam_params = cam
    earlyt("colonnade", scene)

    import sys

    sys.path.insert(0, "/root/repo")
    from bench import load_atrium

    scene_a, cam_a, _ = load_atrium()
    scene_a.cam_params = cam_a
    earlyt("atrium", scene_a)


if __name__ == "__main__":
    main()
