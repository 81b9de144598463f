"""Chunk-packing experiment: raw <=K BVH cut vs greedy DFS-merge pack.

The raw cut leaves chunks ~67% full (chunk_fill measurement, round 3),
so W — the O(rays x W) cross/extract width — is ~1.4x the geometric
need and a third of in-kernel triangle tests hit padding.  Packing
merges DFS-consecutive cut subtrees while the prim total fits K; the
question is whether the merged (union) bounds raise per-ray crossings
enough to eat the W and slot-count win.  This script answers it with
exact host slab tests on real CPU-traced bounce/shadow waves
(methodology shared with r3_kstats.py).

    PYTHONPATH=/root/repo nohup python \
        benchmarks/r3_chunkpack.py > /tmp/r3_chunkpack.log 2>&1 &
"""

import time

import numpy as np

from r3_kstats import crossings_per_ray, ray_waves, stats


def compare(label, scene):
    from yuki_tpu.treelets import build_treelets

    data = scene.data
    tri_p = np.stack(
        [np.asarray(data.tris.p0), np.asarray(data.tris.p1),
         np.asarray(data.tris.p2)], axis=1,
    )
    tri_light = np.asarray(data.tris.area_light)
    print(f"== {label}: {tri_p.shape[0]} tris ==", flush=True)
    t0 = time.monotonic()
    o1, d1, t1, o_s, d_s, t_s = ray_waves(scene)
    print(f"  waves traced in {time.monotonic()-t0:.0f}s", flush=True)

    for pack in (False, True):
        ch = build_treelets(
            scene.bvh_host, tri_p, tri_light, leaf_size=128, super_size=128,
            pack_chunks=pack,
        )
        cb = np.asarray(ch.treelet_bounds)
        T = ch.n_treelets
        W = -(-T // 32)
        fill = (np.asarray(ch.tris_padded[:, 10]).reshape(-1, 128) >= 0).sum(1)
        print(f"  pack={pack}: chunks={T} words={W} "
              f"fill={fill.mean():.1f} ({fill.mean()/1.28:.0f}%)", flush=True)
        for wname, (o, d, tm) in (
            ("bounce", (o1, d1, t1)),
            ("shadow", (o_s, d_s, t_s)),
        ):
            pr, pb8 = crossings_per_ray(cb, o, d, tm)
            pb4 = None  # B=4 bundle OR counts, bounce uses B=4
            n = o.shape[0]
            # recompute B=4 from per-ray hits needs the hit matrix; do a
            # cheap second pass only over bounce waves
            stats(f"{wname} per-ray ", pr)
            stats(f"{wname} bundle8 ", pb8)
            print(
                f"      cull~rays*T={n*T/1e6:.0f}M  "
                f"ray-tests={int(pr.sum())*128/1e6:.0f}M  "
                f"b8-tests={int(pb8.sum())*8*128/1e6:.0f}M",
                flush=True,
            )


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from yuki_tpu.scene.testscenes import colonnade

    scene, cam, _ = colonnade()
    scene.cam_params = cam
    compare("colonnade", scene)

    import sys

    sys.path.insert(0, "/root/repo")
    from bench import load_atrium

    scene_a, cam_a, _ = load_atrium()
    scene_a.cam_params = cam_a
    compare("atrium", scene_a)


if __name__ == "__main__":
    main()
