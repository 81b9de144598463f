"""Round-5: colonnade/atrium end-to-end wave-size sweep.

Ray density is a measured coherence lever (ARCHITECTURE.md round-3:
sorted bounce pairs/block 2043 @65k rays -> 1282 @262k -> 908 @1M;
pair capacity already scales 2x rays), and Cornell's bench config
amortizes dispatch with 4096-tile waves — but the treelet scenes still
bench at 1024 tiles (262k rays).  Sweep the PRODUCTION e2e render at
1024/2048/4096 tiles to decide bench.py's treelet wave size.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        benchmarks/r5_wavesize.py > /tmp/r5_wavesize.log 2>&1 &
"""

import _timing


def main():
    _timing.enable_compile_cache()
    import jax

    print("backend=", jax.default_backend(), flush=True)

    import sys

    sys.path.insert(0, "/root/repo")
    from bench import bench_scene
    from yuki_tpu.scene.testscenes import colonnade

    scene, cam, _ = colonnade()
    for wt in (1024, 2048, 4096):
        stats = bench_scene(scene, cam, (1920, 1080), spp=1, max_depth=5,
                            wave_tiles=wt)
        print(f"colonnade wave_tiles={wt}: {stats['mrays_s']:.3f} "
              f"Mrays/s ({stats['elapsed_s']:.1f}s)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
