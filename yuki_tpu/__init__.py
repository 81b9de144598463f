"""yuki-tpu: a TPU-native physically-based renderer.

A from-scratch JAX/XLA/Pallas rebuild of the capability set of sndels/yuki
(a pbrt-v3-style Rust CPU ray tracer): wavefront Whitted/path integrators
over SoA ray queues, octant-threaded stackless BVH traversal, masked
branchless BSDFs keyed by material id, stateless counter-based samplers,
pbrt-v3 / Mitsuba 2.0 / PLY scene loading, film accumulation with spiral
tiling, ACES tonemapping, headless EXR output, and multi-chip rendering via
jax.sharding meshes.  See SURVEY.md for the layer-by-layer reference map.
"""

__version__ = "0.1.0"
