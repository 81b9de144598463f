"""Absolute-correctness oracles: renders checked against closed forms.

The reference validates by diffing EXRs against prior renders
(readme.md:36-38) and BASELINE.md's accuracy bar is an RMSE vs a reference
EXR we cannot regenerate without a Rust toolchain.  These tests provide
the *analytic* substitute: scenes whose path/Whitted radiance has an exact
closed form, so correctness is checked against math, not self-goldens.

Each oracle is exact in expectation AND (by construction) per-sample:
 - furnace: cosine-sampled Lambertian under a constant environment gives
   beta = albedo exactly per bounce (f*cos/pdf = rho), so a convex white
   sphere with no lights returns exactly rho * L_env for every sample.
 - point light: single-bounce NEE on a Lambertian plane is the
   inverse-square closed form rho/pi * I * cos/r^2 with zero variance.
 - distant light: rho/pi * L * cos(theta), zero variance.
 - Whitted glass at normal incidence: Fresnel splits exactly 0.04/0.96
   for eta=1.5, reflection sees the background, transmission sees the
   point-lit floor — a mirror-geometry closed form.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from yuki_tpu import integrators as intg
from yuki_tpu import transforms as tf
from yuki_tpu.sampling import SampleCtx, UniformSampler
from yuki_tpu.scene.data import SceneBuilder


def _ctx(n, seed=7, sample=0):
    px = jnp.arange(n, dtype=jnp.int32)
    py = jnp.zeros(n, dtype=jnp.int32)
    return SampleCtx(
        px=px, py=py,
        sample_index=jnp.uint32(sample), seed=jnp.uint32(seed),
    )


def _quad(builder, z, half, material, flip=False):
    """Axis-aligned square in the z=const plane with +z (or -z) normal."""
    s = half
    pts = [(-s, -s, z), (s, -s, z), (s, s, z), (-s, s, z)]
    idx = [(0, 1, 2), (0, 2, 3)] if not flip else [(0, 2, 1), (0, 3, 2)]
    builder.add_mesh(tf.Transform.identity(), idx, pts, material=material)


class TestFurnace:
    """Lambertian energy conservation: every cosine-sampled bounce carries
    f*cos/pdf = albedo exactly, so a convex matte sphere in a constant
    environment returns albedo * L per sample — no Monte Carlo error."""

    @pytest.mark.parametrize("albedo", [0.25, 0.7, 1.0])
    def test_sphere_albedo(self, albedo):
        L = 2.0
        b = SceneBuilder("furnace")
        m = b.add_matte(kd=(albedo, albedo, albedo), sigma=0.0)
        b.add_sphere(tf.Transform.identity(), 1.0, m)
        b.background = np.full(3, L, np.float32)
        scene = b.build()

        n = 64
        # Parallel rays straight down z, covering the sphere's silhouette.
        x = np.linspace(-0.8, 0.8, n, dtype=np.float32)
        o = jnp.asarray(np.stack([x, np.zeros(n), np.full(n, 5.0)], -1))
        d = jnp.asarray(np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (n, 1)))

        res = intg.path_li(
            scene.data, scene.meta, intg.PathParams(max_depth=2),
            UniformSampler(1), _ctx(n), o, d,
        )
        img = np.asarray(res.li)
        expect = albedo * L
        assert np.allclose(img, expect, atol=2e-4), (
            f"furnace failed: got {img[:4]}, want {expect}"
        )

    def test_deep_furnace_geometric_series(self):
        """Camera INSIDE a matte box: depth-D path sums L*(rho+...+rho^(D-1))
        — wait, no interior environment escapes, so instead check the
        convex-exterior series directly: with max_depth=D every path does
        exactly one surface interaction then escapes, independent of D."""
        albedo, L = 0.5, 1.0
        b = SceneBuilder("furnace-deep")
        m = b.add_matte(kd=(albedo,) * 3)
        b.add_sphere(tf.Transform.identity(), 1.0, m)
        b.background = np.full(3, L, np.float32)
        scene = b.build()
        n = 16
        o = jnp.asarray(
            np.stack([np.zeros(n), np.zeros(n), np.full(n, 4.0)], -1)
            .astype(np.float32)
        )
        d = jnp.asarray(np.tile(np.array([[0, 0, -1.0]], np.float32), (n, 1)))
        for depth in (2, 3, 5):
            res = intg.path_li(
                scene.data, scene.meta, intg.PathParams(max_depth=depth),
                UniformSampler(1), _ctx(n), o, d,
            )
            assert np.allclose(np.asarray(res.li), albedo * L, atol=2e-4)


class TestPointLightInverseSquare:
    """path.rs single-bounce NEE closed form: L_o = rho/pi * I * h / r^3."""

    def test_plane_falloff(self):
        rho = 0.6
        I = 10.0
        h = 3.0
        b = SceneBuilder("invsq")
        m = b.add_matte(kd=(rho,) * 3)
        _quad(b, 0.0, 50.0, m)
        b.add_point_light(tf.translation((0.0, 0.0, h)), (I, I, I))
        scene = b.build()

        n = 32
        x = np.linspace(-4.0, 4.0, n, dtype=np.float32)
        o = jnp.asarray(np.stack([x, np.zeros(n), np.full(n, 5.0)], -1))
        d = jnp.asarray(np.tile(np.array([[0, 0, -1.0]], np.float32), (n, 1)))
        res = intg.path_li(
            scene.data, scene.meta, intg.PathParams(max_depth=1),
            UniformSampler(1), _ctx(n), o, d,
        )
        img = np.asarray(res.li)[:, 0]
        r = np.sqrt(x * x + h * h)
        expect = rho / np.pi * I * h / r**3
        assert np.allclose(img, expect, rtol=1e-4, atol=1e-6), (
            f"max err {np.abs(img - expect).max()}"
        )

    def test_occluder_blocks(self):
        """A small opaque quad between light and plane casts an exact
        umbra for the delta light (visibility is binary)."""
        rho, I, h = 0.5, 10.0, 4.0
        b = SceneBuilder("shadow")
        m = b.add_matte(kd=(rho,) * 3)
        _quad(b, 0.0, 50.0, m)
        _quad(b, h / 2, 0.5, m)  # blocker halfway up, half-width 0.5
        b.add_point_light(tf.translation((0.0, 0.0, h)), (I, I, I))
        scene = b.build()

        n = 8
        # The blocker (half-width 0.5 at z=h/2) shadows |x| < 1.0 on the
        # floor; camera rays must pass BESIDE it (|x| > 0.5) or they hit
        # the blocker's lit top face instead of the shadowed floor.
        x = np.array([0.6, 0.8, -0.7, -0.9, 3.0, -3.0, 4.0, -4.0], np.float32)
        o = jnp.asarray(np.stack([x, np.zeros(n), np.full(n, 6.0)], -1))
        d = jnp.asarray(np.tile(np.array([[0, 0, -1.0]], np.float32), (n, 1)))
        res = intg.path_li(
            scene.data, scene.meta, intg.PathParams(max_depth=1),
            UniformSampler(1), _ctx(n), o, d,
        )
        img = np.asarray(res.li)[:, 0]
        assert np.all(img[:4] == 0.0), f"umbra lit: {img[:4]}"
        r = np.sqrt(x[4:] ** 2 + h * h)
        expect = rho / np.pi * I * h / r**3
        assert np.allclose(img[4:], expect, rtol=1e-4)


class TestDistantLight:
    def test_cos_theta_exact(self):
        rho, L = 0.8, 5.0
        w = np.array([0.0, 0.6, 0.8], np.float32)  # unit, 36.87deg off +z
        b = SceneBuilder("distant")
        m = b.add_matte(kd=(rho,) * 3)
        _quad(b, 0.0, 50.0, m)
        b.add_distant_light((L, L, L), tuple(w))
        scene = b.build()
        n = 16
        x = np.linspace(-2, 2, n, dtype=np.float32)
        o = jnp.asarray(np.stack([x, np.zeros(n), np.full(n, 5.0)], -1))
        d = jnp.asarray(np.tile(np.array([[0, 0, -1.0]], np.float32), (n, 1)))
        res = intg.path_li(
            scene.data, scene.meta, intg.PathParams(max_depth=1),
            UniformSampler(1), _ctx(n), o, d,
        )
        img = np.asarray(res.li)[:, 0]
        expect = rho / np.pi * L * w[2]  # cos(theta) = w.z
        assert np.allclose(img, expect, rtol=1e-4)


class TestWhittedGlassClosedForm:
    """Normal-incidence dielectric split (whitted.rs:38-70 semantics):
    Fresnel R = ((eta-1)/(eta+1))^2 = 0.04 for eta=1.5; the reflected ray
    sees the background, the transmitted ray continues straight to a
    point-lit Lambertian floor."""

    def test_normal_incidence_split(self):
        eta = 1.5
        F = ((eta - 1.0) / (eta + 1.0)) ** 2  # 0.04
        L_bg = 3.0
        rho, I, h = 0.5, 20.0, 6.0  # light at z=-2+h above the floor

        b = SceneBuilder("glass-split")
        glass = b.add_glass(r=(1, 1, 1), t=(1, 1, 1), eta=eta)
        matte = b.add_matte(kd=(rho,) * 3)
        _quad(b, 0.0, 2.0, glass)  # glass pane at z=0
        _quad(b, -2.0, 50.0, matte)  # floor at z=-2
        b.add_point_light(tf.translation((0.0, 0.0, -2.0 + h)), (I, I, I))
        b.background = np.full(3, L_bg, np.float32)
        scene = b.build()

        n = 4
        o = jnp.asarray(
            np.stack([np.zeros(n), np.zeros(n), np.full(n, 1.0)], -1)
            .astype(np.float32)
        )
        d = jnp.asarray(np.tile(np.array([[0, 0, -1.0]], np.float32), (n, 1)))
        res = intg.whitted_li(
            scene.data, scene.meta, intg.WhittedParams(max_depth=2),
            UniformSampler(1), _ctx(n), o, d,
        )
        img = np.asarray(res.li)[:, 0]

        # NOTE on the expected value: the transmitted ray enters the pane
        # and, with a single infinitesimally thin quad, exits into the
        # floor region without a second interface; the floor's direct
        # lighting for the straight-down hit at (0,0,-2) is rho/pi * I/h^2
        # (cos=1). The NEE shadow ray to the light passes back through the
        # glass pane which OCCLUDES it (binary visibility; the reference
        # behaves identically — glass blocks shadow rays in both).
        # Expected therefore: F*L_bg + (1-F)*0 for the shadowed case.
        # Place the light below the pane? It is: light z = -2+6 = 4 > 0 is
        # ABOVE the pane, so the shadow ray is blocked and the floor term
        # is 0. Instead verify the reflection term and total:
        expect_blocked = F * L_bg
        assert np.allclose(img, expect_blocked, rtol=1e-3), img

    def test_normal_incidence_lit_floor(self):
        """Same geometry but the light sits BETWEEN pane and floor, so the
        transmitted path's NEE is unoccluded: exact two-term closed form."""
        eta = 1.5
        F = ((eta - 1.0) / (eta + 1.0)) ** 2
        L_bg = 3.0
        rho, I = 0.5, 20.0
        light_z = -1.0  # between pane (z=0) and floor (z=-2)
        h = light_z - (-2.0)  # height above floor = 1

        b = SceneBuilder("glass-split-lit")
        glass = b.add_glass(eta=eta)
        matte = b.add_matte(kd=(rho,) * 3)
        _quad(b, 0.0, 2.0, glass)
        _quad(b, -2.0, 50.0, matte)
        # Offset the light in x so the straight-down hit at the origin is
        # NOT coincident with the light position.
        lx = 0.8
        b.add_point_light(tf.translation((lx, 0.0, light_z)), (I, I, I))
        b.background = np.full(3, L_bg, np.float32)
        scene = b.build()

        n = 4
        o = jnp.asarray(
            np.stack([np.zeros(n), np.zeros(n), np.full(n, 1.0)], -1)
            .astype(np.float32)
        )
        d = jnp.asarray(np.tile(np.array([[0, 0, -1.0]], np.float32), (n, 1)))
        res = intg.whitted_li(
            scene.data, scene.meta, intg.WhittedParams(max_depth=2),
            UniformSampler(1), _ctx(n), o, d,
        )
        img = np.asarray(res.li)[:, 0]
        r2 = lx * lx + h * h
        floor_direct = rho / np.pi * I * (h / np.sqrt(r2)) / r2
        # Glass pane at z=0: the glass NEE at the pane itself contributes 0
        # (specular bsdf_f = 0). Light at z=-1 is below the pane so the
        # floor's shadow ray does not cross the glass.
        expect = F * L_bg + (1.0 - F) * floor_direct
        assert np.allclose(img, expect, rtol=1e-3), (img, expect)


class TestSigmaTexture:
    """Texture<f32> sigma (textures/mod.rs:12-16, matte.rs:22-41): a
    constant sigma texture must shade EXACTLY like the constant-sigma
    material, and a varying one must vary."""

    def _plane_scene(self, sigma_const=None, sigma_tex_img=None):
        rho, I, h = 0.6, 10.0, 3.0
        b = SceneBuilder("sigma-tex")
        if sigma_tex_img is not None:
            t = b.add_texture(sigma_tex_img)
            m = b.add_matte(kd=(rho,) * 3, sigma_tex=t)
        else:
            m = b.add_matte(kd=(rho,) * 3, sigma=sigma_const or 0.0)
        _quad(b, 0.0, 50.0, m)
        b.add_point_light(tf.translation((0.0, 0.0, h)), (I, I, I))
        return b.build()

    def _render(self, scene, n=16):
        x = np.linspace(-30.0, 30.0, n, dtype=np.float32)
        o = jnp.asarray(np.stack([x, np.zeros(n), np.full(n, 5.0)], -1))
        d = jnp.asarray(np.tile(np.array([[0, 0, -1.0]], np.float32), (n, 1)))
        res = intg.path_li(
            scene.data, scene.meta, intg.PathParams(max_depth=1),
            UniformSampler(1), _ctx(n), o, d,
        )
        return np.asarray(res.li)[:, 0]

    def test_constant_texture_matches_constant_sigma(self):
        sigma = 0.5  # radians
        img = np.full((1, 1, 3), sigma, np.float32)
        a = self._render(self._plane_scene(sigma_const=sigma))
        b = self._render(self._plane_scene(sigma_tex_img=img))
        assert np.allclose(a, b, rtol=1e-6), (a[:4], b[:4])

    def test_varying_texture_varies(self):
        # Left half sigma=0 (Lambertian), right half sigma=0.9.  The quad
        # spans [-50,50] with default planar uv; a 2-texel-wide texture
        # splits it at x=0.
        img = np.zeros((1, 2, 3), np.float32)
        img[0, 1] = 0.9
        vals = self._render(self._plane_scene(sigma_tex_img=img), n=16)
        lam = self._render(self._plane_scene(sigma_const=0.0), n=16)
        on = self._render(self._plane_scene(sigma_const=0.9), n=16)
        # Each half must match the corresponding constant-sigma render.
        half = 8
        matches_lam = np.isclose(vals, lam, rtol=1e-5)
        matches_on = np.isclose(vals, on, rtol=1e-5)
        # Every lane matches one of the two, and both appear.
        assert np.all(matches_lam | matches_on)
        assert matches_lam.any() and matches_on.any()
        # Oren-Nayar at normal-ish view differs from Lambertian.
        assert not np.allclose(lam, on, rtol=1e-3)
