"""Tests for the parity-component modules: fastmath, bvh, atmosphere,
effects, obs, bench suite."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytrace_tpu import atmosphere as atmo
from raytrace_tpu import bvh as bvh_mod
from raytrace_tpu import effects
from raytrace_tpu import fastmath as fm
from raytrace_tpu import obs
from raytrace_tpu import scene as scene_mod


# --- fastmath ---------------------------------------------------------------

def test_xorshift64star_bit_exact():
    """Known-answer test for the Go FastRandom sequence
    (advanced_math.go:15-20): state 1 -> x^= >>12, <<25, >>27; *M."""
    r = fm.FastRandom(1)
    # Hand-computed first step: x=1 -> 1^(1>>12)=1 -> 1^(1<<25)=0x2000001
    # -> ^(>>27)=0x2000001 -> *2685821657736338717 (mod 2^64)
    first = r.next_uint64()
    x = np.uint64(1)
    x ^= x >> np.uint64(12)
    x = x ^ ((x << np.uint64(25)) & np.uint64(0xFFFFFFFFFFFFFFFF))
    x ^= x >> np.uint64(27)
    expect = (int(x) * 2685821657736338717) & 0xFFFFFFFFFFFFFFFF
    assert first == expect
    # floats in [0,1)
    vals = [r.float64() for _ in range(100)]
    assert all(0.0 <= v < 1.0 for v in vals)
    assert len(set(vals)) == 100  # no repeats
    # vectorized form agrees with the scalar struct
    r2 = fm.FastRandom(12345)
    with jax.enable_x64():
        # the array must be BUILT under x64 too - outside it, JAX silently
        # truncates to uint32 (which xorshift64star now rejects)
        states = jnp.asarray([np.uint64(12345)], jnp.uint64)
        st, out = fm.xorshift64star(states)
        assert int(out[0]) == r2.next_uint64()
    # without x64 the truncated state must be rejected, not mis-computed
    with pytest.raises(TypeError):
        fm.xorshift64star(jnp.asarray([12345], jnp.uint32))


def test_fast_wrappers_and_vec_ops():
    x = jnp.asarray([0.25, 1.0, 4.0])
    np.testing.assert_allclose(fm.fast_sqrt(x), np.sqrt(np.asarray(x)))
    np.testing.assert_allclose(fm.fast_clamp(x, 0.5, 2.0),
                               np.clip(np.asarray(x), 0.5, 2.0))
    np.testing.assert_allclose(fm.fast_lerp(0.0, 10.0, 0.25), 2.5)
    np.testing.assert_allclose(fm.fast_smooth_step(0.0, 1.0, 0.5), 0.5)
    a = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 2.0, 0.0]])
    b = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]])
    np.testing.assert_allclose(fm.vec3_dot(a, b), [0.0, 2.0])
    np.testing.assert_allclose(fm.vec3_cross(a, b)[0], [0.0, 0.0, 1.0])
    np.testing.assert_allclose(fm.vec3_normalize(jnp.zeros((1, 3))), 0.0)
    v = jnp.asarray([[1.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(fm.vec3_reflect(v, n), [[1.0, 1.0, 0.0]])


def test_noise_properties():
    x = jnp.linspace(0.0, 10.0, 257)
    n1 = np.asarray(fm.fast_noise_1d(x))
    assert n1.min() >= 0.0 and n1.max() < 1.0
    assert n1.std() > 0.05  # not constant
    # deterministic
    np.testing.assert_array_equal(n1, np.asarray(fm.fast_noise_1d(x)))
    # different seeds differ
    assert not np.array_equal(n1, np.asarray(fm.fast_noise_1d(x, seed=7)))
    n3 = np.asarray(fm.fast_noise_3d(x, x * 0.7, x * 1.3))
    assert n3.shape == x.shape and n3.std() > 0.05
    f = np.asarray(fm.fbm_3d(x, x, x, octaves=3))
    assert f.shape == x.shape


def test_number_theory():
    n = jnp.asarray([1, 2, 3, 4, 17, 25, 97, 100])
    np.testing.assert_array_equal(
        np.asarray(fm.is_prime(n)),
        [False, True, True, False, True, False, True, False])
    with jax.enable_x64():
        fib = np.asarray(fm.fibonacci(10))
    np.testing.assert_array_equal(fib, [0, 1, 1, 2, 3, 5, 8, 13, 21, 34])
    np.testing.assert_array_equal(
        np.asarray(fm.is_palindrome_number(jnp.asarray([121, 123, 7, 1221]))),
        [True, False, True, True])


# --- bvh --------------------------------------------------------------------

@pytest.fixture(scope="module")
def sphere_cloud():
    rng = np.random.default_rng(3)
    centers = rng.uniform(-10, 10, (200, 3)).astype(np.float32)
    radii = rng.uniform(0.1, 0.6, 200).astype(np.float32)
    return centers, radii


def test_bvh_matches_brute_force(sphere_cloud):
    centers, radii = sphere_cloud
    tree = bvh_mod.build_sphere_bvh(centers, radii)
    rng = np.random.default_rng(4)
    o = rng.uniform(-12, 12, (128, 3)).astype(np.float32)
    d = rng.normal(size=(128, 3)).astype(np.float32)
    t_bvh, pid = bvh_mod.closest_hit_bvh(
        tree, jnp.asarray(centers), jnp.asarray(radii),
        jnp.asarray(o), jnp.asarray(d))
    from raytrace_tpu.ops import intersect
    ts = np.asarray(intersect.sphere_t(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(centers),
        jnp.asarray(radii), 1e-3, intersect.BIG))
    t_ref = ts.min(axis=1)
    hit = t_ref < 1e38
    np.testing.assert_allclose(np.asarray(t_bvh)[hit], t_ref[hit],
                               rtol=1e-5)
    assert (np.asarray(pid)[~hit] == -1).all()


def test_bvh_skip_pointers_are_dfs_consistent(sphere_cloud):
    centers, radii = sphere_cloud
    tree = bvh_mod.build_sphere_bvh(centers, radii)
    n = int(tree.node_min.shape[0])
    skip = np.asarray(tree.node_skip)
    count = np.asarray(tree.node_count)
    assert skip[0] == n
    for i in range(n):
        assert i < skip[i] <= n
        if count[i] > 0:
            continue
        # inner node: left child is i+1 and its skip is within my subtree
        assert skip[i + 1] <= skip[i]


def test_octree_and_kdtree_queries(sphere_cloud):
    centers, radii = sphere_cloud
    lo = centers - radii[:, None]
    hi = centers + radii[:, None]
    oc = bvh_mod.Octree(lo, hi)
    got = oc.query_point(centers[13])
    ref = sorted(i for i in range(len(lo))
                 if np.all(lo[i] <= centers[13])
                 and np.all(centers[13] <= hi[i]))
    assert got == ref
    kd = bvh_mod.KDTree(lo, hi)
    qlo, qhi = centers[50] - 1.0, centers[50] + 1.0
    got = kd.query_range(qlo, qhi)
    ref = sorted(i for i in range(len(lo))
                 if np.all(lo[i] <= qhi) and np.all(qlo <= hi[i]))
    assert got == ref


def test_octree_and_kdtree_ray_query(sphere_cloud):
    """query_ray == brute-force AABB slab sweep, for both structures
    (the working form of spatial_acceleration.go:141-171 / :244-300)."""
    centers, radii = sphere_cloud
    lo = centers - radii[:, None]
    hi = centers + radii[:, None]
    oc = bvh_mod.Octree(lo, hi)
    kd = bvh_mod.KDTree(lo, hi)
    rng = np.random.default_rng(7)
    for _ in range(16):
        o = rng.uniform(-12, 12, 3)
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        ref = sorted(i for i in range(len(lo))
                     if bvh_mod._ray_aabb_host(o, d, lo[i], hi[i],
                                               1e-3, 1e9))
        assert oc.query_ray(o, d, 1e-3, 1e9) == ref
        assert kd.query_ray(o, d, 1e-3, 1e9) == ref


def test_octree_and_kdtree_closest_hit(sphere_cloud):
    """closest_hit == brute-force min over per-sphere hit distances."""
    centers, radii = sphere_cloud
    lo = centers - radii[:, None]
    hi = centers + radii[:, None]
    oc = bvh_mod.Octree(lo, hi)
    kd = bvh_mod.KDTree(lo, hi)

    def hit_t(i, t_min, t_max):
        t = float(bvh_mod.sphere_hit_t(
            jnp.asarray(np.float32([0, 0, 20])),
            jnp.asarray(d32), jnp.asarray(np.float32(centers[i])),
            jnp.float32(radii[i]), t_min, t_max))
        return t

    rng = np.random.default_rng(11)
    for _ in range(8):
        target = centers[rng.integers(len(centers))]
        d = target - np.asarray([0.0, 0.0, 20.0])
        d /= np.linalg.norm(d)
        d32 = np.float32(d)
        ts = [hit_t(i, 1e-3, 1e9) for i in range(len(centers))]
        i_ref = int(np.argmin(ts))
        t_ref = ts[i_ref]
        for t_got, i_got in (oc.closest_hit([0, 0, 20], d, hit_t),
                             kd.closest_hit([0, 0, 20], d, hit_t)):
            if t_ref >= 1e9:
                assert i_got == -1
            else:
                assert i_got == i_ref
                np.testing.assert_allclose(t_got, t_ref, rtol=1e-5)


# --- atmosphere -------------------------------------------------------------

def test_sky_color_properties():
    s = atmo.presets()["default"]
    d = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 0.0, -1.0],
                     [0.3, 0.8, 0.5]])
    c = np.asarray(atmo.get_sky_color(d, s))
    assert c.shape == (3, 3)
    assert (c >= 0.1).all() and (c <= 0.98).all()  # the odd clamp
    # sun direction pixel is brighter than the anti-sun direction
    sun = np.asarray(atmo.get_sky_color(
        jnp.asarray(s.sun_direction, jnp.float32), s))
    anti = np.asarray(atmo.get_sky_color(
        -jnp.asarray(s.sun_direction, jnp.float32), s))
    assert sun.sum() > anti.sum()
    # night preset is darker than default
    n = np.asarray(atmo.get_sky_color(d, atmo.presets()["night"]))
    assert n.sum() < c.sum()


def test_phase_functions_normalize():
    """Integral of each phase over the sphere ~ 1."""
    mu = np.linspace(-1, 1, 20001)
    for phase in (atmo.rayleigh_phase,
                  lambda c: atmo.henyey_greenstein_phase(c, 0.76)):
        vals = np.asarray(phase(jnp.asarray(mu, jnp.float32)))
        integral = 2 * np.pi * np.trapezoid(vals, mu)
        np.testing.assert_allclose(integral, 1.0, rtol=1e-2)


def test_atmospheric_attenuation():
    a = np.asarray(atmo.atmospheric_attenuation(jnp.asarray([0.0, 10.0])))
    np.testing.assert_allclose(a[0], 1.0)
    np.testing.assert_allclose(a[1], np.exp(-1.0) * np.exp(-0.5),
                               rtol=1e-5)


# --- effects ----------------------------------------------------------------

def test_fog_modes():
    d = jnp.asarray([0.0, 50.0, 1e4])
    for mode in ("linear", "exp", "exp2"):
        f = np.asarray(effects.fog_factor(d, mode=mode))
        assert f[0] > f[1] > f[2] or (f[0] >= f[1] >= f[2])
        assert f[0] == pytest.approx(1.0)
    c = np.asarray(effects.apply_fog(jnp.zeros((3, 3)), d))
    assert c[2].sum() > c[0].sum()  # far pixels -> fog color


def test_bloom_vignette_aberration():
    img = np.zeros((16, 16, 3), np.float32)
    img[8, 8] = 10.0  # bright spot
    out = np.asarray(effects.bloom(jnp.asarray(img), threshold=1.0))
    assert out[8, 10].sum() > img[8, 10].sum()  # glow spread
    v = np.asarray(effects.vignette(jnp.ones((16, 16, 3))))
    assert v[0, 0].sum() < v[8, 8].sum()  # corners darker
    ca = np.asarray(effects.chromatic_aberration(jnp.asarray(img), 2.0))
    assert ca.shape == img.shape


def test_volumetric_light_accumulates():
    lights = scene_mod.Lights(
        position=jnp.asarray([[0.0, 5.0, 0.0]]),
        color=jnp.asarray([[1.0, 1.0, 1.0]]),
        intensity=jnp.asarray([2.0]))
    o = jnp.zeros((4, 3))
    d = jnp.asarray([[0.0, 1.0, 0.0]] * 4)
    r = np.asarray(effects.volumetric_light(o, d, jnp.full((4,), 10.0),
                                            lights, steps=16))
    assert (r > 0).all()
    r2 = np.asarray(effects.volumetric_light(o, d, jnp.full((4,), 1.0),
                                             lights, steps=16))
    assert r.sum() > r2.sum()  # longer march gathers more


# --- obs --------------------------------------------------------------------

def test_metrics_collector_and_progress(capsys):
    c = obs.MetricsCollector()
    c.start(total_pixels=100)
    c.record_pixels(50)
    c.record_rays(5000)
    m = c.snapshot()
    assert m.progress == pytest.approx(0.5)
    assert m.rays_traced == 5000
    assert m.pixels_per_second > 0
    import io
    buf = io.StringIO()
    rep = obs.ProgressReporter(c, stream=buf)
    rep.report(force=True)
    rep.finish()
    assert "%" in buf.getvalue()


def test_performance_monitor_alerts():
    c = obs.MetricsCollector()
    c.start(total_pixels=10)
    mon = obs.PerformanceMonitor(c, max_memory_bytes=-1)  # always alert
    seen = []
    mon.add_handler(seen.append)
    alerts = mon.check()
    assert alerts and alerts[0].name == "memory"
    assert seen == alerts


def test_profiler_stats():
    p = obs.Profiler()
    stats = p.get_stats()
    assert "host_memory_bytes" in stats


# --- bench suite ------------------------------------------------------------

def test_benchmark_suite_runs():
    from raytrace_tpu.bench.suite import (BenchmarkConfig, BenchmarkSuite,
                                          ring_scene_dict)
    d = ring_scene_dict(n_spheres=4)
    assert len(d["objects"]) == 5  # ground + ring
    suite = BenchmarkSuite(BenchmarkConfig(
        width=16, height=12, samples_list=(1,), max_depth=3,
        repetitions=1, warmup=0))
    res = suite.run(progress=False)
    assert len(res) == 1
    assert res[0].rays_per_second > 0
    rep = suite.report_dict()
    assert rep["results"][0]["samples"] == 1


def test_scaling_benchmark_runs():
    """scaling_benchmark produces a (shapes, times, efficiency) record on
    the virtual CPU mesh (the committed numbers in BENCHMARKS.md come from
    the same function at full size)."""
    from raytrace_tpu.bench.suite import scaling_benchmark
    out = scaling_benchmark(width=32, height=24, samples=1,
                            mesh_shapes=(1, 2))
    assert out["shapes"] == [1, 2]
    assert len(out["times"]) == 2 and all(t > 0 for t in out["times"])
    assert len(out["efficiency"]) == 2
    assert abs(out["efficiency"][0] - 1.0) < 1e-9


# --- scene-config effects wiring -------------------------------------------

def test_render_honors_config_blocks(simple_scene_dict):
    import raytrace_tpu as rt
    d = dict(simple_scene_dict)
    d["atmospheric"] = {"enabled": True, "preset": "sunset"}
    d["fog"] = {"enabled": True, "density": 0.05}
    d["vignette"] = {"enabled": True}
    scene, cfg = rt.scene_from_dict(d)
    r = rt.Renderer()
    r.samples, r.max_depth = 1, 3
    plain = r.render(scene, 16, 12)
    with_fx = r.render(scene, 16, 12, scene_config=cfg)
    assert with_fx.shape == plain.shape
    # sunset sky fills the miss pixels -> image brightens
    assert with_fx.astype(float).mean() > plain.astype(float).mean()


def test_profiler_server_start_stop():
    """start_server binds the profiling endpoint; stop_server actually
    shuts it down (round-1 review: dropping the reference left the port
    bound)."""
    from raytrace_tpu import obs
    p = obs.Profiler()
    p.start_server(port=18764)
    assert p._server is not None
    p.stop_server()
    assert p._server is None
