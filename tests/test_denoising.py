"""Cross-bilateral denoiser (denoising.py): smoothing vs edge preservation."""

import numpy as np

from raytrace_tpu.denoising import denoise
from raytrace_tpu import aov
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import scene as scene_mod
from raytrace_tpu import trace as trace_mod

import jax.numpy as jnp


def _synthetic():
    """Two flat regions split by a feature edge: left/right halves have
    different depth+normal+albedo; the image carries iid noise."""
    H, W = 24, 32
    rs = np.random.default_rng(0)
    img = np.where(np.arange(W)[None, :, None] < W // 2, 0.2, 0.8)
    img = np.broadcast_to(img, (H, W, 3)).astype(np.float32).copy()
    noisy = img + rs.normal(0, 0.05, img.shape).astype(np.float32)
    left = np.arange(W)[None, :] < W // 2
    aovs = {
        "depth": np.where(left, 5.0, 9.0).astype(np.float32)
                 * np.ones((H, W), np.float32),
        "normal": np.where(left[..., None],
                           np.array([0, 0, 1.0], np.float32),
                           np.array([1.0, 0, 0], np.float32))
                  * np.ones((H, W, 3), np.float32),
        "albedo": np.where(left[..., None], 0.2, 0.8).astype(np.float32)
                  * np.ones((H, W, 3), np.float32),
        "hit": np.ones((H, W), bool),
    }
    return img, noisy, aovs, left


def test_denoise_reduces_noise_preserves_edge():
    clean, noisy, aovs, left = _synthetic()
    out = denoise(noisy, aovs, radius=3)
    assert isinstance(out, np.ndarray)
    # interior noise drops by a lot (measure away from the split)
    err_in = np.abs(noisy - clean)[:, 4:12].mean()
    err_out = np.abs(out - clean)[:, 4:12].mean()
    assert err_out < 0.35 * err_in
    # the edge survives: means of the two sides stay far apart right at
    # the boundary columns
    bl = out[:, left[0]][:, -1].mean()   # last left column
    br = out[:, ~left[0]][:, 0].mean()   # first right column
    assert br - bl > 0.45                # clean separation is 0.6


def test_denoise_ignores_wrapped_neighbors():
    """jnp.roll wraps; the mask must stop the left frame edge from
    blending with the right frame edge."""
    clean, noisy, aovs, _ = _synthetic()
    # make the two frame edges identical in features but far in value:
    # if wrap leaked, column 0 would pull toward column -1's value
    out = denoise(noisy, aovs, radius=3)
    assert abs(out[:, 0].mean() - 0.2) < 0.1
    assert abs(out[:, -1].mean() - 0.8) < 0.1


def test_denoise_miss_pixels_pass_through():
    """Center-ray miss pixels carry partial silhouette coverage at low
    spp; the filter must leave them untouched."""
    clean, noisy, aovs, _ = _synthetic()
    aovs["hit"][:, :4] = False
    out = denoise(noisy, aovs, radius=3)
    np.testing.assert_array_equal(out[:, :4], noisy[:, :4])
    assert not np.array_equal(out[:, 8:12], noisy[:, 8:12])


def test_denoise_variance_term_preserves_converged_detail():
    """SVGF-style radiance edge-stopping: a high-frequency pattern with
    near-zero MC variance must survive filtering (the feature buffers
    alone would smear it), while a genuinely noisy flat region still
    smooths."""
    H, W = 16, 32
    rs = np.random.default_rng(1)
    # left half: sharp converged stripes; right half: flat + noise
    stripes = 0.2 + 0.6 * (np.arange(W)[None, :] % 2)
    clean = np.where(np.arange(W)[None, :] < W // 2, stripes, 0.5)
    clean = np.broadcast_to(clean[..., None], (H, W, 3)).astype(np.float32)
    noise = rs.normal(0, 0.08, clean.shape).astype(np.float32)
    noise[:, :W // 2] = 0.0                      # left is converged
    noisy = clean + noise
    var = np.where(np.arange(W)[None, :] < W // 2, 1e-8, 0.08 ** 2)
    var = (var * np.ones((H, W))).astype(np.float32)
    aovs = {"depth": np.full((H, W), 5.0, np.float32),
            "normal": np.broadcast_to(
                np.array([0, 0, 1.0], np.float32), (H, W, 3)).copy(),
            "albedo": np.full((H, W, 3), 0.5, np.float32),
            "hit": np.ones((H, W), bool)}
    plain = denoise(noisy, aovs, radius=2)
    guided = denoise(noisy, aovs, radius=2, variance=var, sigma_lum=4.0)
    L, R = (slice(None), slice(2, W // 2 - 2)), (slice(None),
                                                 slice(W // 2 + 2, -2))
    # stripes: guided stays near-exact, plain smears them flat
    assert np.abs(guided[L] - clean[L]).mean() < 0.02
    assert np.abs(plain[L] - clean[L]).mean() > 0.1
    # noisy flat side still denoises under guidance
    assert (np.abs(guided[R] - clean[R]).mean()
            < 0.7 * np.abs(noisy[R] - clean[R]).mean())


def test_denoise_atrous_beats_dense_on_flat_noise():
    """The a-trous passes reach low-frequency noise the dense small
    kernel cannot: on a flat noisy field, 3 wavelet rounds leave much
    less residual than the single radius-3 pass, and the edge-stopping
    still holds across a feature boundary."""
    H, W = 48, 64
    rs = np.random.default_rng(0)
    clean = np.full((H, W, 3), 0.5, np.float32)
    noisy = clean + rs.normal(0, 0.1, clean.shape).astype(np.float32)
    var = np.full((H, W), 0.1 ** 2, np.float32)
    aovs = {"depth": np.full((H, W), 5.0, np.float32),
            "normal": np.broadcast_to(
                np.array([0, 0, 1.0], np.float32), (H, W, 3)).copy(),
            "albedo": np.full((H, W, 3), 0.5, np.float32),
            "hit": np.ones((H, W), bool)}
    inner = (slice(8, -8), slice(8, -8))
    base = np.abs(noisy - clean)[inner].mean()
    single = denoise(noisy, aovs, radius=3, variance=var, sigma_lum=8.0)
    atrous = denoise(noisy, aovs, passes=3, variance=var, sigma_lum=8.0)
    assert np.abs(atrous - clean)[inner].mean() \
        < 0.5 * np.abs(single - clean)[inner].mean()
    assert np.abs(atrous - clean)[inner].mean() < 0.12 * base

    # feature edge survives the wide footprint
    clean2, noisy2, aovs2, left = _synthetic()
    out = denoise(noisy2, aovs2, passes=3)
    bl = out[:, left[0]][:, -1].mean()
    br = out[:, ~left[0]][:, 0].mean()
    assert br - bl > 0.45


def test_denoise_end_to_end_with_render():
    """Adaptive low-spp render + AOVs + denoise: the filtered image gets
    closer to a high-spp reference on smooth regions."""
    W, H = 24, 18
    d = {"camera": {"position": [0, 0, 5], "aspectRatio": W / H},
         "objects": [
             {"type": "sphere", "position": [0, 0, 0], "radius": 1.0,
              "material": {"type": "lambertian",
                           "color": [0.7, 0.4, 0.3]}},
             {"type": "sphere", "position": [0, -101, 0], "radius": 100,
              "material": {"type": "lambertian",
                           "color": [0.5, 0.5, 0.5]}}],
         "lights": [{"position": [3, 4, 4], "color": [1, 1, 1],
                     "intensity": 25.0}]}
    scene, _ = scene_mod.from_dict(d)
    cfg = trace_mod.TraceConfig(seed=0, max_depth=3, shadow_samples=2)
    noisy = np.asarray(renderer_mod.render_band(
        scene, jnp.int32(0), width=W, height=H, band_h=H, samples=2,
        cfg=cfg))
    ref = np.asarray(renderer_mod.render_band(
        scene, jnp.int32(0), width=W, height=H, band_h=H, samples=128,
        cfg=cfg))
    aovs = aov.render_aovs(scene, width=W, height=H)
    out = denoise(noisy, aovs, radius=2)
    hit = aovs["hit"]
    assert (np.abs(out - ref).mean(axis=-1)[hit].mean()
            < np.abs(noisy - ref).mean(axis=-1)[hit].mean())
