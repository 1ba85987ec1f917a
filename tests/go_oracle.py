"""Scalar float64 oracle implementing the reference's live-path semantics.

An independent, deliberately-naive NumPy translation of the Go renderer's
math (renderer.go / material.go / scene.go / vector.go), used as ground
truth for parity tests of the vectorized TPU implementation. Slow by design;
use tiny images / few rays.

Deterministic mode: pass rng=None and avoid configs that draw randomness
(lambertian bounce handled: see trace(), soft_shadows=False, metal
roughness=0, no glass). Any attempted random draw raises.
"""

from __future__ import annotations

import math

import numpy as np


def norm(v):
    l = math.sqrt(float(v @ v))
    return v / l if l > 0 else v * 0.0


def reflect(v, n):
    return v - 2.0 * float(v @ n) * n


def refract_go(v, n, eta):
    """vector.go:81-96."""
    cos = float(v @ n)
    if cos > 0:
        n = -n
        eta = 1.0 / eta
        cos = -cos
    sin2 = eta * eta * (1.0 - cos * cos)
    if sin2 > 1.0:
        return reflect(v, n)
    cos2 = math.sqrt(1.0 - sin2)
    return v * eta - n * (eta * cos + cos2)


def reflectance(cosine, ref_idx):
    """material.go:282-286."""
    r0 = (1 - ref_idx) / (1 + ref_idx)
    r0 *= r0
    return r0 + (1 - r0) * (1 - cosine) ** 5


def schlick_vec(cos_theta, ior):
    """Metal/Shiny calculateFresnel (material.go:115-129). Scalar since RGB
    components are identical. (1-cos)^5 keeps sign for cos>1 (odd power)."""
    f0 = ((ior - 1.0) / (ior + 1.0)) ** 2
    x = 1.0 - cos_theta
    return f0 + (1.0 - f0) * (x ** 5 if x >= 0 else -((-x) ** 5))


def _mat(mdata):
    """scene.go:104-148 createMaterial semantics, as a dict."""
    t = (mdata or {}).get("type", "lambertian").lower()
    c = mdata.get("color")
    color = np.array([1.0, 1.0, 1.0]) if c is None else np.array(c, float)
    g = lambda k, d: float(mdata.get(k, d))
    if t == "metal":
        return dict(kind="metal", albedo=color,
                    roughness=min(g("roughness", 0.0), 1.0),
                    metallic=min(g("metallic", 1.0), 1.0),
                    specular=min(g("specular", 1.0), 1.0), ior=1.5)
    if t == "shiny":
        return dict(kind="shiny", albedo=color,
                    roughness=min(g("roughness", 0.0), 1.0),
                    metallic=min(g("metallic", 0.0), 1.0),
                    specular=min(g("specular", 1.0), 1.0), ior=1.5)
    if t == "perfectmirror":
        return dict(kind="perfectmirror", albedo=color,
                    roughness=min(g("roughness", 0.0), 1.0),
                    metallic=1.0, specular=1.0, ior=2.0)
    if t == "mirror":
        # advanced_materials.go:68-109 (loader-unreachable in Go; realized
        # by the extended loader): metallic/specular getters both 1.0.
        return dict(kind="mirror", albedo=color,
                    roughness=min(g("roughness", 0.0), 1.0),
                    metallic=1.0, specular=1.0, ior=1.5)
    if t == "glass":
        return dict(kind="glass", albedo=color, roughness=0.0, metallic=0.0,
                    specular=1.0, ior=g("refractionIndex", 1.5))
    if t == "dielectric":
        return dict(kind="dielectric", albedo=np.ones(3), roughness=0.0,
                    metallic=0.0, specular=1.0, ior=g("refractionIndex", 1.5))
    if t == "diffuselight":
        return dict(kind="diffuselight", albedo=np.zeros(3), roughness=1.0,
                    metallic=0.0, specular=0.0, ior=1.5, emit=color)
    return dict(kind="lambertian", albedo=color, roughness=1.0, metallic=0.0,
                specular=0.0, ior=1.5)


def _cube_tris(pos, size):
    """scene.go:150-185 exact triangulation."""
    p, h = np.array(pos, float), np.array(size, float) / 2.0
    sgn = [(-1, -1, -1), (1, -1, -1), (1, 1, -1), (-1, 1, -1),
           (-1, -1, 1), (1, -1, 1), (1, 1, 1), (-1, 1, 1)]
    verts = [p + h * np.array(s, float) for s in sgn]
    faces = [[0, 1, 2, 3], [1, 5, 6, 2], [5, 4, 7, 6],
             [4, 0, 3, 7], [3, 2, 6, 7], [4, 5, 1, 0]]
    tris = []
    for f in faces:
        v0, v1, v2, v3 = (verts[i] for i in f)
        tris.append((v0, v1, v2))
        tris.append((v0, v2, v3))
    return tris


class Oracle:
    def __init__(self, scene, max_depth=50, soft_shadows=True,
                 shadow_samples=16, recursive_reflections=True, rng=None,
                 lambertian_terminal=False):
        """lambertian_terminal: treat lambertian bounce rays as guaranteed
        misses (valid for single-convex-object scenes); keeps determinism."""
        self.max_depth = max_depth
        self.soft = soft_shadows
        self.nshadow = shadow_samples
        self.recursive = recursive_reflections
        self.rng = rng
        self.lam_terminal = lambertian_terminal
        cam = scene.get("camera", {})
        self.cam_pos = np.array(cam.get("position", [0, 0, 0]), float)
        self.aspect = float(cam.get("aspectRatio", 1.0))
        self.objects = []  # ('sphere', c, r, mat) | ('tri', v0,v1,v2, mat)
        for obj in scene.get("objects", []):
            m = _mat(obj.get("material", {}))
            if obj["type"] == "sphere":
                self.objects.append(("sphere", np.array(obj["position"], float),
                                     float(obj["radius"]), m))
            elif obj["type"] == "cube":
                for t in _cube_tris(obj["position"], obj["size"]):
                    self.objects.append(("tri",) + t + (m,))
        self.lights = [(np.array(l["position"], float),
                        np.array(l["color"], float), float(l["intensity"]))
                       for l in scene.get("lights", [])]

    # -- randomness ----------------------------------------------------------
    def _rand(self):
        if self.rng is None:
            raise AssertionError("random draw in deterministic oracle mode")
        return self.rng.random()

    def _ball(self):
        while True:
            p = np.array([self._rand(), self._rand(), self._rand()]) * 2 - 1
            if float(p @ p) < 1:
                return p

    # -- geometry -------------------------------------------------------------
    def _hit_sphere(self, c, r, o, d, tmin, tmax):
        oc = o - c
        a = float(d @ d)
        hb = float(oc @ d)
        cc = float(oc @ oc) - r * r
        disc = hb * hb - a * cc
        if disc < 0:
            return None
        sq = math.sqrt(disc)
        root = (-hb - sq) / a
        if root < tmin or tmax < root:
            root = (-hb + sq) / a
            if root < tmin or tmax < root:
                return None
        p = o + d * root
        outward = (p - c) / r
        ff = float(d @ outward) < 0
        n = outward if ff else -outward
        return root, p, n, ff

    def _hit_tri(self, v0, v1, v2, o, d, tmin, tmax):
        e1, e2 = v1 - v0, v2 - v0
        h = np.cross(d, e2)
        a = float(e1 @ h)
        if -1e-6 < a < 1e-6:
            return None
        f = 1.0 / a
        s = o - v0
        u = f * float(s @ h)
        if u < 0 or u > 1:
            return None
        q = np.cross(s, e1)
        v = f * float(d @ q)
        if v < 0 or u + v > 1:
            return None
        t = f * float(e2 @ q)
        if t < tmin or t > tmax:
            return None
        p = o + d * t
        n = norm(np.cross(e1, e2))
        ff = float(d @ n) < 0
        if not ff:
            n = -n
        return t, p, n, ff

    def hit_world(self, o, d, tmin, tmax):
        best, bm = None, None
        ct = tmax
        for ob in self.objects:
            if ob[0] == "sphere":
                h = self._hit_sphere(ob[1], ob[2], o, d, tmin, ct)
                m = ob[3]
            else:
                h = self._hit_tri(ob[1], ob[2], ob[3], o, d, tmin, ct)
                m = ob[4]
            if h is not None:
                ct = h[0]
                best, bm = h, m
        return (None, None) if best is None else (best, bm)

    # -- shading ---------------------------------------------------------------
    def scatter(self, m, o, d, p, n, ff):
        k = m["kind"]
        if k == "diffuselight":
            return None
        if k == "lambertian":
            sd = n + self._ball()
            if np.all(np.abs(sd) < 1e-8):
                sd = n
            return norm(sd), m["albedo"].copy(), True
        if k == "mirror":
            # advanced_materials.go:81-89: raw reflection + roughness*ball,
            # NOT normalized; didScatter = dot(scattered, n) > 0 (:88).
            r = reflect(d, n)
            if m["roughness"] > 0:
                r = r + self._ball() * m["roughness"]
            return r, m["albedo"].copy(), float(r @ n) > 0.0
        if k in ("metal", "shiny", "perfectmirror"):
            r = reflect(d, n)
            thresh = 0.0 if k == "shiny" else 0.001
            if m["roughness"] > thresh:
                r = norm(r + self._ball() * m["roughness"])
            cos = abs(float(d @ n))
            f = schlick_vec(cos, m["ior"])
            if k == "metal":
                fs = 0.6 + m["metallic"] * 0.4
                att = np.clip(m["albedo"] * (1 - fs) + f * fs, 0.0, 1.0)
                if m["metallic"] > 0.8:
                    mf = 0.4 + m["metallic"] * 0.5
                    att = att * (1 - mf) + f * mf
            elif k == "shiny":
                ss = 0.4 + m["specular"] * 0.4
                att = np.minimum(1.0, m["albedo"] * (1 - ss) + f * ss)
            else:
                att = m["albedo"] * 0.1 + f * 0.9
            return r, att, True
        # glass / dielectric
        att = m["albedo"].copy()
        ratio = (1.0 / m["ior"]) if ff else m["ior"]
        ud = norm(d)
        cos = min(float(-ud @ n), 1.0)
        sin = math.sqrt(1.0 - cos * cos)
        if ratio * sin > 1.0 or reflectance(cos, ratio) > self._rand():
            nd = reflect(ud, n)
        else:
            nd = refract_go(ud, n, ratio)
        return nd, att, True

    def smart_shadow(self, p, lpos):
        ldir = norm(lpos - p)
        ldist = float(np.linalg.norm(lpos - p))
        h, _ = self.hit_world(p, ldir, 0.001, ldist)
        if h is not None:
            return 0.0
        if self.soft:
            s = 0.0
            for _ in range(self.nshadow):
                sd = norm(ldir + self._ball() * 0.1)
                hh, _ = self.hit_world(p, sd, 0.001, ldist)
                if hh is None:
                    s += 1.0
            return s / self.nshadow
        return 1.0

    def direct(self, m, p, n):
        met = m["metallic"]
        amb = 0.05 if met > 0.9 else 0.07 if met > 0.7 else \
              0.08 if met > 0.5 else 0.1
        total = np.full(3, amb)
        for lpos, lcol, lint in self.lights:
            ldist = float(np.linalg.norm(lpos - p))
            if ldist < 0.001:
                continue
            ldir = norm(lpos - p)
            sf = self.smart_shadow(p, lpos)
            if sf > 0.0:
                cos = max(0.0, float(n @ ldir))
                inten = cos * lint / (ldist * ldist)
                ds = 0.05 if met > 0.95 else 0.08 if met > 0.9 else \
                     0.12 if met > 0.8 else 0.15 if met > 0.7 else \
                     0.2 if met > 0.5 else 0.25
                total = total + m["albedo"] * (ds * inten * sf)
                if met > 0.5:
                    vd = norm(-p)
                    hd = norm(ldir + vd)
                    sp = 64.0 if met > 0.9 else 48.0 if met > 0.8 else 32.0
                    si = max(0.0, float(n @ hd)) ** sp
                    total = total + lcol * (si * inten * sf * met * 3.0)
        return total

    def trace(self, o, d, depth=0):
        if depth >= self.max_depth:
            return np.zeros(3)
        res, m = self.hit_world(o, d, 0.001, math.inf)
        if res is None:
            return np.zeros(3)
        t, p, n, ff = res
        emitted = m.get("emit", np.zeros(3))
        dl = self.direct(m, p, n)
        if m["kind"] == "lambertian" and self.lam_terminal:
            # deterministic shortcut: the lambertian bounce ray always points
            # into the outward hemisphere, so on a single-convex-object scene
            # it is a guaranteed miss -> reflected term is exactly 0 and
            # (metallic=0) the else-branch gives emitted + direct + att*0.
            return emitted + dl
        sc = self.scatter(m, o, d, p, n, ff)
        if sc is None:
            return emitted + dl
        nd, att, did = sc
        if not did:
            # renderer.go:181-184: didScatter false -> emitted + direct
            # (reachable only via Mirror's below-surface branch).
            return emitted + dl
        refl = np.zeros(3)
        if self.recursive:
            refl = self.trace(p, nd, depth + 1)
        met = m["metallic"]
        for thresh, wr in ((0.95, 0.85), (0.9, 0.8), (0.8, 0.75),
                           (0.7, 0.7), (0.5, 0.6), (0.2, 0.4)):
            if met > thresh:
                return emitted + dl * (1 - wr) + att * refl * wr
        return emitted + dl + att * refl

    # -- camera (renderer.go:377-390) -------------------------------------
    def get_ray(self, u, v):
        vw = 2.0 * self.aspect
        horiz = np.array([vw, 0.0, 0.0])
        vert = np.array([0.0, 2.0, 0.0])
        ll = self.cam_pos - horiz / 2 - vert / 2 - np.array([0.0, 0.0, 1.0])
        return self.cam_pos, ll + u * horiz + v * vert - self.cam_pos

    def tonemap(self, c):
        c = 1.0 - np.exp(-c)
        c = np.maximum(c, 0.0) ** (1 / 2.2)
        return np.clip(c, 0.0, 1.0)
