"""Canonical scene presets.

Counterpart of the reference's scene construction [E: main.cpp random_scene()
and inline scene lists] (SURVEY.md §2.1 "scene builders").  Each preset maps
to one of the driver's workloads [BASELINE.json:7-10] and returns
``(scene, camera, config)``.  Scene construction is host-side Python (runs
once), exactly like the reference's heap building — only the frozen SoA goes
to the device.
"""
from __future__ import annotations

import numpy as np

from ..render.camera import make_camera
from ..render.integrator import RenderConfig
from .soa import SceneBuilder

__all__ = ["three_spheres", "random_scene", "triangle_scene",
           "camera_showcase", "sphere_field", "PRESETS", "build_preset"]


def three_spheres(nx=200, ny=100, spp=100):
    """3-sphere lambertian/metal/dielectric demo + ground [BASELINE.json:7].

    The book's ch.10-12 scene: center diffuse, right metal, left glass (with
    the hollow negative-radius inner shell), large ground sphere; simple
    pinhole 90-degree camera at the origin.
    """
    b = SceneBuilder()
    m_ground = b.lambertian((0.8, 0.8, 0.0))
    m_center = b.lambertian((0.1, 0.2, 0.5))
    m_metal = b.metal((0.8, 0.6, 0.2), fuzz=0.3)
    m_glass = b.dielectric(1.5)
    b.sphere((0.0, -100.5, -1.0), 100.0, m_ground)
    b.sphere((0.0, 0.0, -1.0), 0.5, m_center)
    b.sphere((1.0, 0.0, -1.0), 0.5, m_metal)
    b.sphere((-1.0, 0.0, -1.0), 0.5, m_glass)
    b.sphere((-1.0, 0.0, -1.0), -0.45, m_glass)  # hollow shell
    cam = make_camera((0, 0, 0), (0, 0, -1), (0, 1, 0),
                      90.0, nx / ny, aperture=0.0, focus_dist=1.0)
    return b.build(), cam, RenderConfig(nx=nx, ny=ny, spp=spp)


def random_scene(nx=1200, ny=800, spp=10, seed=7, checker_ground=False):
    """The ~500-sphere "final scene" [BASELINE.json:8].

    22x22 grid of small spheres with the reference's material roulette
    (p < 0.8 diffuse, p < 0.95 metal, else glass), three large feature
    spheres, giant ground sphere; book camera lookfrom (13,2,3), vfov 20,
    aperture 0.1, focus 10 [E: main.cpp random_scene()].
    """
    rng_ = np.random.RandomState(seed)
    b = SceneBuilder()
    if checker_ground:
        m_ground = b.checker_lambertian((0.9, 0.9, 0.9), (0.2, 0.3, 0.1))
    else:
        m_ground = b.lambertian((0.5, 0.5, 0.5))
    b.sphere((0.0, -1000.0, 0.0), 1000.0, m_ground)
    for a in range(-11, 11):
        for bb in range(-11, 11):
            choose = rng_.rand()
            center = np.array([a + 0.9 * rng_.rand(), 0.2,
                               bb + 0.9 * rng_.rand()])
            if np.linalg.norm(center - np.array([4.0, 0.2, 0.0])) <= 0.9:
                continue
            if choose < 0.8:
                albedo = rng_.rand(3) * rng_.rand(3)
                mat = b.lambertian(albedo)
            elif choose < 0.95:
                albedo = 0.5 * (1.0 + rng_.rand(3))
                mat = b.metal(albedo, fuzz=0.5 * rng_.rand())
            else:
                mat = b.dielectric(1.5)
            b.sphere(center, 0.2, mat)
    b.sphere((0.0, 1.0, 0.0), 1.0, b.dielectric(1.5))
    b.sphere((-4.0, 1.0, 0.0), 1.0, b.lambertian((0.4, 0.2, 0.1)))
    b.sphere((4.0, 1.0, 0.0), 1.0, b.metal((0.7, 0.6, 0.5), fuzz=0.0))
    cam = make_camera((13, 2, 3), (0, 0, 0), (0, 1, 0),
                      20.0, nx / ny, aperture=0.1, focus_dist=10.0)
    return b.build(), cam, RenderConfig(nx=nx, ny=ny, spp=spp)


def _tetrahedron(b: SceneBuilder, base, size, mat):
    """Four triangles of a regular-ish tetrahedron."""
    p = np.asarray(base, np.float64)
    s = size
    v = [p + s * np.array(d) for d in
         [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.5, 0.0, 0.87),
          (0.5, 0.82, 0.43)]]
    for tri in [(0, 2, 1), (0, 1, 3), (1, 2, 3), (2, 0, 3)]:
        b.triangle(v[tri[0]], v[tri[1]], v[tri[2]], mat)


def triangle_scene(nx=400, ny=200, spp=10):
    """Triangle-mesh workload [BASELINE.json:9]: tetrahedra + quad floor +
    spheres, exercising ray-triangle intersection and a mixed-primitive BVH.
    """
    b = SceneBuilder()
    m_floor = b.lambertian((0.6, 0.6, 0.6))
    m_red = b.lambertian((0.8, 0.2, 0.2))
    m_metal = b.metal((0.8, 0.8, 0.9), fuzz=0.05)
    m_glass = b.dielectric(1.5)
    # Floor quad as two triangles (winding -> +y normal).
    f = 6.0
    b.triangle((-f, 0, -f), (-f, 0, f), (f, 0, -f), m_floor)
    b.triangle((f, 0, -f), (-f, 0, f), (f, 0, f), m_floor)
    _tetrahedron(b, (-1.6, 0.0, -1.2), 1.4, m_red)
    _tetrahedron(b, (0.3, 0.0, -0.4), 1.0, m_metal)
    b.sphere((1.6, 0.5, -1.5), 0.5, m_glass)
    b.sphere((-0.3, 0.35, 0.9), 0.35, m_metal)
    cam = make_camera((0.5, 1.6, 3.2), (0.0, 0.6, -0.6), (0, 1, 0),
                      38.0, nx / ny, aperture=0.0)
    return b.build(), cam, RenderConfig(nx=nx, ny=ny, spp=spp)


def camera_showcase(nx=200, ny=100, spp=100):
    """Camera-effects workload [BASELINE.json:10]: large-aperture defocus
    blur + jittered AA + gamma + checker ground, narrow-fov offset camera
    (the book's ch.12 depth-of-field setup).
    """
    b = SceneBuilder()
    m_ground = b.checker_lambertian((0.8, 0.8, 0.0), (0.3, 0.25, 0.05))
    m_center = b.lambertian((0.1, 0.2, 0.5))
    m_metal = b.metal((0.8, 0.6, 0.2), fuzz=0.0)
    m_glass = b.dielectric(1.5)
    b.sphere((0.0, -100.5, -1.0), 100.0, m_ground)
    b.sphere((0.0, 0.0, -1.0), 0.5, m_center)
    b.sphere((1.0, 0.0, -1.0), 0.5, m_metal)
    b.sphere((-1.0, 0.0, -1.0), 0.5, m_glass)
    b.sphere((-1.0, 0.0, -1.0), -0.45, m_glass)
    lookfrom, lookat = (3.0, 3.0, 2.0), (0.0, 0.0, -1.0)
    dist = float(np.linalg.norm(np.subtract(lookfrom, lookat)))
    cam = make_camera(lookfrom, lookat, (0, 1, 0), 20.0, nx / ny,
                      aperture=2.0, focus_dist=dist)
    return b.build(), cam, RenderConfig(nx=nx, ny=ny, spp=spp)


def sphere_field(n=20000, nx=800, ny=450, spp=4, seed=11):
    """Large-scene stress workload: an n-sphere jittered grid field.

    The scale regime where an acceleration structure earns its keep
    (SURVEY.md §3.4; the reference's bvh_node exists for exactly this) —
    random_scene's ~500 primitives never do.  Same material roulette and
    camera family as random_scene, a denser and wider grid: side x side
    small spheres (side = ceil(sqrt(n))), three feature spheres, ground.
    """
    rng_ = np.random.RandomState(seed)
    b = SceneBuilder()
    b.sphere((0.0, -1000.0, 0.0), 1000.0, b.lambertian((0.5, 0.5, 0.5)))
    side = int(np.ceil(np.sqrt(max(n, 1))))
    pitch = 22.0 / 22.0  # keep random_scene's unit pitch; field just widens
    made = 0
    for a in range(-side // 2, side - side // 2):
        for bb in range(-side // 2, side - side // 2):
            if made >= n:
                break
            choose = rng_.rand()
            center = np.array([pitch * a + 0.9 * rng_.rand(), 0.2,
                               pitch * bb + 0.9 * rng_.rand()])
            if choose < 0.8:
                mat = b.lambertian(rng_.rand(3) * rng_.rand(3))
            elif choose < 0.95:
                mat = b.metal(0.5 * (1.0 + rng_.rand(3)),
                              fuzz=0.5 * rng_.rand())
            else:
                mat = b.dielectric(1.5)
            b.sphere(center, 0.2, mat)
            made += 1
    b.sphere((0.0, 1.0, 0.0), 1.0, b.dielectric(1.5))
    b.sphere((-4.0, 1.0, 0.0), 1.0, b.lambertian((0.4, 0.2, 0.1)))
    b.sphere((4.0, 1.0, 0.0), 1.0, b.metal((0.7, 0.6, 0.5), fuzz=0.0))
    # Pull the camera back/up so the field fills the frame.
    span = pitch * side
    cam = make_camera((1.3 * span / 2, span / 6, span / 3), (0, 0, 0),
                      (0, 1, 0), 20.0, nx / ny, aperture=0.0,
                      focus_dist=10.0)
    return b.build(), cam, RenderConfig(nx=nx, ny=ny, spp=spp)


def triangle_field(n=20000, nx=800, ny=450, spp=4, seed=13):
    """Large-scene TRIANGLE stress workload: a jittered heightfield of
    ~n triangles (grid of quads, two triangles each) under the same
    camera family as sphere_field.

    The regime where the clustered megakernel's triangle clusters earn
    their keep (r5; the dense tri sweep is linear in scene size and its
    packed selection caps at 2^14).  Material roulette matches the
    sphere presets so all three scatter paths appear.
    """
    rng_ = np.random.RandomState(seed)
    b = SceneBuilder()
    side = int(np.ceil(np.sqrt(max(n, 2) / 2.0)))
    pitch = 1.0
    # Jittered heightfield vertices: (side+1)^2 grid points.
    xs = (np.arange(side + 1) - side / 2.0) * pitch
    zs = (np.arange(side + 1) - side / 2.0) * pitch
    hx, hz = np.meshgrid(xs, zs, indexing="ij")
    hy = 0.25 * np.sin(hx * 0.7) * np.cos(hz * 0.6) + 0.1 * rng_.rand(
        side + 1, side + 1)
    mats = []
    for _ in range(64):
        choose = rng_.rand()
        if choose < 0.8:
            mats.append(b.lambertian(rng_.rand(3) * rng_.rand(3)))
        elif choose < 0.95:
            mats.append(b.metal(0.5 * (1.0 + rng_.rand(3)),
                                fuzz=0.5 * rng_.rand()))
        else:
            mats.append(b.dielectric(1.5))
    made = 0
    for i in range(side):
        for j in range(side):
            if made >= n:
                break
            m = mats[rng_.randint(len(mats))]
            p00 = (hx[i, j], hy[i, j], hz[i, j])
            p10 = (hx[i + 1, j], hy[i + 1, j], hz[i + 1, j])
            p01 = (hx[i, j + 1], hy[i, j + 1], hz[i, j + 1])
            p11 = (hx[i + 1, j + 1], hy[i + 1, j + 1], hz[i + 1, j + 1])
            b.triangle(p00, p01, p10, m)
            made += 1
            if made >= n:
                break
            b.triangle(p10, p01, p11, m)
            made += 1
    # Three feature spheres so the mixed-primitive path stays exercised.
    b.sphere((0.0, 1.2, 0.0), 1.0, b.dielectric(1.5))
    b.sphere((-4.0, 1.2, 0.0), 1.0, b.lambertian((0.4, 0.2, 0.1)))
    b.sphere((4.0, 1.2, 0.0), 1.0, b.metal((0.7, 0.6, 0.5), fuzz=0.0))
    span = pitch * side
    cam = make_camera((1.3 * span / 2, span / 6, span / 3), (0, 0, 0),
                      (0, 1, 0), 20.0, nx / ny, aperture=0.0,
                      focus_dist=10.0)
    return b.build(), cam, RenderConfig(nx=nx, ny=ny, spp=spp)


PRESETS = {
    "three-spheres": three_spheres,
    "random-spheres": random_scene,
    "triangle-mesh": triangle_scene,
    "camera-effects": camera_showcase,
    "sphere-field": sphere_field,
    "triangle-field": triangle_field,
}


def build_preset(name: str, **kwargs):
    return PRESETS[name](**kwargs)
