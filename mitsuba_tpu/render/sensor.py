"""Sensors / cameras (reference: src/sensors/*, sensor.h:143-265).

Parity: perspective.cpp, thinlens.cpp (depth of field), orthographic.cpp,
spherical.cpp, telecentric.cpp (parallel projection + DoF),
perspective_rdist.cpp (polynomial radial lens distortion), plus the
measurement sensors radiancemeter.cpp / irradiancemeter.cpp /
fluencemeter.cpp used by the radiometric test scenes. Measurement sensors
carry a constant estimator weight (``ray_weight``) turning cosine- /
sphere-sampled radiance means into irradiance / fluence.

A sensor is a small pytree of camera constants; ``sample_ray`` maps film
positions in [0,1)^2 (+ aperture/direction samples) to world-space rays.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core import math as m
from ..core import warp
from ..core.transform import Transform

PERSPECTIVE = 0
THINLENS = 1
ORTHOGRAPHIC = 2
SPHERICAL = 3
RADIANCEMETER = 4
IRRADIANCEMETER = 5
TELECENTRIC = 6
PERSPECTIVE_RDIST = 7
FLUENCEMETER = 8


class Sensor(NamedTuple):
    type: jnp.ndarray          # () int32
    to_world: jnp.ndarray      # (4, 4) camera-to-world
    tan_half_fov: jnp.ndarray  # () tan(fov_x / 2)
    aspect: jnp.ndarray        # () width/height
    aperture_radius: jnp.ndarray  # () thinlens/telecentric/irradiancemeter
    focus_distance: jnp.ndarray   # ()
    ortho_scale: jnp.ndarray   # (2,) orthographic half-extents
    near: jnp.ndarray          # ()
    rdist: jnp.ndarray = None  # (2,) radial distortion (kc[0], kc[1])

    @property
    def position(self):
        return self.to_world[:3, 3]


def make_perspective(to_world: Transform, fov_deg: float, width: int, height: int,
                     fov_axis: str = "x", near: float = 1e-2) -> Sensor:
    """fov semantics follow perspective.cpp (fovAxis x default)."""
    aspect = width / height
    t = np.tan(np.deg2rad(fov_deg) / 2.0)
    if fov_axis == "y":
        t = t * aspect
    elif fov_axis == "smaller":
        if aspect < 1.0:
            t = t * aspect
    elif fov_axis == "larger":
        if aspect > 1.0:
            t = t * aspect
    elif fov_axis == "diagonal":
        d = np.hypot(1.0, 1.0 / aspect)
        t = t / d
    return Sensor(
        type=jnp.asarray(PERSPECTIVE, jnp.int32),
        to_world=jnp.asarray(to_world.m, jnp.float32),
        tan_half_fov=jnp.asarray(t, jnp.float32),
        aspect=jnp.asarray(aspect, jnp.float32),
        aperture_radius=jnp.asarray(0.0, jnp.float32),
        focus_distance=jnp.asarray(1.0, jnp.float32),
        ortho_scale=jnp.ones(2, jnp.float32),
        near=jnp.asarray(near, jnp.float32),
        rdist=jnp.zeros(2, jnp.float32),
    )


def pixel_spread(sensor: Sensor, width: int):
    """Angular size of one pixel at the image center (radians) — the
    ray-cone surrogate of sensor.h:143-265 sampleRayDifferential's
    one-pixel-offset differential rays."""
    return 2.0 * sensor.tan_half_fov / jnp.float32(width)


def make_thinlens(to_world: Transform, fov_deg: float, width: int, height: int,
                  aperture_radius: float, focus_distance: float,
                  fov_axis: str = "x") -> Sensor:
    s = make_perspective(to_world, fov_deg, width, height, fov_axis)
    return s._replace(
        type=jnp.asarray(THINLENS, jnp.int32),
        aperture_radius=jnp.asarray(aperture_radius, jnp.float32),
        focus_distance=jnp.asarray(focus_distance, jnp.float32),
    )


def make_orthographic(to_world: Transform, width: int, height: int) -> Sensor:
    """ortho_scale comes from the to_world scaling like orthographic.cpp."""
    aspect = width / height
    return Sensor(
        type=jnp.asarray(ORTHOGRAPHIC, jnp.int32),
        to_world=jnp.asarray(to_world.m, jnp.float32),
        tan_half_fov=jnp.asarray(1.0, jnp.float32),
        aspect=jnp.asarray(aspect, jnp.float32),
        aperture_radius=jnp.asarray(0.0, jnp.float32),
        focus_distance=jnp.asarray(1.0, jnp.float32),
        ortho_scale=jnp.asarray([1.0, 1.0 / aspect], jnp.float32),
        near=jnp.asarray(0.0, jnp.float32),
        rdist=jnp.zeros(2, jnp.float32),
    )


def make_spherical(to_world: Transform) -> Sensor:
    return Sensor(
        type=jnp.asarray(SPHERICAL, jnp.int32),
        to_world=jnp.asarray(to_world.m, jnp.float32),
        tan_half_fov=jnp.asarray(1.0, jnp.float32),
        aspect=jnp.asarray(1.0, jnp.float32),
        aperture_radius=jnp.asarray(0.0, jnp.float32),
        focus_distance=jnp.asarray(1.0, jnp.float32),
        ortho_scale=jnp.ones(2, jnp.float32),
        near=jnp.asarray(0.0, jnp.float32),
        rdist=jnp.zeros(2, jnp.float32),
    )


def make_radiancemeter(origin, direction) -> Sensor:
    d = np.asarray(direction, float)
    d = d / np.linalg.norm(d)
    up = np.array([0.0, 1.0, 0.0]) if abs(d[1]) < 0.99 else np.array([1.0, 0.0, 0.0])
    t = Transform.look_at(origin, np.asarray(origin) + d, up)
    return make_spherical(t)._replace(type=jnp.asarray(RADIANCEMETER, jnp.int32))


def make_telecentric(to_world: Transform, width: int, height: int,
                     aperture_radius: float = 0.0,
                     focus_distance: float = 1.0) -> Sensor:
    """telecentric.cpp: parallel projection with a finite aperture
    (orthographic DoF)."""
    return make_orthographic(to_world, width, height)._replace(
        type=jnp.asarray(TELECENTRIC, jnp.int32),
        aperture_radius=jnp.asarray(aperture_radius, jnp.float32),
        focus_distance=jnp.asarray(focus_distance, jnp.float32),
    )


def make_perspective_rdist(to_world: Transform, fov_deg: float, width: int,
                           height: int, kc=(0.0, 0.0),
                           fov_axis: str = "x") -> Sensor:
    """perspective_rdist.cpp: perspective with polynomial radial lens
    distortion r' = r * (1 + kc0 r^2 + kc1 r^4) on the image plane."""
    return make_perspective(to_world, fov_deg, width, height,
                            fov_axis)._replace(
        type=jnp.asarray(PERSPECTIVE_RDIST, jnp.int32),
        rdist=jnp.asarray(kc, jnp.float32),
    )


def make_irradiancemeter(origin, normal, radius: float = 0.0) -> Sensor:
    """irradiancemeter.cpp: cosine-weighted hemisphere above a disk patch
    (radius 0 = point); develop() of the 1x1 film times ray_weight() = E."""
    n = np.asarray(normal, float)
    n = n / np.linalg.norm(n)
    up = np.array([0.0, 1.0, 0.0]) if abs(n[1]) < 0.99 else np.array([1.0, 0.0, 0.0])
    t = Transform.look_at(origin, np.asarray(origin) + n, up)
    return make_spherical(t)._replace(
        type=jnp.asarray(IRRADIANCEMETER, jnp.int32),
        aperture_radius=jnp.asarray(radius, jnp.float32),
    )


def make_fluencemeter(origin) -> Sensor:
    """fluencemeter.cpp: uniform-sphere directions from a point; develop()
    times ray_weight() = fluence int L dOmega."""
    t = Transform.look_at(origin, np.asarray(origin, float) + [0.0, 0.0, 1.0],
                          [0.0, 1.0, 0.0])
    return make_spherical(t)._replace(
        type=jnp.asarray(FLUENCEMETER, jnp.int32))


def ray_weight(sensor: Sensor):
    """Constant importance weight W such that the developed film equals the
    measurement: pi for the cosine-sampled irradiancemeter, 4*pi for the
    sphere-sampled fluencemeter, 1 for imaging sensors."""
    w = jnp.asarray(1.0, jnp.float32)
    w = jnp.where(sensor.type == IRRADIANCEMETER, jnp.pi, w)
    w = jnp.where(sensor.type == FLUENCEMETER, 4.0 * jnp.pi, w)
    return w


class SensorSample(NamedTuple):
    """Camera connection for particle tracing (PerspectiveCamera::
    sampleDirect, sensor.h:217 / perspective.cpp). ``imp`` is the full
    importance density 1 / (A_plane * cos^3 theta * r^2): a light vertex y
    with power beta splats beta * f_eval(y -> cam) * imp at film position
    ``uv``; the film is then scaled by n_pixels / n_particles."""

    d: jnp.ndarray     # (R, 3) unit direction from the point TO the sensor
    dist: jnp.ndarray  # (R,)
    uv: jnp.ndarray    # (R, 2) film position in [0,1)^2
    imp: jnp.ndarray   # (R,) importance * distance^-2
    valid: jnp.ndarray # (R,) inside the frustum & in front


def image_plane_area(sensor: Sensor):
    """Area of the virtual image plane at z=1 (perspective)."""
    t = sensor.tan_half_fov
    return 4.0 * t * t / sensor.aspect


def sample_direct(sensor: Sensor, p):
    """Connect world points p (R,3) to the sensor.

    Perspective + thinlens-as-pinhole connect to the aperture point
    (perspective.cpp sampleDirect; a zero-radius lens is the dominant
    configuration). Orthographic sensors connect along the fixed view
    direction to the film-plane projection (orthographic.cpp
    sampleDirect:235-264 — EDiscrete direction, importance 1/A_film, no
    distance falloff). Telecentric returns valid=False, matching the
    reference's explicit bidirectional incompatibility
    (telecentric.cpp sampleDirect EError). Others return valid=False.
    """
    A = sensor.to_world
    cam_pos = A[:3, 3]
    to_cam = cam_pos - p
    dist = m.length(to_cam)
    d = to_cam / jnp.maximum(dist, 1e-12)[..., None]

    # world -> camera rotation (rigid to_world assumed, like the reference)
    Rw = A[:3, :3]
    d_cam = (-d) @ Rw  # direction from camera toward p, camera space
    z = d_cam[..., 2]
    in_front = z > 1e-6
    zs = jnp.maximum(z, 1e-6)
    x_pl = d_cam[..., 0] / zs
    y_pl = d_cam[..., 1] / zs
    u = (x_pl / sensor.tan_half_fov + 1.0) * 0.5
    v = (1.0 - y_pl * sensor.aspect / sensor.tan_half_fov) * 0.5
    uv = jnp.stack([u, v], axis=-1)
    inside = (u >= 0.0) & (u < 1.0) & (v >= 0.0) & (v < 1.0)

    cos3 = zs * zs * zs  # z == cos(theta) for unit d_cam
    imp = m.safe_div(
        1.0, image_plane_area(sensor) * cos3 * jnp.maximum(dist * dist, 1e-12)
    )
    supported = (sensor.type == PERSPECTIVE) | (sensor.type == THINLENS)
    valid = in_front & inside & supported

    # --- orthographic: project p onto the film plane along the fixed view
    # direction; uv from the parallel projection; importance = 1/A_world
    # (the D->inf limit of the perspective 1/(A cos^3 d^2)). The ortho
    # extent lives in to_world's scale (orthographic.cpp convention), so
    # the projection uses the true inverse, and the film area carries the
    # world-space Jacobian ||a1 x a2|| of the linear part.
    local, view, a_world = _ortho_local(sensor, p)
    xo = local[..., 0] / sensor.ortho_scale[0]
    yo = local[..., 1] / sensor.ortho_scale[1]
    uo = (xo + 1.0) * 0.5
    vo = (1.0 - yo) * 0.5
    uv_o = jnp.stack([uo, vo], axis=-1)
    zo = local[..., 2]
    inside_o = ((uo >= 0.0) & (uo < 1.0) & (vo >= 0.0) & (vo < 1.0)
                & (zo > jnp.maximum(sensor.near, 1e-6)))
    imp_o = m.safe_div(1.0, a_world)
    is_ortho = sensor.type == ORTHOGRAPHIC
    valid = jnp.where(is_ortho, inside_o, valid)
    d = jnp.where(is_ortho, -view, d)
    # world-space distance from p to its film projection along the view
    dist_o = zo * m.length(A[:3, 2])
    dist = jnp.where(is_ortho, dist_o, dist)
    uv = jnp.where(is_ortho, uv_o, uv)
    imp = jnp.where(is_ortho, imp_o, imp)
    return SensorSample(d=d, dist=dist, uv=uv,
                        imp=jnp.where(valid, imp, 0.0), valid=valid)


def _ortho_local(sensor: Sensor, p):
    """(camera-space point, world view dir, world-space film area) for the
    orthographic projection; to_world may carry the extent as scale."""
    A = sensor.to_world
    A_inv = jnp.linalg.inv(A)
    local = p @ A_inv[:3, :3].T + A_inv[:3, 3]
    view = m.normalize(A[:3, 2])
    a1 = A[:3, 0] * sensor.ortho_scale[0]
    a2 = A[:3, 1] * sensor.ortho_scale[1]
    a_world = 4.0 * m.length(m.cross(a1, a2))
    return local, view, a_world


def pdf_ray_direction(sensor: Sensor, d_world):
    """Solid-angle pdf of a camera ray leaving in direction ``d_world``
    under uniform film-position sampling: 1 / (A_plane * cos^3 theta)
    (perspective importance, perspective.cpp pdfDirection). Zero outside
    the frustum."""
    A = sensor.to_world
    Rw = A[:3, :3]
    d_cam = d_world @ Rw
    z = d_cam[..., 2]
    in_front = z > 1e-6
    zs = jnp.maximum(z, 1e-6)
    x_pl = d_cam[..., 0] / zs
    y_pl = d_cam[..., 1] / zs
    u = (x_pl / sensor.tan_half_fov + 1.0) * 0.5
    v = (1.0 - y_pl * sensor.aspect / sensor.tan_half_fov) * 0.5
    inside = (u >= 0.0) & (u < 1.0) & (v >= 0.0) & (v < 1.0)
    pdf = m.safe_div(1.0, image_plane_area(sensor) * zs * zs * zs)
    return jnp.where(in_front & inside, pdf, 0.0)


def camera_pdf_area(sensor: Sensor, p, n_target):
    """Area-measure density of the camera generating a first vertex at
    ``p`` (normal ``n_target``; zero normal = volume vertex, cos := 1) —
    the pdf the BDPT MIS walk compares the t=0/t=1 alternatives with.
    Perspective/thinlens: directional pdf x cos/d^2; orthographic: the
    parallel projection's film-area density |cos| / A_world
    (orthographic.cpp samplePosition invSurfaceArea x the area-measure
    Jacobian of the fixed-direction transport)."""
    A = sensor.to_world
    cam_pos = A[:3, 3]
    to_p = p - cam_pos
    dist2 = jnp.maximum(m.squared_length(to_p), 1e-12)
    d = to_p / jnp.sqrt(dist2)[..., None]
    is_vol = m.squared_length(n_target) < 0.5
    pdf_sa = pdf_ray_direction(sensor, d)
    cos_t = jnp.where(is_vol, 1.0, jnp.abs(m.dot(n_target, d)))
    persp = pdf_sa * m.safe_div(cos_t, dist2)

    local, view, a_world = _ortho_local(sensor, p)
    xo = local[..., 0] / sensor.ortho_scale[0]
    yo = local[..., 1] / sensor.ortho_scale[1]
    inside_o = ((jnp.abs(xo) < 1.0) & (jnp.abs(yo) < 1.0)
                & (local[..., 2] > jnp.maximum(sensor.near, 1e-6)))
    cos_o = jnp.where(is_vol, 1.0, jnp.abs(m.dot(n_target, view)))
    ortho = jnp.where(inside_o, m.safe_div(cos_o, a_world), 0.0)
    return jnp.where(sensor.type == ORTHOGRAPHIC, ortho, persp)


def sample_ray(sensor: Sensor, uv, u_aperture):
    """uv in [0,1)^2 (R, 2) film position; u_aperture (R, 2).

    Returns (o, d) world rays. The importance weight is 1 for all supported
    sensors (perspective.cpp importance handling folds into pixel estimates).
    """
    R = uv.shape[0]
    stype = sensor.type
    # camera-space target on the virtual image plane at z=1
    x = (2.0 * uv[..., 0] - 1.0) * sensor.tan_half_fov
    y = (1.0 - 2.0 * uv[..., 1]) * sensor.tan_half_fov / sensor.aspect

    # perspective_rdist.cpp: polynomial radial distortion of the plane point
    if sensor.rdist is not None:
        r2 = x * x + y * y
        f = 1.0 + sensor.rdist[0] * r2 + sensor.rdist[1] * r2 * r2
        is_rdist = stype == PERSPECTIVE_RDIST
        x = jnp.where(is_rdist, x * f, x)
        y = jnp.where(is_rdist, y * f, y)

    d_cam = m.normalize(jnp.stack([x, y, jnp.ones_like(x)], axis=-1))
    o_cam = jnp.zeros((R, 3))

    # thinlens.cpp: offset origin on the aperture disk, refocus
    lens = warp.square_to_uniform_disk_concentric(u_aperture) * sensor.aperture_radius
    focus_t = sensor.focus_distance / jnp.maximum(d_cam[..., 2], 1e-6)
    p_focus = d_cam * focus_t[..., None]
    o_lens = jnp.stack([lens[..., 0], lens[..., 1], jnp.zeros_like(x)], axis=-1)
    d_lens = m.normalize(p_focus - o_lens)
    use_lens = stype == THINLENS
    o_cam = jnp.where(use_lens, o_lens, o_cam)
    d_cam = jnp.where(use_lens, d_lens, d_cam)

    # orthographic.cpp: parallel rays
    o_ortho = jnp.stack(
        [
            (2.0 * uv[..., 0] - 1.0) * sensor.ortho_scale[0],
            (1.0 - 2.0 * uv[..., 1]) * sensor.ortho_scale[1],
            jnp.zeros_like(x),
        ],
        axis=-1,
    )
    d_ortho = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), d_cam.shape)
    is_ortho = stype == ORTHOGRAPHIC
    o_cam = jnp.where(is_ortho, o_ortho, o_cam)
    d_cam = jnp.where(is_ortho, d_ortho, d_cam)

    # telecentric.cpp: parallel projection + aperture disk, refocused at
    # the focus plane z = focus_distance
    is_tele = stype == TELECENTRIC
    lens_t = warp.square_to_uniform_disk_concentric(u_aperture) \
        * sensor.aperture_radius
    o_tele = o_ortho + jnp.stack(
        [lens_t[..., 0], lens_t[..., 1], jnp.zeros_like(x)], axis=-1)
    p_focus_t = o_ortho + jnp.stack(
        [jnp.zeros_like(x), jnp.zeros_like(x),
         jnp.broadcast_to(sensor.focus_distance, x.shape)], axis=-1)
    d_tele = m.normalize(p_focus_t - o_tele)
    o_cam = jnp.where(is_tele, o_tele, o_cam)
    d_cam = jnp.where(is_tele, d_tele, d_cam)

    # irradiancemeter.cpp: disk patch origin + cosine hemisphere (uv is the
    # uniform pair; develop * ray_weight -> E)
    is_irr = stype == IRRADIANCEMETER
    disk = warp.square_to_uniform_disk_concentric(u_aperture) \
        * sensor.aperture_radius
    o_irr = jnp.stack([disk[..., 0], disk[..., 1], jnp.zeros_like(x)], axis=-1)
    d_irr = warp.square_to_cosine_hemisphere(uv)
    o_cam = jnp.where(is_irr, o_irr, o_cam)
    d_cam = jnp.where(is_irr, d_irr, d_cam)

    # fluencemeter.cpp: uniform sphere from a point
    is_flu = stype == FLUENCEMETER
    d_flu = warp.square_to_uniform_sphere(uv)
    d_cam = jnp.where(is_flu, d_flu, d_cam)

    # spherical.cpp: lat-long over the full sphere
    theta = uv[..., 1] * jnp.pi
    phi = uv[..., 0] * 2.0 * jnp.pi - jnp.pi
    d_sph = jnp.stack(
        [jnp.sin(theta) * jnp.sin(phi), jnp.cos(theta), -jnp.sin(theta) * jnp.cos(phi)],
        axis=-1,
    )
    is_sph = (stype == SPHERICAL) | (stype == RADIANCEMETER)
    d_cam = jnp.where(is_sph, d_sph, d_cam)
    # radiancemeter: single fixed direction +z
    d_cam = jnp.where(
        stype == RADIANCEMETER,
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), d_cam.shape),
        d_cam,
    )

    A = sensor.to_world
    o_w = o_cam @ A[:3, :3].T + A[:3, 3]
    d_w = m.normalize(d_cam @ A[:3, :3].T)
    return o_w, d_w
