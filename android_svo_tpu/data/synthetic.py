"""Synthetic textured-plane scene with exact ground truth.

The reference repo has no tests (SURVEY.md §4); our integration strategy is
the one its dormant `setFirstFrame` hook was built for
(`frame_handler_mono.h:42-43` — "used for synthetic datasets in benchmark
node"): render frames of known geometry along a known trajectory and check
pose recovery.

World: an infinite textured plane at z = 0, camera flying above it at
negative z looking along +z.  Rendering intersects each pixel ray with the
plane and bilinearly samples a multi-octave noise texture — fully
differentiable, jit-compatible, and with photometric structure at every
scale (so FAST/Shi-Tomasi find corners everywhere, like the reference's
phone-camera scenes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from android_svo_tpu.geometry.se3 import SE3, SO3
from android_svo_tpu.geometry.camera import PinholeCamera
from android_svo_tpu.ops.interp import bilinear_sample


def make_texture(key, size: int = 1024, octaves: int | None = None) -> jnp.ndarray:
    """Multi-octave value-noise texture in [0, 255], (size, size) f32.

    Slow amplitude decay + linear upsampling keep strong local contrast at
    the finest scales so FAST/Shi-Tomasi fire densely (like real scenes).
    """
    if octaves is None:
        # reach pixel-scale noise regardless of texture size: 4*2^(o-1) == size
        octaves = max(int(jnp.log2(size // 4)) + 1, 5)
    img = jnp.zeros((size, size), jnp.float32)
    amp = 1.0
    for o in range(octaves):
        key, sub = jax.random.split(key)
        res = min(4 * (2 ** o), size)
        noise = jax.random.uniform(sub, (res, res), jnp.float32)
        img = img + amp * jax.image.resize(noise, (size, size), "linear")
        amp *= 0.75
    img = img - img.min()
    img = img / img.max()
    # quantize a copy into piecewise-constant cells: sharp edges and corners
    # (value-noise alone is too locally smooth for FAST's radius-3 ring test)
    bands = jnp.floor(img * 8.0) / 7.0
    mixed = 0.65 * bands + 0.35 * img
    mixed = mixed - mixed.min()
    mixed = mixed / mixed.max()
    return (mixed * 255.0).astype(jnp.float32)


def make_edge_texture(key, size: int = 1024,
                      noise_band: float = 0.18) -> jnp.ndarray:
    """Low-corner, edge-rich texture for edgelet-path testing.

    Concentric intensity rings give strong step edges in every orientation
    but almost no corners (FAST's ring test and Shi-Tomasi both need two
    gradient directions), so grid cells fall back to EDGELET features
    (ref feature.h:31).  A thin noise band keeps enough corners for the
    two-frame bootstrap, which needs point features.
    """
    idx = jnp.arange(size, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(idx, idx, indexing="ij")
    c = size / 2.0
    r = jnp.sqrt((xx - c) ** 2 + (yy - c) ** 2)
    rings = (jnp.floor(r / 28.0) % 2) * 200.0 + 25.0
    # gentle radial ramp so "flat" regions are not exactly constant
    rings = rings + 0.01 * r
    noise = make_texture(key, size)
    band = (jnp.abs((yy / size) - 0.5) < noise_band / 2).astype(jnp.float32)
    img = rings * (1 - band) + noise * band
    return jnp.clip(img, 0.0, 255.0)


def default_camera(width: int = 640, height: int = 480) -> PinholeCamera:
    return PinholeCamera.create(width, height, 420.0, 420.0,
                                width / 2.0 - 0.5, height / 2.0 - 0.5)


def render(texture: jnp.ndarray, cam: PinholeCamera, T_w_c: SE3,
           tex_scale: float = 100.0) -> jnp.ndarray:
    """Render the plane z=0 seen from camera pose T_w_c (camera-to-world).

    tex_scale: texture pixels per world unit.  The texture is centered on the
    world origin.
    """
    h, w = cam.height, cam.width
    xx, yy = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32), indexing="xy")
    px = jnp.stack([xx, yy], axis=-1).reshape(-1, 2)
    f_cam = cam.cam2world(px)                               # (N, 3)
    d_w = T_w_c.rotate(f_cam)
    o_w = T_w_c.t
    tz = -o_w[2] / d_w[..., 2]
    p_w = o_w + tz[..., None] * d_w
    ts = texture.shape[0]
    uv = p_w[..., :2] * tex_scale + ts / 2.0
    vals = bilinear_sample(texture, uv)
    return vals.reshape(h, w)


def lookdown_pose(x: float, y: float, z: float = -3.0,
                  rot_xyz=(0.0, 0.0, 0.0)) -> SE3:
    """Camera at (x, y, z<0) looking along +z (at the plane), with a small
    extra rotation (axis-angle) applied."""
    base = SE3(q=jnp.array([1.0, 0, 0, 0], jnp.float32),
               t=jnp.array([x, y, z], jnp.float32))
    dq = SO3.exp(jnp.asarray(rot_xyz, jnp.float32))
    return SE3(q=base.q, t=base.t).compose(
        SE3(q=dq, t=jnp.zeros(3, jnp.float32)))


def make_trajectory(n_frames: int, radius: float = 0.4, height: float = -3.0,
                    forward: float = 0.02, rot_amp: float = 0.02):
    """Smooth sideways+forward sweep with small rotations; returns list of
    SE3 camera-to-world poses (T_w_c)."""
    poses = []
    for i in range(n_frames):
        s = i / max(n_frames - 1, 1)
        x = radius * jnp.sin(2 * jnp.pi * s * 0.75)
        y = forward * i
        rot = (rot_amp * jnp.sin(2 * jnp.pi * s),
               rot_amp * jnp.cos(2 * jnp.pi * s), 0.15 * rot_amp * i)
        poses.append(lookdown_pose(float(x), float(y), height, rot))
    return poses


def true_depth(cam: PinholeCamera, T_w_c: SE3, px: jnp.ndarray) -> jnp.ndarray:
    """Ground-truth depth along the bearing for pixels px (N,2)."""
    f_cam = cam.cam2world(px)
    d_w = T_w_c.rotate(f_cam)
    return -T_w_c.t[2] / d_w[..., 2]
