"""Quaternion utilities matching glm conventions.

The reference's instancing layer rotates rays/hits with glm::quat
(reference: rotateQuat.cpp:44-71, scene.cpp:336-341). We replicate the
glm Euler->quat construction exactly so `transform: rotate: [x,y,z]`
(degrees) produces the same rotation.
"""
from __future__ import annotations

import jax.numpy as jnp


def from_euler(euler_rad: jnp.ndarray) -> jnp.ndarray:
    """glm::quat(vec3 eulerAngle): component-wise half-angle products.

    Returns quaternion as [w, x, y, z]. Matches glm's
    qua(vec<3>) constructor (R = Rx * Ry * Rz composition).
    """
    half = jnp.asarray(euler_rad, jnp.float32) * 0.5
    c = jnp.cos(half)
    s = jnp.sin(half)
    cx, cy, cz = c[..., 0], c[..., 1], c[..., 2]
    sx, sy, sz = s[..., 0], s[..., 1], s[..., 2]
    w = cx * cy * cz + sx * sy * sz
    x = sx * cy * cz - cx * sy * sz
    y = cx * sy * cz + sx * cy * sz
    z = cx * cy * sz - sx * sy * cz
    return jnp.stack([w, x, y, z], axis=-1)


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by unit quaternion(s) q ([w,x,y,z]).

    v' = v + 2*cross(q.xyz, cross(q.xyz, v) + q.w*v)  (glm operator*)
    Broadcasts over leading axes.
    """
    qv = q[..., 1:4]
    w = q[..., 0:1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def inverse_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return rotate(conjugate(q), v)
