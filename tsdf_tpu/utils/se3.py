"""SE(3) Lie-group helpers in pure JAX.

The reference delegates all of this to Sophus (`Sophus::SE3d::exp`, used by
the ICP update, ref: third_party/ICP_CUDA/ICPOdometry.cpp:131-133) and to
Eigen for the 6x6 solves. Here the exponential map is written by hand with
Taylor fallbacks so it is jit/grad-safe at theta -> 0.

Twist convention: xi = (omega, v) with omega the rotation part (rad) and
v the translation part (mm) — matching Sophus' (so3, translation) tangent
ordering used by the reference ICP.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(omega: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    o = jnp.asarray(omega, jnp.float32)
    zeros = jnp.zeros_like(o[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -o[..., 2], o[..., 1]], axis=-1),
            jnp.stack([o[..., 2], zeros, -o[..., 0]], axis=-1),
            jnp.stack([-o[..., 1], o[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def _abc(theta2):
    """Rodrigues coefficients a=sin(t)/t, b=(1-cos t)/t^2, c=(1-a)/t^2 with
    Taylor fallbacks near 0. Uses the double-where trick so reverse-mode
    gradients stay finite at theta == 0 (a bare where still differentiates
    the 0/0 branch into NaN)."""
    small = theta2 < 1e-8
    safe_t2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe_t2)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(
        small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe_t2
    )
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - a) / safe_t2)
    return a, b, c


def so3_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula with small-angle Taylor fallback. (3,) -> (3, 3)."""
    omega = jnp.asarray(omega, jnp.float32)
    theta2 = jnp.sum(omega * omega)
    k = hat(omega)
    a, b, _ = _abc(theta2)
    return jnp.eye(3, dtype=jnp.float32) + a * k + b * (k @ k)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """(6,) twist (omega, v) -> (4, 4) homogeneous transform.

    T = [exp(omega^), V v; 0 1] with V the left Jacobian of SO(3).
    """
    xi = jnp.asarray(xi, jnp.float32)
    omega, v = xi[0:3], xi[3:6]
    theta2 = jnp.sum(omega * omega)
    k = hat(omega)
    a, b, c = _abc(theta2)
    r = jnp.eye(3, dtype=jnp.float32) + a * k + b * (k @ k)
    vmat = jnp.eye(3, dtype=jnp.float32) + b * k + c * (k @ k)
    t = jnp.eye(4, dtype=jnp.float32)
    t = t.at[0:3, 0:3].set(r)
    t = t.at[0:3, 3].set(vmat @ v)
    return t


def euler_to_matrix(rotation: jnp.ndarray) -> jnp.ndarray:
    """(3,) Euler angles (rad) -> (3, 3) rotation matrix.

    Bit-for-bit the matrix the reference's ``rotate`` device function
    applies to deformed points (ref: src/TSDF/TSDFVolume.cu:189-203), with
    angle 1 about x, 2 about y, 3 about z:

        [ c2*c3           -c2*s3            s2    ]
        [ c1*s3+s1*s2*c3   c1*c3-s1*s2*s3  -s1*c2 ]
        [ s1*s3-c1*s2*c3   s1*c3+c1*s2*s3   c1*c2 ]
    """
    rotation = jnp.asarray(rotation, jnp.float32)
    c1, c2, c3 = jnp.cos(rotation[0]), jnp.cos(rotation[1]), jnp.cos(
        rotation[2]
    )
    s1, s2, s3 = jnp.sin(rotation[0]), jnp.sin(rotation[1]), jnp.sin(
        rotation[2]
    )
    return jnp.array(
        [
            [c2 * c3, -c2 * s3, s2],
            [c1 * s3 + s1 * s2 * c3, c1 * c3 - s1 * s2 * s3, -s1 * c2],
            [s1 * s3 - c1 * s2 * c3, s1 * c3 + c1 * s2 * s3, c1 * c2],
        ],
        dtype=jnp.float32,
    )
