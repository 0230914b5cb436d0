"""Angle utilities (replaces parallel_utils.py:62-83 and quaternion helpers).

Everything is elementwise jnp so it vectorizes over any leading shape —
the reference needed a separate ``@njit(parallel=True)`` array variant
(``normalize_angle_array``, parallel_utils.py:69-83); here broadcasting
covers both.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_angle(theta):
    """Wrap angle(s) to [-pi, pi).  Reference: parallel_utils.py:62-67."""
    return (theta + jnp.pi) % (2.0 * jnp.pi) - jnp.pi


def normalize_angle_about(angles, mean_angle):
    """Wrap ``angles - mean_angle`` to [-pi, pi).

    Reference: parallel_utils.py:69-83 (normalize_angle_array), used for the
    circular-covariance residuals at amcmh_localizer.py:593.
    """
    return normalize_angle(angles - mean_angle)


def yaw_from_quaternion(x, y, z, w):
    """Yaw (Z euler) from quaternion.  Reference: amcmh_localizer.py:229-233."""
    return jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


def quaternion_from_yaw(yaw):
    """(x, y, z, w) planar quaternion.  Reference: amcmh_localizer.py:603-604."""
    half = 0.5 * yaw
    zero = jnp.zeros_like(half)
    return zero, zero, jnp.sin(half), jnp.cos(half)
