"""Per-particle Metropolis-Hastings accept/reject.

Replaces ``mh_resampling`` / ``assym_mh_resampling``
(parallel_utils.py:208-276).  Each particle runs an independent single-step
MH chain between its previous pose (with weight from the previous posterior)
and its odometry-proposed pose (with weight from the new measurement) — this
is the reference's novel contribution and is embarrassingly parallel, so it
vectorizes to a handful of elementwise ops.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_LOG_EPS = 1e-10  # the reference's log guard (parallel_utils.py:259-262)


def symmetric_mh(
    key: jax.Array,
    prev_particles: jnp.ndarray,
    proposed_particles: jnp.ndarray,
    weights_post: jnp.ndarray,
    weights_pre: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Symmetric MH: alpha_i = min(1, w_post_i / w_pre_i); accept -> proposed
    particle + posterior weight, reject -> previous particle + prior weight.
    Matches mh_resampling (parallel_utils.py:208-236) including the
    w_pre <= 0 -> always-accept guard.

    Returns ``(particles, weights, accept)`` — the boolean accept mask is the
    authoritative acceptance record (pose comparison is ambiguous when the
    proposal equals the previous pose, e.g. a stationary robot).
    """
    alpha = jnp.where(
        weights_pre > 0, jnp.minimum(1.0, weights_post / weights_pre), 1.0
    )
    u = jax.random.uniform(key, alpha.shape)
    accept = u < alpha
    particles = jnp.where(accept[:, None], proposed_particles, prev_particles)
    weights = jnp.where(accept, weights_post, weights_pre)
    return particles, weights, accept


def asymmetric_mh(
    key: jax.Array,
    prev_particles: jnp.ndarray,
    proposed_particles: jnp.ndarray,
    weights_post: jnp.ndarray,
    weights_pre: jnp.ndarray,
    trans_forward: jnp.ndarray,
    trans_backward: jnp.ndarray,
    ref_compat_guard: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Asymmetric MH with full transition ratio:

        log alpha_i = [log w_post_i + log q(x|x')_i] - [log w_pre_i + log q(x'|x)_i]

    Matches assym_mh_resampling (parallel_utils.py:238-276).

    ``ref_compat_guard=True`` reproduces the reference's quirky
    ``alpha = min(1, exp(log_alpha)) if log_den > 0 else 1.0`` (:269): since
    log_den = log(w_pre * q_fwd) <= 0 for normalized inputs, that guard
    degenerates to always-accept.  Default False applies the proper MH ratio.

    Returns ``(particles, weights, accept)`` like :func:`symmetric_mh`.
    """
    log_num = jnp.log(weights_post + _LOG_EPS) + jnp.log(trans_backward + _LOG_EPS)
    log_den = jnp.log(weights_pre + _LOG_EPS) + jnp.log(trans_forward + _LOG_EPS)
    alpha = jnp.minimum(1.0, jnp.exp(log_num - log_den))
    if ref_compat_guard:
        alpha = jnp.where(log_den > 0, alpha, 1.0)
    u = jax.random.uniform(key, alpha.shape)
    accept = u < alpha
    particles = jnp.where(accept[:, None], proposed_particles, prev_particles)
    weights = jnp.where(accept, weights_post, weights_pre)
    return particles, weights, accept
