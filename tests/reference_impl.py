"""Plain-numpy golden implementations mirroring the reference semantics
(re-derived from the documented behavior in SURVEY.md §2.1; used only to
validate the vectorized JAX kernels against a straightforward loop form)."""

import numpy as np


def ref_likelihood_field_scores(
    particles, ranges, angles, distance_map, resolution, origin,
    width, height, sigma_hit, z_hit, z_rand, max_range, step,
):
    """Loop mirror of the likelihood-field scorer (parallel_utils.py:85-149)."""
    n = particles.shape[0]
    out = np.zeros(n, dtype=np.float64)
    for i in range(n):
        x, y, th = particles[i]
        acc = 0.0
        nvalid = 0
        for j in range(0, len(ranges), step):
            r = ranges[j]
            if not (np.isfinite(r) and r < max_range):
                continue
            nvalid += 1
            ex = x + r * np.cos(th + angles[j])
            ey = y + r * np.sin(th + angles[j])
            cx = int((ex - origin[0]) / resolution)
            cy = int((ey - origin[1]) / resolution)
            if cx < 0 or cx >= width or cy < 0 or cy >= height:
                continue
            d = distance_map[cy, cx]
            if d <= max_range:
                ph = np.exp(-0.5 * d * d / sigma_hit**2) / np.sqrt(
                    2 * np.pi * sigma_hit**2
                )
            else:
                ph = 0.0
            pr = 1.0 / max_range if 0 <= r <= max_range else 0.0
            acc += np.log(max(z_hit * ph + z_rand * pr, 1e-6))
        out[i] = acc / nvalid if nvalid > 0 else -50.0
    return out


def ref_motion_density(prev, curr, delta, alpha):
    """Loop mirror of the odometry motion density (parallel_utils.py:282-330)."""
    def wrap(a):
        return (a + np.pi) % (2 * np.pi) - np.pi

    def gauss(d, s):
        s = max(s, 1e-9)
        return np.exp(-0.5 * (d / s) ** 2) / np.sqrt(2 * np.pi * s * s)

    r1, t, r2 = delta
    a1, a2, a3, a4 = alpha
    n = prev.shape[0]
    p = np.zeros(n)
    for i in range(n):
        dx = curr[i, 0] - prev[i, 0]
        dy = curr[i, 1] - prev[i, 1]
        th = np.hypot(dx, dy)
        r1h = wrap(np.arctan2(dy, dx) - prev[i, 2])
        r2h = wrap(curr[i, 2] - prev[i, 2] - r1h)
        s1 = a1 * abs(r1) + a2 * abs(t)
        st = a3 * abs(t) + a4 * (abs(r1) + abs(r2))
        s2 = a1 * abs(r2) + a2 * abs(t)
        p[i] = gauss(wrap(r1 - r1h), s1) * gauss(t - th, st) * gauss(wrap(r2 - r2h), s2)
    s = p.sum()
    return p / s if s > 0 else p


def ref_raycast(pose_xy, angle, occupancy, resolution, origin, max_range, step=0.1):
    """Loop mirror of the fixed-step raycaster (parallel_utils.py:4-29)."""
    h, w = occupancy.shape
    cx, cy = np.cos(angle), np.sin(angle)
    n_steps = int(max_range / step)
    for i in range(1, n_steps + 1):
        px = pose_xy[0] + i * step * cx
        py = pose_xy[1] + i * step * cy
        gx = int((px - origin[0]) / resolution)
        gy = int((py - origin[1]) / resolution)
        if not (0 <= gx < w and 0 <= gy < h):
            return max_range
        if occupancy[gy, gx] > 0.5:
            return i * step
    return max_range


def ref_mcl_run(seed, bag, grid_map, n_particles, alpha, sigma_hit, z_hit,
                z_rand, max_range, beam_step=1, initial_pose=None,
                initial_cov=(0.05, 0.05, 0.1)):
    """Sequential full-filter MCL oracle: an INDEPENDENT plain-numpy
    implementation of the reference's plain-MCL pipeline (predict via the
    sampling odometry model, likelihood-field correct, low-variance
    resample every step; amcmh_localizer.py:404-533 control flow with the
    parallel_utils.py kernels), built only from this file's loop mirrors.

    The reference repo could launch stock ROS `amcl` as an external control
    (app/launch/amcl.launch:15-19); this is the equivalent here — a
    framework-independent baseline that a whole-framework systematic bias
    cannot hide from.  Returns (T, 3) pose estimates (weighted mean,
    circular in theta).
    """
    rng = np.random.default_rng(seed)
    dm = np.asarray(grid_map.distance)
    res = float(grid_map.resolution)
    origin = (float(grid_map.origin[0]), float(grid_map.origin[1]))
    h, w = dm.shape

    p0 = np.asarray(initial_pose if initial_pose is not None else bag.gt[0])
    particles = p0[None, :] + rng.normal(size=(n_particles, 3)) * np.asarray(
        initial_cov
    )
    odom = np.asarray(bag.odom, dtype=np.float64)
    ranges = np.asarray(bag.ranges, dtype=np.float64)
    angles = np.asarray(bag.angles, dtype=np.float64)

    def wrap(a):
        return (a + np.pi) % (2 * np.pi) - np.pi

    ests = np.zeros((len(odom), 3))
    for t in range(len(odom)):
        if t > 0:
            dx, dy = odom[t, 0] - odom[t - 1, 0], odom[t, 1] - odom[t - 1, 1]
            trans = np.hypot(dx, dy)
            rot1 = np.arctan2(dy, dx) - odom[t - 1, 2]
            rot2 = wrap(odom[t, 2] - odom[t - 1, 2]) - rot1
            a1, a2, a3, a4 = alpha
            s1 = a1 * abs(rot1) + a2 * abs(trans)
            st = a3 * abs(trans) + a4 * (abs(rot1) + abs(rot2))
            s2 = a1 * abs(rot2) + a2 * abs(trans)
            for i in range(n_particles):
                r1h = rot1 + rng.normal() * s1
                th_ = trans + rng.normal() * st
                r2h = rot2 + rng.normal() * s2
                particles[i, 0] += th_ * np.cos(particles[i, 2] + r1h)
                particles[i, 1] += th_ * np.sin(particles[i, 2] + r1h)
                particles[i, 2] = wrap(particles[i, 2] + r1h + r2h)
        scores = ref_likelihood_field_scores(
            particles, ranges[t], angles, dm, res, origin, w, h,
            sigma_hit, z_hit, z_rand, max_range, beam_step,
        )
        weights = np.exp(scores - scores.max())
        weights /= weights.sum()
        ests[t, 0] = weights @ particles[:, 0]
        ests[t, 1] = weights @ particles[:, 1]
        ests[t, 2] = np.arctan2(
            weights @ np.sin(particles[:, 2]), weights @ np.cos(particles[:, 2])
        )
        # low-variance (systematic) resample, numba kernel semantics
        # (parallel_utils.py:416-446)
        start = rng.random() / n_particles
        cum = np.cumsum(weights)
        out = np.empty_like(particles)
        j = 0
        for i in range(n_particles):
            u = start + i / n_particles
            while cum[j] < u and j < n_particles - 1:
                j += 1
            out[i] = particles[j]
        particles = out
    return ests
