"""Staged two-program execution: 1M-capacity global phases, small-capacity
steady-state tracking (round-4; VERDICT r3 item 2).

KLD-adaptive runs collapse the ACTIVE count to ``min_particles`` once the
cloud converges (resample_amcl_kld semantics, amcmh_localizer.py:496-527),
but a single compiled program still pays (max_particles, .)-shaped arrays
every phase — 7.0 ms/scan at 1M capacity vs 1.5 ms for a native 100k
config (BENCH_r03).  The reference literally reallocates arrays each scan
(:520-522), shrinking its cost with the count; under XLA's static shapes
the equivalent is TWO compiled programs over the same config:

  * BIG:   n_max = max_particles          (global localization, recovery)
  * SMALL: n_max = tracking_capacity      (converged tracking)

with host-side staging: run in chunks of ``chunk`` scans (one dispatch
each, amortizing the ~3.6 ms tunnel enqueue like bench.py), inspect the
chunk's StepInfo, and

  * switch DOWN when every count in the chunk fits the small capacity
    with margin (the state is prefix-packed after the KLD resample, so
    the hand-off is an exact array slice — no resampling, no bias);
  * switch UP (escalate) when injection fires (p_random > 0: the
    augmented-MCL kidnap signal needs room for injected diversity) or
    the count pegs at the small capacity (the KLD bound wants more
    particles than the small program can hold).

SCORING is staged alongside capacity (``global_scoring="full"``): the
BIG program drops the window (full-map field, the reference's scoring
model, parallel_utils.py:85-149) while the SMALL program keeps the
windowed flagship scorer.  Measured rationale (round-4, map_house, chip):
the coarse out-of-window fallback is max-pooled = OPTIMISTIC by design
(kidnap recovery needs injected particles to survive), so competition
between the fine-scored window mode and coarse-scored outside modes is
never fair — a symmetric decoy mode can neither die (its optimistic
coarse scores track the truth's honest fine scores) nor be confirmed.
Full-field scoring during multimodal phases gives every mode fine scores
(the decoy dies on distinguishing geometry: 200k uniform-init on
map_house localizes at scan ~258 full-field, never windowed —
scripts/diag_window_global.py).  Mode dominance (StepInfo.anchor_mass,
the window anchor's cluster weight) gates the hand-off: shrink only when
a single mode holds >= shrink_mass of the weight; escalate when it decays
below escalate_mass.

Deviation (documented): trajectories are NOT bitwise-identical to the
single-program run — kld_resample's draw layout depends on n_max, so the
PRNG consumption differs between programs.  Statistical behavior is the
same (tests/test_staged.py: tracking parity + kidnap escalation).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mcmh_localization_tpu.config import FilterConfig
from mcmh_localization_tpu.filter.state import FilterState
from mcmh_localization_tpu.filter.step import make_model, state_size


class StagedModel(NamedTuple):
    config: FilterConfig          # the BIG config (as given)
    small_config: FilterConfig    # capacity-reduced twin
    grid_map: object
    big: object                   # FilterModel
    small: object                 # FilterModel
    init: object


def default_tracking_capacity(config: FilterConfig) -> int:
    """Small-program capacity: 1.3x min_particles (rounded up to 1024) —
    headroom above the KLD steady-state count so a growing bound is
    VISIBLE (count pegging at capacity triggers escalation) without
    paying for slots tracking never uses."""
    cap = int(1.3 * config.min_particles)
    cap = -(-cap // 1024) * 1024
    return min(max(cap, 1024), state_size(config))


def make_staged_model(
    config: FilterConfig,
    grid_map,
    tracking_capacity: int | None = None,
    voxel_map=None,
    global_scoring: str = "full",
    tracking_ess_threshold: float | None = None,
    tracking_theta_bins: int | None = None,
    tracking_window_cells: int | None = None,
) -> StagedModel:
    """Build the two compiled programs.  ``config`` must be adaptive
    (use_adaptive) — staging is the static-shape answer to the
    reference's dynamic particle counts.

    ``global_scoring``: "full" (default) drops the corr/beam window in
    the BIG program so multimodal phases score every mode fairly (see
    module doc); "windowed" keeps the given window in both programs.

    ``tracking_ess_threshold``: ESS-gated resampling for the SMALL
    (tracking) program only (config.resample_ess_threshold semantics).
    Staging is the right scope for the gate: measured single-program
    kidnap runs with a gate let the losing mode linger (fewer resample
    events to drain it — estimate flips between modes), while here any
    recovery escalates to the BIG program, which always keeps per-scan
    parity resampling.

    ``tracking_theta_bins``: narrower corr/beam theta window for the
    SMALL (tracking) program only.  A converged heading posterior spans
    a few degrees, so the tracking program does not need the global
    config's MH-proposal-headroom width; the fused gather kernel's fine
    row span — its chunk-loop cost — scales linearly with the bin count
    (ops/fused_score_pallas.py).  Accuracy measured FLAT from 32 down to
    8 bins on the square/straight_line_spin scenarios
    (scripts/theta_sweep.py); out-of-window headings still fall to the
    coarse fallback, and any recovery escalates to the full-field BIG
    program anyway.

    ``tracking_window_cells``: narrower SPATIAL corr/beam window for the
    SMALL program only — the theta knob's spatial twin.  A converged
    cloud spans centimeters while the global config sizes its window for
    recovery headroom; the field-build region area and the fused
    kernel's fine-table volume both scale with the window, and escapees
    still fall to the coarse fallback (which triggers anchor-mass
    escalation if the cloud actually outgrows the window).  RMSE
    measured flat 128 -> 48 cells on square/straight_line_spin
    (scripts/window_sweep.py)."""
    if not config.use_adaptive:
        raise ValueError(
            "make_staged_model needs an adaptive mode (AMCL/*AMCL): "
            "non-adaptive counts never change, one program suffices"
        )
    if global_scoring not in ("full", "windowed"):
        raise ValueError(f"unknown global_scoring {global_scoring!r}")
    cap = tracking_capacity or default_tracking_capacity(config)
    n_big = state_size(config)
    if cap >= n_big:
        raise ValueError(
            f"tracking_capacity {cap} must be < max capacity {n_big}"
        )
    if cap < config.min_particles:
        raise ValueError(
            f"tracking_capacity {cap} < min_particles "
            f"{config.min_particles}"
        )
    big_config = config
    if global_scoring == "full" and config.corr_window_cells:
        big_config = config.replace(
            corr_window_cells=0, corr_theta_window_bins=0,
            # beam_impl="field" hard-requires a window; the full-map beam
            # path is the per-(particle, beam) range-table lookup
            beam_impl=(
                "table" if config.sensor_model == "beam"
                and config.beam_impl in ("auto", "field") else config.beam_impl
            ),
        )
    small_kw = {}
    if tracking_ess_threshold is not None:
        small_kw["resample_ess_threshold"] = tracking_ess_threshold
    if tracking_theta_bins is not None:
        if not config.corr_window_cells:
            raise ValueError(
                "tracking_theta_bins needs a windowed scorer "
                "(corr_window_cells > 0)"
            )
        if (config.corr_theta_window_bins
                and tracking_theta_bins > config.corr_theta_window_bins):
            raise ValueError(
                f"tracking_theta_bins {tracking_theta_bins} > the config's "
                f"corr_theta_window_bins {config.corr_theta_window_bins}: "
                "the tracking theta window only shrinks"
            )
        small_kw["corr_theta_window_bins"] = tracking_theta_bins
    if tracking_window_cells is not None:
        if not config.corr_window_cells:
            raise ValueError(
                "tracking_window_cells needs a windowed scorer "
                "(corr_window_cells > 0)"
            )
        if tracking_window_cells > config.corr_window_cells:
            raise ValueError(
                f"tracking_window_cells {tracking_window_cells} > the "
                f"config's corr_window_cells {config.corr_window_cells}: "
                "the tracking window only shrinks"
            )
        small_kw["corr_window_cells"] = tracking_window_cells
    small_config = config.replace(
        num_particles=min(config.num_particles, cap),
        max_particles=cap,
        **small_kw,
    )
    big = make_model(big_config, grid_map, voxel_map=voxel_map)
    small = make_model(small_config, grid_map, voxel_map=voxel_map)
    return StagedModel(
        config=big_config, small_config=small_config, grid_map=grid_map,
        big=big, small=small, init=big.init,
    )


@functools.partial(jax.jit, static_argnames=("cap",))
def shrink_state(state: FilterState, cap: int) -> FilterState:
    """BIG -> SMALL hand-off: exact prefix slice.  After the KLD resample
    the active particles occupy slots [0, count) (injected randoms first,
    kept samples after — filter/step.py::_resample_kld), so slicing the
    first ``cap`` rows preserves every active particle when count <= cap."""
    return state.replace(
        particles=state.particles[:cap],
        prev_particles=state.prev_particles[:cap],
        weights=state.weights[:cap],
    )


@functools.partial(jax.jit, static_argnames=("n_big",))
def grow_state(state: FilterState, n_big: int) -> FilterState:
    """SMALL -> BIG hand-off: zero-pad the inactive tail (weights are 0
    there; scoring collapses inactive slots onto slot 0 anyway)."""
    pad = n_big - state.particles.shape[0]
    return state.replace(
        particles=jnp.pad(state.particles, ((0, pad), (0, 0))),
        prev_particles=jnp.pad(state.prev_particles, ((0, pad), (0, 0))),
        weights=jnp.pad(state.weights, (0, pad)),
    )


def next_stage(
    in_small: bool,
    counts,
    p_rand,
    mass,
    cap: int,
    shrink_margin: float = 0.9,
    escalate_p_random: float = 1e-6,
    shrink_mass: float = 0.6,
    escalate_mass: float = 0.35,
) -> bool:
    """The stage-switch policy over a window of StepInfo scalars (arrays
    over the last chunk; scalars work too).  Returns the next in_small.
    Shared by run_staged and OnlineLocalizer's staged mode."""
    counts = np.atleast_1d(np.asarray(counts))
    p_rand = np.atleast_1d(np.asarray(p_rand))
    mass = np.atleast_1d(np.asarray(mass))
    if in_small:
        if (
            counts.max() >= cap
            or p_rand.max() > escalate_p_random
            or mass.min() < escalate_mass
        ):
            return False
        return True
    # never shrink mid-recovery (active injection) or without a dominant
    # mode (the windowed program cannot adjudicate between modes)
    if (
        counts.max() <= int(shrink_margin * cap)
        and p_rand.max() <= escalate_p_random
        and mass.min() >= shrink_mass
    ):
        return True
    return False


class StagedRun(NamedTuple):
    state: FilterState
    infos: object          # stacked StepInfo over all T scans
    modes: np.ndarray      # (T,) 0 = big program, 1 = small program
    switches: int


def warmup_staged(model: StagedModel, state: FilterState, ranges_seq,
                  angles, deltas, chunk: int = 16) -> None:
    """Populate the jit caches of BOTH programs for every chunk length
    ``run_staged`` will dispatch (the ``chunk``-scan body and the final
    remainder), so a timed run measures execution, not XLA compilation —
    the staged twin of ``run_filter_on_bag``'s AOT warmup (a cold compile
    on the remote-TPU host is minutes and would be reported as
    "ms/scan").  Executes one throwaway chunk per (program, length) pair
    on the real inputs; results are discarded (the caller's ``state`` is
    immutable)."""
    ranges_seq = np.asarray(ranges_seq)
    deltas = np.asarray(deltas)
    t_total = len(ranges_seq)
    sizes = {min(chunk, t_total)}
    if t_total % chunk:
        sizes.add(t_total % chunk)
    small_state = shrink_state(state, state_size(model.small_config))
    # warm the switch-time dispatch too: the jitted grow_state (and the
    # device slice ops inside shrink_state) would otherwise pay a remote
    # compile round trip on the FIRST stage switch inside the timed region
    jax.block_until_ready(
        grow_state(small_state, state_size(model.config)).particles)
    for tc in sorted(sizes):
        for st, m in ((state, model.big), (small_state, model.small)):
            out_state, _ = m.run(st, ranges_seq[:tc], angles, deltas[:tc])
            jax.block_until_ready(out_state.particles)


def run_staged(
    model: StagedModel,
    state: FilterState,
    ranges_seq,
    angles,
    deltas,
    chunk: int = 16,
    shrink_margin: float = 0.9,
    escalate_p_random: float = 1e-6,
    shrink_mass: float = 0.6,
    escalate_mass: float = 0.35,
) -> StagedRun:
    """Host-staged trajectory run (the lax.scan runner split into chunks
    at program boundaries).  Returns per-scan infos (concatenated across
    chunks) plus the program trace.

    ``shrink_mass`` / ``escalate_mass``: mode-dominance hysteresis on
    StepInfo.anchor_mass — the hand-off to windowed tracking requires one
    mode to hold >= shrink_mass of the weight through the chunk; dominance
    decaying below escalate_mass in the small program (a latent decoy
    re-inflating on optimistic coarse scores) escalates back."""
    cap = state_size(model.small_config)
    n_big = state_size(model.config)
    ranges_seq = np.asarray(ranges_seq)
    deltas = np.asarray(deltas)
    t_total = len(ranges_seq)
    in_small = state.particles.shape[0] == cap

    infos_chunks = []
    modes = np.zeros(t_total, np.int8)
    switches = 0
    t = 0
    while t < t_total:
        tc = min(chunk, t_total - t)
        m = model.small if in_small else model.big
        state, infos = m.run(
            state, ranges_seq[t:t + tc], angles, deltas[t:t + tc]
        )
        infos_chunks.append(infos)
        modes[t:t + tc] = 1 if in_small else 0
        nxt = next_stage(
            in_small, np.asarray(infos.count), np.asarray(infos.p_random),
            np.asarray(infos.anchor_mass), cap,
            shrink_margin=shrink_margin,
            escalate_p_random=escalate_p_random,
            shrink_mass=shrink_mass, escalate_mass=escalate_mass,
        )
        if nxt and not in_small:
            state = shrink_state(state, cap)
            switches += 1
        elif in_small and not nxt:
            state = grow_state(state, n_big)
            switches += 1
        in_small = nxt
        t += tc

    infos = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate([jnp.asarray(x) for x in xs]),
        *infos_chunks,
    )
    return StagedRun(state=state, infos=infos, modes=modes,
                     switches=switches)
