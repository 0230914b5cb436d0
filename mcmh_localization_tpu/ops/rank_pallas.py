"""Sorted-rank kernel — systematic-resampling indices without scatter.

``systematic_resample_indices`` needs ``idx[m] = #{j : bound_j <= m}``
(the rank of each output slot m in the sorted segment-bound array; see
ops/resampling.py).  The XLA formulation scatters segment starts and
cummax-fills — but TPU scatter serializes (~10 ms for 1M int32, measured
scripts/microbench11.py), dwarfing the cumsum (1.3 ms) it supports.

Both sequences are SORTED (bound is a cumulative count; m is iota), so
ranking is a windowed merge:

  * a coarse XLA pass counts bounds below each output-tile boundary
    (``jnp.searchsorted`` over E-strided probes — tiny),
  * each grid step DMAs the window of ``bound`` its tile can intersect
    and ranks E consecutive integers against it entirely in VMEM:
       - per 128-value chunk of the window, chunks whose MAX <= m are
         fully counted (compare vs 128 chunk-maxes),
       - exactly ONE chunk straddles each m (values are sorted), fetched
         with a one-hot MXU row-gather and ranked with 128 compares.

  cost/tile ~ 3M VPU ops + one (128 x 128) @ (128 x E) dot — ~0.5 ms at
  1M total vs ~13 ms for scatter+cummax.

Tiles that would need more than the window (more than W inputs mapping
into one output tile — adversarially concentrated weights) fall back to
the XLA scatter path via ``lax.cond``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WROWS = 128          # window chunks (sublanes); window = WROWS*128 entries
SUB = 64             # output tile sublanes -> E = SUB*128 outputs

# take-dot mode: "triple" = exact triple-bf16 decomposition (3 DEFAULT MXU
# passes per dot instead of HIGHEST's 6 — v = hi + mid + lo with each
# residual exactly representable, and a 0/1 one-hot contraction has a
# single nonzero per output column, so (d_hi + d_mid) + d_lo reproduces
# the f32 value bit-for-bit; only f32 DENORMAL particle coords could
# break it, via bf16 flush — poses/weights never are).  MEASURED
# equal-speed to "highest" on chip at 1M (4.98 vs 5.01 ms,
# scripts/microbench26.py, bitwise-equal outputs): the kernel is DMA/VPU-
# bound, not MXU-bound — so the simpler single-dot form stays the default
# and "triple" is kept as the documented negative result.
EXPAND_DOT = "highest"


def _exact_onehot_dot(vals, oh, mode: str | None = None):
    """(128, e) f32: d[l, em] = vals[r(em), l] for the one-hot ``oh``
    (WROWS, e) with at most one nonzero per column — bitwise-exact f32.
    ``mode`` overrides EXPAND_DOT (tests exercise the "triple"
    decomposition so its bitwise-exactness claim stays verified)."""
    if (mode or EXPAND_DOT) == "triple":
        hi = vals.astype(jnp.bfloat16)
        r1 = vals - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        ohb = oh.astype(jnp.bfloat16)

        def one(p):
            return jax.lax.dot_general(
                p, ohb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        return (one(hi) + one(mid)) + one(lo)
    return jax.lax.dot_general(
        vals, oh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _rank_tile(vals, m, wstart, rtot):
    """(1, e) int32 clipped rank of the consecutive integers ``m`` (1, e)
    against the sorted VMEM window ``vals`` (WROWS, 128): full chunks by
    chunk-max compare, the single straddling chunk by one-hot MXU row
    fetch + 128 compares.  Shared by the rank-only and fused kernels."""
    e = m.shape[1]
    chunk_max = jnp.max(vals, axis=1, keepdims=True)      # (WROWS, 1)
    nfull = jnp.sum(
        (chunk_max <= m).astype(jnp.int32), axis=0, keepdims=True
    )  # (1, e) in [0, WROWS]
    # the single straddling chunk is row nfull (sorted rows); row WROWS
    # (= none straddles) must contribute 0 -> one-hot over WROWS rows only
    oh = (
        jax.lax.broadcasted_iota(jnp.int32, (WROWS, e), 0) == nfull
    ).astype(jnp.float32)
    # d[l, em] = vals[nfull[em], l] via MXU (f32 exact: one-hot x int value)
    d = jax.lax.dot_general(
        vals.astype(jnp.float32), oh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (128, e)
    partial = jnp.sum(
        (d <= m.astype(jnp.float32)).astype(jnp.int32) * (oh.sum(0) > 0),
        axis=0, keepdims=True,
    )
    return jnp.clip(wstart * 128 + nfull * 128 + partial, 0, rtot - 1)


def _tile_m(t, e):
    """The tile's consecutive output integers tE..tE+e-1 as (1, e)."""
    sub = e // 128
    return (
        t * e
        + jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 1)
    ).reshape(1, e)


def _kernel(starts_ref, cap_ref, bound_hbm, out_ref, win, sem, *, rtot):
    """Rank kernel with DOUBLE-BUFFERED window DMA: tile t+1's bound
    window prefetches while tile t computes (TPU grid steps run
    sequentially, so scratch persists across them) — without it every
    grid step stalled on its own ~64 kB HBM fetch."""
    e = SUB * 128
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    slot = jax.lax.rem(t, 2)

    def copy(s, tile):
        return pltpu.make_async_copy(
            bound_hbm.at[pl.ds(starts_ref[tile], WROWS), :],
            win.at[s], sem.at[s],
        )

    @pl.when(t == 0)
    def _():
        copy(0, 0).start()

    @pl.when(t + 1 < nt)
    def _():
        copy(jax.lax.rem(t + 1, 2), t + 1).start()

    copy(slot, t).wait()
    wstart = starts_ref[t]                  # first window entry row
    # slots beyond the cap (count-truncated draws) rank as slot cap —
    # "tail repeats", and the clamp is what keeps their windows narrow
    m = jnp.minimum(_tile_m(t, e), cap_ref[0])
    out_ref[:] = _rank_tile(win[slot], m, wstart, rtot).reshape(SUB, 128)


@functools.partial(jax.jit, static_argnames=("m_out", "rtot", "interpret"))
def _rank_kernel_call(bound2, starts, cap, m_out, rtot, interpret=False):
    return pl.pallas_call(
        functools.partial(_kernel, rtot=rtot),
        grid=(m_out // (SUB * 128),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((SUB, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_out // 128, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, WROWS, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(starts, cap, bound2)


def _probe_windows(bound, num_out, e, r, rrows, count, clamp_take):
    """Host-side prologue shared by rank_in_sorted and expand_sorted:
    per-tile clamped probes, window start rows, and the fits predicate.

    ``clamp_take=True`` is the fused-take variant: wstart additionally
    clamps so idx (<= r-1) can never precede the window, and fits is
    STRICT with a min(_, r-1) bound (the take's window-local offset must
    stay < WROWS*128; rank values may equal it — the in-kernel clip to
    r-1 makes the window-end equality case safe ONLY because the clamped
    window then covers the array tail)."""
    m_pad = -(-num_out // e) * e
    # the cap clamps at num_out - 1 as well: a PREFIX draw (num_out <
    # count, ops/resampling.py::kld_resample stage 1) clips its bounds at
    # num_out, leaving a long run of bound == num_out whose probe would
    # blow the boundary tile's window open and silently drop the whole
    # call to the ~15 ms XLA fallback (measured: 11.3 ms for a 200k-of-1M
    # prefix vs 5.9 ms for the FULL 1M expand); slots beyond num_out are
    # sliced off, so probing them at the last real slot is exact
    mcap = (
        jnp.minimum(jnp.asarray(count - 1, jnp.int32),
                    jnp.int32(num_out - 1))
        if count is not None else jnp.int32(num_out - 1)
    )
    t0 = jnp.arange(0, m_pad, e, dtype=jnp.int32)
    tstarts = jnp.minimum(t0, mcap)
    tends = jnp.minimum(t0 + (e - 1), mcap)
    cnt = jnp.searchsorted(bound, tstarts, side="right").astype(jnp.int32)
    hi = max(rrows - WROWS, 0)
    if clamp_take:
        hi = max(0, min(hi, (r - 1) // 128))
    wstart = jnp.clip(cnt // 128, 0, hi)
    cnt_next = jnp.searchsorted(bound, tends, side="right").astype(jnp.int32)
    if clamp_take:
        fits = jnp.all(
            jnp.minimum(cnt_next, r - 1) - wstart * 128 < WROWS * 128
        )
    else:
        fits = jnp.all(cnt_next - wstart * 128 <= WROWS * 128)
    return m_pad, mcap, wstart, fits


def rank_in_sorted(
    bound: jnp.ndarray,   # (R,) int32 NONDECREASING, values in [0, num_out]
    num_out: int,
    interpret: bool | None = None,
    count=None,           # traced scalar: slots >= count are tail repeats
) -> jnp.ndarray:
    """(num_out,) int32: out[m] = #{j : bound[j] <= m}, clipped to [0, R-1]
    — i.e. the index of the particle whose segment [bound[j-1], bound[j])
    covers output slot m (identical to scatter+cummax; see the covering
    argument in ops/resampling.py).

    Kernel path on TPU for num_out >= 64k; XLA scatter+cummax fallback
    elsewhere or when an output tile's input span exceeds the window.
    """
    r = bound.shape[0]
    e = SUB * 128

    def xla_path(_):
        # scatter+cummax formulation (see ops/resampling.py docstring)
        prev = jnp.concatenate([jnp.zeros(1, jnp.int32), bound[:-1]])
        has = bound > prev
        starts_pos = jnp.where(has, prev, num_out)
        seg = jnp.full(num_out, -1, dtype=jnp.int32)
        seg = seg.at[starts_pos].max(
            jnp.arange(r, dtype=jnp.int32), mode="drop"
        )
        return jnp.clip(jax.lax.cummax(seg), 0, r - 1)

    # interpret=True makes the kernel path eligible off-TPU (interpret
    # mode, for tests); the fits check below still guards adversarial spans
    use = (interpret is True) or (
        jax.default_backend() == "tpu" and num_out >= 8 * e
    )
    if not use:
        return xla_path(None)

    # pad rows to at least one full kernel window, with num_out + 1
    # (> every real m) so table padding never counts for real outputs
    rrows = max(-(-r // 128), WROWS)
    bound2 = jnp.pad(bound.astype(jnp.int32), (0, rrows * 128 - r),
                     constant_values=num_out + 1).reshape(-1, 128)

    # coarse pass + fits: with a count, ranked slots clamp at count-1
    # (tail repeats) and the probes clamp too — THIS is what keeps the
    # active/tail boundary tile's window narrow (without it, one tile
    # straddles cnt(count)..R and the whole call falls back to the ~15 ms
    # XLA scatter in every count-adaptive draw)
    m_pad, mcap, wstart, fits = _probe_windows(
        bound, num_out, e, r, rrows, count, clamp_take=False
    )

    def kernel_path(_):
        out = _rank_kernel_call(
            bound2, wstart, mcap.reshape(1), m_pad, r,
            interpret=bool(interpret) if interpret is not None else False,
        )
        return out.reshape(-1)[:num_out]

    return jax.lax.cond(fits, kernel_path, xla_path, operand=None)


# ---------------------------------------------------------------------------
# Fused expansion: rank + particle take in ONE kernel pass
# ---------------------------------------------------------------------------

ESUB = 32   # fused tile sublanes (smaller: rank + take buffers coexist)


def _expand_kernel(starts_ref, cap_ref, bound_hbm, cols_hbm, out_ref,
                   winb, winc, semb, semc, *, rtot, c):
    """Fused rank+take with DOUBLE-BUFFERED window DMA (see _kernel): the
    next tile's bound + particle-column windows (~256 kB) stream in while
    this tile ranks and takes."""
    e = ESUB * 128
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    slot = jax.lax.rem(t, 2)

    def copies(s, tile):
        ws = starts_ref[tile]
        return (
            pltpu.make_async_copy(
                bound_hbm.at[pl.ds(ws, WROWS), :], winb.at[s], semb.at[s]
            ),
            pltpu.make_async_copy(
                cols_hbm.at[:, pl.ds(ws, WROWS), :], winc.at[s], semc.at[s]
            ),
        )

    @pl.when(t == 0)
    def _():
        cb, cc = copies(0, 0)
        cb.start()
        cc.start()

    @pl.when(t + 1 < nt)
    def _():
        cb, cc = copies(jax.lax.rem(t + 1, 2), t + 1)
        cb.start()
        cc.start()

    cb, cc = copies(slot, t)
    cb.wait()
    wstart = starts_ref[t]
    m = jnp.minimum(_tile_m(t, e), cap_ref[0])  # tail slots repeat slot cap
    idx = _rank_tile(winb[slot], m, wstart, rtot)

    # take: window-local offsets (wstart clamped so idx >= wstart*128)
    rl = idx - wstart * 128
    rr = rl // 128
    ll = rl % 128
    oh2 = (
        jax.lax.broadcasted_iota(jnp.int32, (WROWS, e), 0) == rr
    ).astype(jnp.float32)
    lane_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (128, e), 0) == ll
    ).astype(jnp.float32)
    cc.wait()
    for ci in range(c):
        dc = _exact_onehot_dot(winc[slot, ci], oh2)
        out_ref[ci] = jnp.sum(dc * lane_mask, axis=0).reshape(ESUB, 128)


@functools.partial(jax.jit, static_argnames=("m_out", "rtot", "interpret"))
def _expand_kernel_call(bound2, cols3, starts, cap, m_out, rtot,
                        interpret=False):
    c = cols3.shape[0]
    return pl.pallas_call(
        functools.partial(_expand_kernel, rtot=rtot, c=c),
        grid=(m_out // (ESUB * 128),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((c, ESUB, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, m_out // 128, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, WROWS, 128), jnp.int32),
            pltpu.VMEM((2, c, WROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(starts, cap, bound2, cols3)


def expand_sorted(
    bound: jnp.ndarray,       # (R,) int32 NONDECREASING in [0, num_out]
    particles: jnp.ndarray,   # (R, C) float32
    num_out: int,
    interpret: bool | None = None,
    count=None,               # traced scalar: slots >= count tail-repeat
) -> jnp.ndarray:
    """``particles[rank_in_sorted(bound, num_out)]`` in ONE fused kernel:
    per output tile, the bound window AND the particle-column windows share
    the same DMA base, the rank resolves in-VMEM, and the take's one-hot
    dot consumes it directly — no intermediate index array, no second
    kernel invocation (bitwise-equal to the two-step path;
    tests/test_resampling.py)."""
    r, c = particles.shape
    e = ESUB * 128

    def xla_path(_):
        return particles[rank_in_sorted(bound, num_out, count=count)]

    use = (interpret is True) or (
        jax.default_backend() == "tpu" and num_out >= 16 * e
    )
    if not use:
        return xla_path(None)

    rrows = max(-(-r // 128), WROWS)
    bound2 = jnp.pad(bound.astype(jnp.int32), (0, rrows * 128 - r),
                     constant_values=num_out + 1).reshape(-1, 128)
    cols3 = jnp.stack([
        jnp.pad(particles[:, ci], (0, rrows * 128 - r)).reshape(-1, 128)
        for ci in range(c)
    ])

    m_pad, mcap, wstart, fits = _probe_windows(
        bound, num_out, e, r, rrows, count, clamp_take=True
    )

    def kernel_path(_):
        out = _expand_kernel_call(
            bound2, cols3, wstart, mcap.reshape(1), m_pad, r,
            interpret=bool(interpret) if interpret is not None else False,
        )
        return out.reshape(c, -1)[:, :num_out].T

    return jax.lax.cond(fits, kernel_path, xla_path, operand=None)
