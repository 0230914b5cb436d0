"""Fused per-particle index math + field gather — one kernel pass.

The windowed scorers (models/corr_field.py, models/range_table.py — the
TPU reformulations of ``compute_likelihoods`` / ``compute_likelihoods_
raycast``, parallel_utils.py:85-201) end in the same lookup pattern:

    per particle: world pose -> (fine row, lane) or (coarse row, lane)
    one fused select-gather over the stacked fine + coarse fields
    mask/divide into the final score

Before this kernel the index math ran as XLA elementwise passes over the
2N-particle MH concat — ~15 ops (int casts, mods, clips, window tests,
where-selects) each materializing intermediate (2N,) arrays between the
transpose and the gather kernel's operands (rows, lanes, use_a).  At 1M
particles that is ~0.9 ms of HBM round-trips (scripts/microbench12.py
"[2M] index math"); inside the kernel the same math runs on VMEM-resident
(sub, 128) tiles between the input DMA and the one-hot matmul loop, for
free (VPU cycles the chunk loop doesn't saturate).

The kernel computes, per particle (px, py, pth):

    mx   = i32((px - origin_x) OP scale)            # OP: * (corr) or / (beam)
    tbin = i32((pth + pi) THOP theta_scale) mod K   # THOP: * (corr) or / (beam)
    k_rel = (tbin - kstart) mod K;  in_theta = k_rel < nbins
    in_map / in_window tests, fine (row, lane) vs coarse (row, lane)
    picked = stacked_table[row, lane]               # one-hot MXU gather
    out   = where(in_map, picked / denom, fill_oom)

matching the XLA-side semantics of its two callers bitwise (the op-variant
flags exist because ``x * (1/s)`` and ``x / s`` differ by ulps and the
callers' historical forms differ).  The gather core (row-chunk one-hot
matmuls with a dynamic [min, max] chunk window and predicated skips, bf16
hi[+lo] table planes) is ops/gather_pallas.py's; see that module's
docstring for the memory/precision story.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcmh_localization_tpu.ops.gather_pallas import (
    RC,
    _fold_2d,
    _pick_sub,
)


def _kernel(f32s_ref, i32s_ref, tt_ref, px_ref, py_ref, pth_ref,
            out_ref, acc_ref, *, chunks, split, sub, static):
    e = sub * 128
    cw = 2 * RC if split else RC

    # ---- per-particle index math on VMEM tiles (the fused prologue)
    px = px_ref[:].reshape(1, e)
    py = py_ref[:].reshape(1, e)
    pth = pth_ref[:].reshape(1, e)
    scale = f32s_ref[0]          # fine scale: inv_res (mul) or res (div)
    orx = f32s_ref[1]
    ory = f32s_ref[2]
    denom = f32s_ref[3]
    fill_oom = f32s_ref[4]
    ox0 = i32s_ref[0]
    oy0 = i32s_ref[1]
    kstart = i32s_ref[2]

    if static["fine_div"]:
        fx = (px - orx) / scale
        fy = (py - ory) / scale
    else:
        fx = (px - orx) * scale
        fy = (py - ory) * scale
    mx = fx.astype(jnp.int32)
    my = fy.astype(jnp.int32)

    n_theta = static["n_theta"]
    nbins = static["nbins"]
    if static["theta_div"]:
        tb = (pth + jnp.float32(jnp.pi)) / jnp.float32(static["theta_scale"])
    else:
        tb = (pth + jnp.float32(jnp.pi)) * jnp.float32(static["theta_scale"])
    tbin = tb.astype(jnp.int32) % n_theta
    k_rel = (tbin - kstart) % n_theta
    in_theta = k_rel < nbins
    tbin_w = jnp.where(in_theta, k_rel, 0)

    h, w = static["h"], static["w"]
    fh, fw = static["fh"], static["fw"]
    in_map = (mx >= 0) & (mx < w) & (my >= 0) & (my < h)
    if static["clip_before_window"]:
        mxw = jnp.clip(mx, 0, w - 1) - ox0
        myw = jnp.clip(my, 0, h - 1) - oy0
    else:
        mxw = mx - ox0
        myw = my - oy0
    in_window = (mxw >= 0) & (mxw < fw) & (myw >= 0) & (myw < fh)
    covered = in_window & in_theta
    rows_a = jnp.clip(myw, 0, fh - 1) * nbins + tbin_w
    lanes_a = jnp.clip(mxw, 0, fw - 1)

    kc, hc, wc = static["kc"], static["hc"], static["wc"]
    res_c = jnp.float32(static["res_c"])
    cx = jnp.clip(((px - orx) / res_c).astype(jnp.int32), 0, wc - 1)
    cy = jnp.clip(((py - ory) / res_c).astype(jnp.int32), 0, hc - 1)
    ck = (
        (pth + jnp.float32(jnp.pi)) * jnp.float32(kc / (2.0 * jnp.pi))
    ).astype(jnp.int32) % kc
    rows_b = static["coarse_base"] + cy * kc + ck

    rows_flat = jnp.where(covered, rows_a, rows_b)
    lanes_flat = jnp.where(covered, lanes_a, cx)

    # ---- one-hot MXU gather (ops/gather_pallas.py::_kernel core)
    mask = (
        jax.lax.broadcasted_iota(jnp.int32, (128, e), 0) == lanes_flat
    ).astype(jnp.float32)
    riota = jax.lax.broadcasted_iota(jnp.int32, (cw, e), 0) % RC
    row_chunk = rows_flat // RC

    acc_ref[:] = jnp.zeros((128, e), jnp.float32)

    def chunk_body(c, carry):
        @pl.when(jnp.any(row_chunk == c))
        def _():
            oh = (riota + c * RC == rows_flat).astype(jnp.bfloat16)
            acc_ref[:, :] += jnp.dot(
                tt_ref[:, pl.ds(c * cw, cw)], oh,
                preferred_element_type=jnp.float32,
            )

        return carry

    # TWO disjoint chunk windows, one per field: fine rows (covered) live
    # below coarse_base, coarse rows (escapees) above it — the caller
    # chunk-aligns coarse_base, so no chunk holds both.  A single
    # [min, max] window would walk the predicated gap between the tracked
    # cloud's fine chunks and the coarse region whenever a tile holds even
    # ONE proposal-noise escapee (measured +2.9 ms at 2M on v5e,
    # scripts/microbench12 with/without coarse); split windows skip the
    # gap, and an escapee-free tile runs ZERO coarse iterations (empty
    # fori ranges: min sentinel > max sentinel).  Accumulation is bitwise
    # identical — each row contributes in exactly one chunk either way.
    big = jnp.int32(chunks)      # empty-window sentinels: lo=big > hi=-1
    neg = jnp.int32(-1)
    lo_f = jnp.min(jnp.where(covered, row_chunk, big))
    hi_f = jnp.max(jnp.where(covered, row_chunk, neg))
    lo_c = jnp.min(jnp.where(covered, big, row_chunk))
    hi_c = jnp.max(jnp.where(covered, neg, row_chunk))
    jax.lax.fori_loop(lo_f, hi_f + 1, chunk_body, 0)
    jax.lax.fori_loop(lo_c, hi_c + 1, chunk_body, 0)
    picked = jnp.sum(acc_ref[:] * mask, axis=0, keepdims=True)

    # ---- fused epilogue: aggregation divide + out-of-map fill
    out = jnp.where(in_map, picked / denom, fill_oom)
    out_ref[:] = out.reshape(sub, 128)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_theta", "nbins", "fh", "fw", "h", "w", "kc", "hc", "wc",
        "res_c", "theta_scale", "fine_div", "theta_div",
        "clip_before_window", "precision", "interpret",
    ),
)
def fused_window_score_gather(
    field_t: jnp.ndarray,    # (fh*nbins, fw<=128) f32 fine field, theta-minor
    cfield_t: jnp.ndarray,   # (hc*kc, wc<=128) f32 coarse fallback field
    px: jnp.ndarray,         # (N,) f32
    py: jnp.ndarray,
    pth: jnp.ndarray,
    origin_x: jnp.ndarray,   # () f32 traced (grid_map.origin[0])
    origin_y: jnp.ndarray,
    fine_scale: jnp.ndarray,  # () f32 traced: inv_res (mul) or res (div)
    ox0: jnp.ndarray,        # () i32 traced window origin col
    oy0: jnp.ndarray,        # () i32 traced window origin row
    kstart: jnp.ndarray,     # () i32 traced theta-window start bin
    denom: jnp.ndarray,      # () f32 traced: totals / denom (1.0 = sum agg)
    fill_oom: jnp.ndarray,   # () f32 traced: value for out-of-map particles
    *,
    n_theta: int,
    nbins: int,
    fh: int,
    fw: int,
    h: int,
    w: int,
    kc: int,
    hc: int,
    wc: int,
    res_c: float,
    theta_scale: float,
    fine_div: bool,
    theta_div: bool,
    clip_before_window: bool,
    precision: str = "split",
    interpret: bool = False,
) -> jnp.ndarray:
    """Final per-particle windowed field scores, (N,) f32 (see module doc).

    Semantics (bitwise vs the unfused paths in models/corr_field.py and
    models/range_table.py given matching op-variant flags):

        covered = in_window & in_theta
        t = covered ? fine[clip(myw)*nbins + tbin_w, clip(mxw)]
                    : coarse[cy*kc + ck, cx]
        out = in_map ? t / denom : fill_oom
    """
    assert fw <= 128 and wc <= 128, "fused lookup needs <=128-lane fields"
    n = px.shape[0]

    fa, _cwa = _fold_2d(field_t)
    fb, _cwb = _fold_2d(cfield_t)
    # chunk-align the fine table so the kernel's two chunk windows (fine
    # rows below coarse_base, coarse rows above) can never share a chunk —
    # a shared boundary chunk would be visited by BOTH windows and
    # double-accumulate; the zero pad rows are never addressed
    fa = jnp.pad(fa, ((0, (-fa.shape[0]) % RC), (0, 0)))
    coarse_base = fa.shape[0]
    combined = jnp.concatenate([fa, fb], axis=0)

    r = combined.shape[0]
    rpad = (-r) % RC
    combined = jnp.pad(combined, ((0, rpad), (0, 0)))
    chunks = (r + rpad) // RC

    split = precision == "split"
    sub = _pick_sub(chunks, split)
    tt = combined.T
    tt_hi = tt.astype(jnp.bfloat16)
    if split:
        tt_lo = (tt - tt_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        r2 = chunks * RC
        tt_k = jnp.concatenate(
            [tt_hi.reshape(128, chunks, 1, RC),
             tt_lo.reshape(128, chunks, 1, RC)], axis=2,
        ).reshape(128, 2 * r2)
    else:
        tt_k = tt_hi

    npad = (-n) % (sub * 128)
    # edge-pad: padding lanes replay a real particle so they cannot widen
    # the kernel's dynamic chunk window
    px_p = jnp.pad(px.astype(jnp.float32), (0, npad), mode="edge")
    py_p = jnp.pad(py.astype(jnp.float32), (0, npad), mode="edge")
    pth_p = jnp.pad(pth.astype(jnp.float32), (0, npad), mode="edge")
    m = (n + npad) // 128
    px2 = px_p.reshape(m, 128)
    py2 = py_p.reshape(m, 128)
    pth2 = pth_p.reshape(m, 128)

    f32s = jnp.stack([
        jnp.asarray(fine_scale, jnp.float32),
        jnp.asarray(origin_x, jnp.float32),
        jnp.asarray(origin_y, jnp.float32),
        jnp.asarray(denom, jnp.float32),
        jnp.asarray(fill_oom, jnp.float32),
    ])
    i32s = jnp.stack([
        jnp.asarray(ox0, jnp.int32),
        jnp.asarray(oy0, jnp.int32),
        jnp.asarray(kstart, jnp.int32),
    ])

    static = dict(
        n_theta=n_theta, nbins=nbins, fh=fh, fw=fw, h=h, w=w,
        kc=kc, hc=hc, wc=wc, res_c=res_c, theta_scale=theta_scale,
        fine_div=fine_div, theta_div=theta_div,
        clip_before_window=clip_before_window, coarse_base=coarse_base,
    )
    cw = 2 * RC if split else RC
    out = pl.pallas_call(
        functools.partial(
            _kernel, chunks=chunks, split=split, sub=sub, static=static
        ),
        grid=(m // sub,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((128, chunks * cw), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sub, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((128, sub * 128), jnp.float32)],
        interpret=interpret,
    )(f32s, i32s, tt_k, px2, py2, pth2)
    return out.reshape(-1)[:n]


def fused_lookup_supported(fh, nbins, fw, hc, kc, wc,
                           precision: str = "split", n=None) -> bool:
    """Whether the fused kernel can serve this field geometry: 128-lane
    fields and a combined table under the gather VMEM budget.  ``n``
    (static particle count, when known) applies the same small-N floor as
    gather_pallas._use_kernel: below _MIN_N the per-call table
    fold/transpose/bf16-split prep outweighs the gather it feeds, and the
    unfused XLA path is faster (ADVICE r3)."""
    if fw > 128 or wc > 128:
        return False
    from mcmh_localization_tpu.ops.gather_pallas import (
        _MAX_TABLE_BYTES,
        _MIN_N,
        _table_bytes,
    )

    if n is not None and n < _MIN_N:
        return False
    rows = fh * nbins + hc * kc
    return _table_bytes(rows, precision) <= _MAX_TABLE_BYTES
