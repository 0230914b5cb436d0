"""Fused LUT one-hot matmul — the beam score-field build kernel.

Replaces the dense per-bin evaluation of the beam sensor model's score
field (models/range_table.py::beam_field_scores, which re-lowers
``compute_likelihoods_raycast`` — parallel_utils.py:151-201 — as dense
field work).  The round-2 dense build paid two costs the TPU punishes:

  * ~190M exp+log transcendentals per scan (32 bins x 360 beams x 128^2
    cells) — ~1.3 ms of VPU time;
  * ~380-750 MB of HBM traffic re-reading the (K, win, win) range-table
    window once per theta bin.

Key observation: the range table only contains ``nq = n_steps + 1``
DISTINCT values (i*RAY_STEP and max_range), so the per-beam log-mixture
collapses to a (M, nq) lookup table computed once per scan (~18k
transcendentals), and the field becomes

    field[k, cell] = sum_g sum_q S[k, g, q] * [Q[g, cell] == q]

with S[k, g, q] = sum_{j: bin(center_k + a_j) = g} lp[j, q] (a tiny
one-hot einsum) and Q the int8-quantized range table.  That inner double
sum is a matmul against a one-hot expansion of Q — but materialized in
XLA the one-hot is K x nq x cells ~ 600 MB of traffic.  This kernel fuses
one-hot construction and matmul in VMEM: per 512-cell tile it loads the
int8 Q rows once, builds each (GC*nqp, 512) one-hot block in registers,
and accumulates ``S_chunk @ onehot`` on the MXU.  Total HBM traffic is
one int8 table read + S + the field write (~10 MB).

Precision modes (chip measurements at kp=360, nq=101, B=32, C=128^2):

* ``"int8"`` (default): S is quantized to TWO int8 planes (hi at scale
  amax/127, lo at scale hi/254) STACKED ALONG M, the one-hot is int8, and
  the MXU accumulates in int32 — which is EXACT, so the only error is the
  S quantization: ~4e-6 relative, 100x tighter than the bf16 modes.  The
  planes-on-M layout doubles MXU row utilization (M=2B instead of B with
  a doubled contraction) and builds each one-hot once.  1.31 ms vs the
  round-2 concat-split kernel's 1.81.
* ``"split"``: bf16 hi+lo planes, same planes-on-M layout, f32
  accumulation (~5e-4 relative).  1.55 ms.
* ``"bf16"``: single bf16 plane (~1e-3 relative): only for callers whose
  downstream tolerance allows it; the int8 mode is both faster and more
  accurate, so this survives for tests/comparison only.

All modes are VPU-bound on the one-hot build (kp x nqp x C compare
elements per scan — 755M at the flagship beam point), NOT MXU-bound:
int8-vs-bf16 MXU rate and 1-vs-2 planes measured within ~4% of each
other (scripts/microbench19/20.py).  That bound is why the caller gates
the full-map coarse-fallback build on an escapee count
(models/range_table.py) instead of relying on kernel speed alone.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile shapes from a chip sweep at the bench point (kp=120, nq=51, B=24,
# C=96^2; scripts/microbench22.py): GC=24/CT=1024 measured ~8% faster than
# the original 8/512 (0.25 vs 0.27 ms) and keeps zero cell padding at
# C=96^2 (9216 = 9*1024).  GC must stay a multiple of 8 (q_ref row slices
# must be provably 8-aligned or Mosaic rejects the vector load).
GC = 24       # table bins (g rows) per accumulation chunk
CT = 1024     # cells per grid program (lane tile)


def _kernel(s_ref, q_ref, out_ref, *, kp, nqp, ct, acc_dtype):
    """out[(plane, b), tile] += S[(plane, b), chunk] @ onehot(Q[chunk, tile]).

    S planes (if any) are stacked along M by the caller; the one-hot is
    built ONCE per chunk in the S dtype and shared by every plane row.
    """
    chunks = kp // GC
    cw = GC * nqp
    qio = jax.lax.broadcasted_iota(jnp.int32, (GC, nqp, ct), 1)
    out_ref[:] = jnp.zeros_like(out_ref)
    oh_dtype = s_ref.dtype

    def body(c, carry):
        q = q_ref[pl.ds(c * GC, GC), :].astype(jnp.int32)      # (GC, ct)
        oh = (q[:, None, :] == qio).astype(oh_dtype).reshape(cw, ct)
        sv = s_ref[:, pl.ds(c * cw, cw)]                       # (MP, cw)
        out_ref[:, :] += jnp.dot(sv, oh,
                                 preferred_element_type=acc_dtype)
        return carry

    jax.lax.fori_loop(0, chunks, body, 0)


def _call(s_stack, qt_p, *, kp, nqp, cp, acc_dtype, interpret):
    mp = s_stack.shape[0]
    return pl.pallas_call(
        functools.partial(_kernel, kp=kp, nqp=nqp, ct=CT,
                          acc_dtype=acc_dtype),
        grid=(cp // CT,),
        in_specs=[
            pl.BlockSpec((mp, kp * nqp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, CT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mp, CT), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, cp), acc_dtype),
        interpret=interpret,
    )(s_stack, qt_p)


@functools.partial(
    jax.jit, static_argnames=("nq", "precision", "interpret")
)
def lut_field(
    qt: jnp.ndarray,       # (K, C) int8 quantized-range rows per table bin
    s: jnp.ndarray,        # (B, K, nq) float32 per-(field-bin, table-bin) LUT
    nq: int,
    precision: str = "int8",
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, C) float32: out[b, c] = sum_g s[b, g, qt[g, c]].

    qt values must lie in [0, nq); nq is padded internally to the smallest
    multiple of 16 (so the per-chunk contraction width GC*nqp stays
    128-lane aligned for the s_ref dynamic slice) — the kernel is
    VPU-bound on the (kp x nqp x C) one-hot build, so every padded q
    lane is ~1% wasted compares (nq=101: 112 vs the old 128 = 12.5%
    fewer; padded q rows carry zero weight either way).
    """
    k, c = qt.shape
    b = s.shape[0]
    assert s.shape[1] == k and s.shape[2] == nq
    nqp = -(-nq // 16) * 16
    kp = -(-k // GC) * GC
    bp = -(-b // 8) * 8
    cp = -(-c // CT) * CT

    # padded q rows/cols are harmless: padded g rows carry zero S weight and
    # padded cell columns are sliced off the output
    qt_p = jnp.pad(qt, ((0, kp - k), (0, cp - c)))
    s_p = jnp.pad(s.astype(jnp.float32),
                  ((0, bp - b), (0, kp - k), (0, nqp - nq)))

    if precision == "int8":
        amax = jnp.maximum(jnp.max(jnp.abs(s_p)), jnp.float32(1e-20))
        s1 = amax / 127.0
        hi = jnp.clip(jnp.round(s_p / s1), -127, 127)
        s2 = s1 / 254.0
        lo = jnp.clip(jnp.round((s_p - hi * s1) / s2), -127, 127)
        s_stack = jnp.concatenate(
            [hi.reshape(bp, kp * nqp), lo.reshape(bp, kp * nqp)], axis=0
        ).astype(jnp.int8)
        out = _call(s_stack, qt_p, kp=kp, nqp=nqp, cp=cp,
                    acc_dtype=jnp.int32, interpret=interpret)
        res = (out[:bp].astype(jnp.float32) * s1
               + out[bp:].astype(jnp.float32) * s2)
    elif precision == "split":
        s_hi = s_p.astype(jnp.bfloat16)
        s_lo = (s_p - s_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        s_stack = jnp.concatenate(
            [s_hi.reshape(bp, kp * nqp), s_lo.reshape(bp, kp * nqp)], axis=0
        )
        out = _call(s_stack, qt_p, kp=kp, nqp=nqp, cp=cp,
                    acc_dtype=jnp.float32, interpret=interpret)
        res = out[:bp] + out[bp:]
    elif precision == "bf16":
        s_stack = s_p.astype(jnp.bfloat16).reshape(bp, kp * nqp)
        res = _call(s_stack, qt_p, kp=kp, nqp=nqp, cp=cp,
                    acc_dtype=jnp.float32, interpret=interpret)
    else:
        raise ValueError(f"unknown precision {precision!r}")
    return res[:b, :c]
