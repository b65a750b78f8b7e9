"""Pallas fused LSTM recurrence kernel (TPU).

The LSTM stack dominates encoder time (SURVEY §7.4.3: 5 layers x 720 steps
x 768 hidden).  The input projection x @ W_ih is hoisted into one large MXU
matmul outside the kernel (ops/lstm.py does the same); this kernel runs the
sequential part — per step a [N, H] x [H, 4H] hidden matmul plus the gate
nonlinearities — with the recurrent state pinned in VMEM scratch across the
whole scan and W_hh resident in VMEM, so each step touches HBM only for its
xp block in and h block out.

Two timesteps run per grid iteration (UNROLL=2): halving the grid cuts the
Mosaic per-step pipeline overhead ~20% on the recurrence.  The hidden state
scratch is bf16 (cell state stays f32) to fit the double-buffered xp blocks
in the ~16MB VMEM budget at N=256, H=768.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

UNROLL = 2

# Store the trainable forward's cell-state residuals in the compute
# dtype (bf16) instead of f32 — halves the cs stream through HBM in both
# directions at ~3e-3 relative error on the c-dependent gradient terms
# (the in-kernel carries stay f32 either way), and shrinks the backward
# working set enough for its UNROLL=2 path to engage at full batch tile.
# Default ON (measured +2.5% train step on v5e on top of the Pallas CRF
# loss, results/train_variants_r04.json); opt out with
# XNACALL_LSTM_CELL_RESID_BF16=0 for f32-exact residuals.
from xna_basecaller_tpu.utils.platform import env_flag as _env_flag  # noqa: E402,E501

_CELL_RESID_COMPUTE_DTYPE = _env_flag("XNACALL_LSTM_CELL_RESID_BF16", True)

# Inference recurrence unroll override (experiment knob): U=4 keeps the
# same total grid size at BN=128 (vs U=2 at BN=256) but halves the
# Mosaic per-grid-step overhead again at the cost of half-width hidden
# matmuls.  Measured per-hardware; default stays UNROLL (=2).
import os as _os  # noqa: E402

try:
    _INFER_UNROLL = max(
        1, int(_os.environ.get("XNACALL_LSTM_UNROLL", str(UNROLL))))
except ValueError:
    _INFER_UNROLL = UNROLL


def _auto_block_n(n: int, cap: int = 256) -> int:
    """Largest power-of-two-ish batch tile <= cap dividing n.

    The inference kernel's per-step VMEM footprint is dominated by the
    double-buffered xp blocks (2 x UNROLL x BN x 4H bf16): at H=768 a
    BN=256 tile fits the 16MB scoped budget, BN=384 does not — batch is
    tiled on the grid instead (hidden/cell scratch is per-tile)."""
    for bn in (256, 192, 128, 96, 64, 48, 32, 16, 8):
        if bn <= cap and n % bn == 0:
            return bn
    return n


def _batch_pad_rows(n: int) -> int:
    """Zero-rows of batch padding so the batch tiles well on the grid.

    _auto_block_n falls through to BN=n when n has no good divisor
    (e.g. the reference's quick-run batch 98 = 2*7*7): an untiled odd
    block overflows the ~16MB scoped VMEM budget once the kernel's
    stack temporaries are counted (measured 17.9MB at N=98, H=768 in
    the backward).  Batch rows are independent in the recurrence — the
    entry points pad N up to the next multiple of 64 (so BN >= 64) and
    slice the padding back off.  No-op for the shipped batch sizes
    (96/128/256/384/512...) and for small batches (< 64 rows), whose
    untiled blocks always fit."""
    if n < 64:
        return 0
    for bn in (256, 192, 128, 96, 64):
        if n % bn == 0:
            return 0
    return (-n) % 64


def _pad_rows(a, npad: int):
    """Append npad zero batch rows to a [T, N, ...] array."""
    return jnp.concatenate(
        [a, jnp.zeros((a.shape[0], npad) + a.shape[2:], a.dtype)], axis=1)


def _make_scan_kernel(unroll: int):
    def kernel(xp_ref, whh_ref, y_ref, h_ref, c_ref):
        """unroll timesteps: gates = xp_t + h @ W_hh; LSTM cell updates."""
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            h_ref[:] = jnp.zeros_like(h_ref)
            c_ref[:] = jnp.zeros_like(c_ref)

        h = h_ref[:]
        c = c_ref[:]
        H = h.shape[1]
        for u in range(unroll):
            gates = xp_ref[u].astype(jnp.float32) + jnp.dot(
                h.astype(whh_ref.dtype), whh_ref[:],
                preferred_element_type=jnp.float32)
            i = jax.nn.sigmoid(gates[:, :H])
            f = jax.nn.sigmoid(gates[:, H:2 * H])
            g = jnp.tanh(gates[:, 2 * H:3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H:])
            c = f * c + i * g
            h = (o * jnp.tanh(c)).astype(h_ref.dtype)
            y_ref[u] = h.astype(y_ref.dtype)
        h_ref[:] = h
        c_ref[:] = c
    return kernel


@partial(jax.jit, static_argnames=("block_n", "unroll"))
def lstm_recurrence_pallas(xp, w_hh, block_n: int | None = None,
                           unroll: int = UNROLL):
    """xp [T, N, 4H] (input projections + bias), w_hh [H, 4H] ->
    hidden states [T, N, H].

    Batch is tiled on the outer grid dimension (time innermost, so the
    per-tile h/c scratch persists across the whole scan and resets at
    t == 0 for each new batch tile)."""
    T, N0, H4 = xp.shape
    H = H4 // 4
    npad = 0 if block_n else _batch_pad_rows(N0)
    if npad:
        xp = _pad_rows(xp, npad)
    N = N0 + npad
    pad = (-T) % unroll
    if pad:
        xp = jnp.concatenate(
            [xp, jnp.zeros((pad, N, H4), xp.dtype)], axis=0)
    Tp = T + pad
    # U>2 doubles the double-buffered xp block residency: cap the batch
    # tile at 128 so the working set stays inside the ~16MB VMEM budget
    # (same arithmetic as the trainable forward's U=2 cap).
    BN = block_n or _auto_block_n(N, cap=256 if unroll <= 2 else 128)
    # bf16 hidden scratch when the compute dtype is half-precision; f32
    # cell state always (accuracy of the long recurrence).
    h_dtype = jnp.bfloat16 if xp.dtype != jnp.float32 else jnp.float32
    ys = pl.pallas_call(
        _make_scan_kernel(unroll),
        grid=(N // BN, Tp // unroll),
        in_specs=[
            pl.BlockSpec((unroll, BN, H4), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((unroll, BN, H), lambda b, t: (t, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, N, H), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((BN, H), h_dtype),
            pltpu.VMEM((BN, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(xp, w_hh)
    return ys[:T, :N0]


def lstm_forward_pallas(params, x, reverse: bool = False):
    """Drop-in replacement for ops.lstm.lstm_forward using the fused
    kernel for the recurrence."""
    if reverse:
        x = jnp.flip(x, axis=0)
    xp = (jnp.einsum("tni,ih->tnh", x, params["w_ih"],
                     preferred_element_type=jnp.float32)
          + params["bias"]).astype(x.dtype)
    ys = lstm_recurrence_pallas(xp, params["w_hh"], unroll=_INFER_UNROLL)
    if reverse:
        ys = jnp.flip(ys, axis=0)
    return ys


def lstm_stack_forward_pallas(layers, directions, x):
    for params, rev in zip(layers, directions):
        x = lstm_forward_pallas(params, x, reverse=rev)
    return x


# ---------------------------------------------------------------------------
# int8-quantized recurrence (the reference's --quantize / koi int8 LSTM
# graph, util.py:304-309): W_hh is held per-column symmetric int8 and the
# hidden state is requantized to int8 each step, so the serial [N,H]x[H,4H]
# matmul runs the MXU at its int8 rate (2x bf16 on v5e).  |h| < 1 by
# construction (o*tanh(c)), so the hidden scale is the constant 1/127.

def quantize_w_hh(w_hh):
    """Per-column symmetric int8 quantization: w ~= w_q * scale[None, :]."""
    w = w_hh.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return w_q, scale


def int8_matmul(x, w_q, w_scale):
    """int8 x int8 -> int32 MXU matmul with per-column weight scales and
    a dynamic per-tensor activation scale: the v5e MXU runs int8 at 2x
    the bf16 rate, so the big parallel matmuls (LSTM input projections,
    CRF head) join the int8 production path, not just the recurrence.
    x [..., K] float; w_q [K, M] int8; w_scale [M] f32."""
    lead = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) * (1.0 / 127.0)
    x_q = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(x_q, w_q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (xs * w_scale)[None, :]
    return out.reshape(*lead, -1)


def _make_int8_kernel(unroll: int):
    def kernel(xp_ref, wq_ref, scale_ref, y_ref, h_ref, c_ref):
        """unroll timesteps with the recurrent matmul in int8.

        gates = xp_t + (h_q @ w_q) * (scale / 127), h_q = round(h * 127).
        """
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            h_ref[:] = jnp.zeros_like(h_ref)
            c_ref[:] = jnp.zeros_like(c_ref)

        h = h_ref[:].astype(jnp.float32)
        c = c_ref[:]
        H = h.shape[1]
        deq = (scale_ref[:] * (1.0 / 127.0)).astype(jnp.float32)
        for u in range(unroll):
            h_q = jnp.clip(jnp.round(h * 127.0), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                h_q, wq_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            gates = (xp_ref[u].astype(jnp.float32)
                     + acc.astype(jnp.float32) * deq)
            i = jax.nn.sigmoid(gates[:, :H])
            f = jax.nn.sigmoid(gates[:, H:2 * H])
            g = jnp.tanh(gates[:, 2 * H:3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H:])
            c = f * c + i * g
            h = o * jnp.tanh(c)
            y_ref[u] = h.astype(y_ref.dtype)
        h_ref[:] = h.astype(h_ref.dtype)
        c_ref[:] = c
    return kernel


@partial(jax.jit, static_argnames=("block_n", "unroll"))
def lstm_recurrence_pallas_int8(xp, w_q, scale, block_n: int | None = None,
                                unroll: int = UNROLL):
    """xp [T, N, 4H] f32/bf16, w_q int8 [H, 4H], scale f32 [4H] ->
    hidden states [T, N, H] (xp dtype)."""
    T, N0, H4 = xp.shape
    H = H4 // 4
    npad = 0 if block_n else _batch_pad_rows(N0)
    if npad:
        xp = _pad_rows(xp, npad)
    N = N0 + npad
    pad = (-T) % unroll
    if pad:
        xp = jnp.concatenate(
            [xp, jnp.zeros((pad, N, H4), xp.dtype)], axis=0)
    Tp = T + pad
    # BN=256 with bf16 xp double-buffering overflows the 16MB scoped VMEM
    # budget once the f32 dequant scales join the residency set; 128 was
    # also measured faster per layer (grid pipelining hides the smaller
    # matmul's lower MXU occupancy).
    BN = block_n or _auto_block_n(N, cap=128)
    h_dtype = jnp.bfloat16 if xp.dtype != jnp.float32 else jnp.float32
    ys = pl.pallas_call(
        _make_int8_kernel(unroll),
        grid=(N // BN, Tp // unroll),
        in_specs=[
            pl.BlockSpec((unroll, BN, H4), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H4,), lambda b, t: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((unroll, BN, H), lambda b, t: (t, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, N, H), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((BN, H), h_dtype),
            pltpu.VMEM((BN, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(xp, w_q, scale)
    return ys[:T, :N0]


def lstm_forward_pallas_int8(params, x, reverse: bool = False):
    """lstm_forward with int8 everywhere the MXU is engaged: the input
    projection (parallel over T — as many FLOPs as the recurrence) as an
    int8 x int8 -> int32 matmul, and the recurrence via the fused int8
    kernel."""
    if reverse:
        x = jnp.flip(x, axis=0)
    wp_q, wp_scale = quantize_w_hh(params["w_ih"])
    xp = (int8_matmul(x, wp_q, wp_scale)
          + params["bias"]).astype(x.dtype)
    w_q, scale = quantize_w_hh(params["w_hh"])
    ys = lstm_recurrence_pallas_int8(xp, w_q, scale)
    if reverse:
        ys = jnp.flip(ys, axis=0)
    return ys


def lstm_stack_forward_pallas_int8(layers, directions, x):
    for params, rev in zip(layers, directions):
        x = lstm_forward_pallas_int8(params, x, reverse=rev)
    return x


# ---------------------------------------------------------------------------
# Trainable variant: fused forward kernel + analytic backward (custom VJP)

def _make_fwd_cells_kernel(unroll: int):
    def kernel(xp_ref, whh_ref, y_ref, c_out_ref, h_ref, c_ref):
        """Like _make_scan_kernel but also emits the cell states
        (backward residuals), ``unroll`` timesteps per grid step."""
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            h_ref[:] = jnp.zeros_like(h_ref)
            c_ref[:] = jnp.zeros_like(c_ref)

        h = h_ref[:]
        c = c_ref[:]
        H = h.shape[1]
        for u in range(unroll):
            gates = xp_ref[u].astype(jnp.float32) + jnp.dot(
                h.astype(whh_ref.dtype), whh_ref[:],
                preferred_element_type=jnp.float32)
            i = jax.nn.sigmoid(gates[:, :H])
            f = jax.nn.sigmoid(gates[:, H:2 * H])
            g = jnp.tanh(gates[:, 2 * H:3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H:])
            c = f * c + i * g
            h = (o * jnp.tanh(c)).astype(h_ref.dtype)
            y_ref[u] = h.astype(y_ref.dtype)
            c_out_ref[u] = c.astype(c_out_ref.dtype)
        h_ref[:] = h
        c_ref[:] = c
    return kernel


def _pallas_fwd_with_cells(xp, w_hh, block_n: int | None = None,
                           unroll: int = UNROLL):
    T, N0, H4 = xp.shape
    H = H4 // 4
    npad = 0 if block_n else _batch_pad_rows(N0)
    if npad:
        xp = _pad_rows(xp, npad)
    N = N0 + npad
    pad = (-T) % unroll
    if pad:
        xp = jnp.concatenate(
            [xp, jnp.zeros((pad, N, H4), xp.dtype)], axis=0)
    Tp = T + pad
    # U=2 doubles the per-step xp/y/c_out block residency: BN=128 keeps
    # the double-buffered working set inside the ~16MB VMEM budget
    # (BN=256 fits only at U=1).
    BN = block_n or _auto_block_n(N, cap=256 if unroll == 1 else 128)
    h_dtype = jnp.bfloat16 if xp.dtype != jnp.float32 else jnp.float32
    ys, cs = pl.pallas_call(
        _make_fwd_cells_kernel(unroll),
        grid=(N // BN, Tp // unroll),
        in_specs=[
            pl.BlockSpec((unroll, BN, H4), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((unroll, BN, H), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, BN, H), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Tp, N, H), xp.dtype),
            jax.ShapeDtypeStruct(
                (Tp, N, H),
                xp.dtype if _CELL_RESID_COMPUTE_DTYPE else jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((BN, H), h_dtype),
            pltpu.VMEM((BN, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(xp, w_hh)
    return ys[:T, :N0], cs[:T, :N0]


def _make_bwd_kernel(unroll: int):
    def kernel(dy_ref, ysp_ref, csp_ref, cs_ref, xp_ref, whh_ref,
               dxp_ref, dh_ref, dc_ref):
        """``unroll`` reverse timesteps of the analytic LSTM backward.

        The grid walks t = 0..T/U-1 but the index maps feed the U-block
        at time T - U*(t+1), so the dh/dc carries live in VMEM scratch
        across the whole reverse scan and W_hh stays resident; per step:
        one gate-recompute matmul ([BN,H]x[H,4H]) + one cotangent matmul
        (dgates contracted against W_hh's 4H axis = dgates @ W^T without
        materialising the transpose).  Gates are recomputed rather than
        saved: the extra matmul is cheaper than streaming 4 extra
        [T,N,H] residual tensors through HBM.  Unrolling halves the
        Mosaic per-grid-step pipeline overhead on the serial chain (same
        win as the forward kernels' UNROLL=2)."""
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            dh_ref[:] = jnp.zeros_like(dh_ref)
            dc_ref[:] = jnp.zeros_like(dc_ref)

        f32 = jnp.float32
        dh_c = dh_ref[:]
        dc_c = dc_ref[:]
        H = dh_c.shape[1]
        for u in reversed(range(unroll)):  # reverse time within the block
            h_prev = ysp_ref[u]
            gates = xp_ref[u].astype(f32) + jnp.dot(
                h_prev, whh_ref[:], preferred_element_type=f32)
            i = jax.nn.sigmoid(gates[:, :H])
            f = jax.nn.sigmoid(gates[:, H:2 * H])
            g = jnp.tanh(gates[:, 2 * H:3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H:])
            tc = jnp.tanh(cs_ref[u].astype(f32))
            dh = dy_ref[u].astype(f32) + dh_c
            do = dh * tc
            dc = dh * o * (1 - tc * tc) + dc_c
            di = dc * g
            df = dc * csp_ref[u].astype(f32)
            dg = dc * i
            dgates = jnp.concatenate([
                di * i * (1 - i), df * f * (1 - f),
                dg * (1 - g * g), do * o * (1 - o)], axis=1)
            dxp_ref[u] = dgates.astype(dxp_ref.dtype)
            # dgates @ W^T: contract both 4H axes (no transposed copy)
            dh_c = jax.lax.dot_general(
                dgates.astype(whh_ref.dtype), whh_ref[:],
                (((1,), (1,)), ((), ())), preferred_element_type=f32)
            dc_c = dc * f
        dh_ref[:] = dh_c
        dc_ref[:] = dc_c
    return kernel


def _bwd_vmem_bytes(unroll: int, bn: int, h: int, xp_itemsize: int,
                    cs_itemsize: int) -> int:
    """Double-buffered working-set estimate for the backward kernel."""
    per_step = bn * h * (
        2 * xp_itemsize        # dy + ysp
        + 2 * cs_itemsize      # csp + cs
        + 8 * xp_itemsize)     # xp [BN,4H] + dxp out [BN,4H]
    return 2 * unroll * per_step + h * 4 * h * 2 + 2 * bn * h * 4


def _pallas_bwd_dxp(dys, ys_prev, cs_prev, cs, xp, w_hh,
                    block_n: int | None = None):
    """Reverse recurrence as a Pallas kernel -> dgates [T, N, 4H]
    (stored in xp's dtype; the caller's dw einsum consumes it in the
    matmul dtype either way).

    Time is unrolled 2 steps per grid iteration when the double-buffered
    working set fits the ~16MB VMEM budget (it does at BN=128/H=768 with
    bf16 cell residuals; f32 residuals sit right at the edge, so they
    run unrolled only below BN=128)."""
    T, N0, H4 = xp.shape
    H = H4 // 4
    npad = 0 if block_n else _batch_pad_rows(N0)
    if npad:
        # zero batch rows are inert in the reverse recursion (zero dy +
        # zero carries stay zero) and are sliced back off below
        dys, ys_prev, cs_prev, cs, xp = (
            _pad_rows(a, npad) for a in (dys, ys_prev, cs_prev, cs, xp))
    N = N0 + npad
    # W resident (4.5MB at H=768) + cell residual blocks: BN=128 keeps
    # the double-buffered working set inside the 16MB VMEM budget
    BN = block_n or _auto_block_n(N, cap=128)
    unroll = UNROLL
    if (_bwd_vmem_bytes(unroll, BN, H, xp.dtype.itemsize,
                        cs.dtype.itemsize) > 15 * 1024 * 1024):
        unroll = 1
    pad = (-T) % unroll
    if pad:
        # zero padding APPENDED in time is inert for the reverse scan:
        # the padded steps run first with zero carries and dy=0, leaving
        # dh/dc at exactly zero when the real t=T-1 step begins
        z = lambda a: jnp.concatenate(  # noqa: E731
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        dys, ys_prev, cs_prev, cs, xp = map(z, (dys, ys_prev, cs_prev,
                                                cs, xp))
    Tp = T + pad
    nt = Tp // unroll
    rev = lambda b, t: (nt - 1 - t, b, 0)  # noqa: E731
    out = pl.pallas_call(
        _make_bwd_kernel(unroll),
        grid=(N // BN, nt),
        in_specs=[
            pl.BlockSpec((unroll, BN, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, BN, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, BN, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, BN, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, BN, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((unroll, BN, H4), rev,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, N, H4), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((BN, H), jnp.float32),
            pltpu.VMEM((BN, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(dys, ys_prev, cs_prev, cs, xp, w_hh)
    return out[:T, :N0]


@jax.custom_vjp
def lstm_recurrence_trainable(xp, w_hh):
    """Differentiable fused recurrence: forward via the Pallas kernel,
    backward via the analytic LSTM reverse recursion (XLA scan)."""
    ys, _ = _pallas_fwd_with_cells(xp, w_hh)
    return ys


def _trainable_fwd(xp, w_hh):
    ys, cs = _pallas_fwd_with_cells(xp, w_hh)
    return ys, (xp, w_hh, ys, cs)


def _trainable_bwd(res, dys):
    # MXU inputs stay in the forward's compute dtype (bf16 in training —
    # f32 matmuls run at ~1/4 MXU rate on v5e and dominated the step);
    # every accumulation (gate math, dc/dh chains, dw) is f32 inside the
    # kernel.  The reverse recursion runs as a Pallas kernel with the
    # dh/dc carries pinned in VMEM (round 2 ran it as an XLA scan, which
    # re-streamed carries and W through HBM every step and ran the
    # backward at less than half the forward's rate).
    xp, w_hh, ys, cs = res
    T, N, H4 = xp.shape
    H = H4 // 4
    mm = xp.dtype
    ys_prev = jnp.concatenate(
        [jnp.zeros((1, N, H), ys.dtype), ys[:-1]], axis=0)
    cs_prev = jnp.concatenate(
        [jnp.zeros((1, N, H), cs.dtype), cs[:-1]], axis=0)
    dxp = _pallas_bwd_dxp(dys, ys_prev, cs_prev, cs, xp,
                          w_hh.astype(mm))
    # dw hoisted out of the recursion: one big MXU matmul over all
    # timesteps (sum_t h_{t-1}^T dgates_t)
    dw = jnp.einsum("tnh,tng->hg", ys_prev.astype(mm), dxp.astype(mm),
                    preferred_element_type=jnp.float32)
    return dxp.astype(xp.dtype), dw.astype(w_hh.dtype)


lstm_recurrence_trainable.defvjp(_trainable_fwd, _trainable_bwd)


def lstm_forward_pallas_trainable(params, x, reverse: bool = False):
    """Differentiable drop-in for ops.lstm.lstm_forward with the fused
    Pallas forward kernel."""
    if reverse:
        x = jnp.flip(x, axis=0)
    xp = (jnp.einsum("tni,ih->tnh", x, params["w_ih"],
                     preferred_element_type=jnp.float32)
          + params["bias"]).astype(x.dtype)
    ys = lstm_recurrence_trainable(xp, params["w_hh"])
    if reverse:
        ys = jnp.flip(ys, axis=0)
    return ys
