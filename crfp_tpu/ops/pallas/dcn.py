"""Gather-free windowed deformable conv as a Pallas TPU kernel.

This is the Mosaic implementation of the interpolation-matrix design in
docs/PERF.md (Roadmap) — the native-component mandate of SURVEY.md §2.1
row 1 (reference: the external CUDA ``dcn_v2`` extension driven by
/root/reference/model/CRFP.py:281-370). Semantics match
:func:`crfp_tpu.ops.dcn.deform_conv2d` exactly whenever every sample
displacement satisfies ``|offset| <= max_displacement``; beyond that the
displacement is clamped (the same bounded-support trade the reference's
own runtime makes spatially with ``warp_size``).

Why a kernel: XLA TPU gathers cost ~10-30 ns per slice regardless of
width, making the exact DCN ~95% gather time, and the XLA ``lax.map``
form of this same design (crfp_tpu/ops/dcn_windowed.py) serializes
hundreds-to-thousands of per-tile cells, which wins at the 1/4-res
alignment shapes but collapses at the HR dcn_3 (measured seconds). The
hardware grid loop below removes that overhead; the gathers become MXU
matmuls.

Per grid step (one output row-band x column-tile x deformable group):

1. DMA the padded source window (rows x cols*cpg lanes) HBM -> VMEM,
   double-buffered across grid steps so the copy hides under compute.
2. Build the 2-sparse row-interpolation matrix R (queries x window rows)
   from iota compares and contract it with the window on the MXU:
   v = R @ win  — this performs every sample's row interpolation.
3. Build the 2-sparse column weights directly on the flat lane index
   (col = lane // cpg), multiply elementwise with v and the DCN
   modulation mask.
4. Contract the tap's query block against the weight matrix
   pre-expanded onto the flat lane axis (W_k[l, o] = w[k, l % cpg, o]),
   accumulating the output tile in f32 — column interpolation and the
   conv-weight contraction fuse into one matmul per tap.

Steps 2-4 run once per kernel tap (a static k^2 loop), so the peak VMEM
footprint is one (window-lanes, pixels) intermediate.

Layout (round 3): every per-query array is TRANSPOSED — queries live on
the LANE axis (the per-cell query count is a multiple of 128) and the
small field/channel index on sublanes. Per-pixel query data arrives as
(fields, P) blocks ([ly_k | lx_k | mask_k] on sublanes); the output tile
is (out_ch, P), revisited across the deformable-group grid axis and
accumulated in VMEM. The previous (P, fields) layout put 2-27 fields on
the minor dim, which HBM tiling pads to 128 lanes — up to ~64x physical
traffic on the qd/out block copies and on every XLA-side prep pass
(docs/PERF.md "Known bound" (a), now closed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dcn_kernel(
    starts_ref,  # (total, 2) int32 scalar-prefetch: per-grid-step window
                 # (row, lane) DMA starts into the padded planes — static
                 # cell corners normally, per-cell anchored corners in
                 # anchor mode (docs/PERF.md lever 2)
    qd_ref,      # (1, 1, L, P) f32: sublanes [ly_k | lx_k | mask_k], queries on lanes
    w_ref,       # (1, k2, o, wcwin) expanded transposed weights for this group
    xg_hbm,      # (NG, Hp, Wcp) padded source planes, HBM
    out_ref,     # (1, 1, o, P) f32 output tile (revisited across g)
    win_s,       # (2, hwin, wcwin) VMEM scratch, double-buffered
    sems,        # (2,) DMA semaphores
    *,
    n_groups: int,
    n_cells: int,
    n_tiles: int,
    band: int,
    xtile: int,
    k2: int,
    cpg: int,
    o: int,
    hwin: int,
    wcwin: int,
    kh: int = 3,
    kw: int = 3,
    shared: bool = False,
    mask_mode: str = "per_tap",  # 'none' | 'shared' | 'per_tap'
):
    """Transposed-query layout: every per-query array keeps the P query
    index on LANES (p_tile is a multiple of 128) and the small field/
    channel index on sublanes, so the qd/out block copies and every VPU
    intermediate are dense — the original (P, fields) layout tile-padded
    the few-lane minor dim to 128 and multiplied HBM traffic up to ~64x
    (docs/PERF.md "Known bound")."""
    i = pl.program_id(0)
    total = pl.num_programs(0)
    p_tile = band * xtile

    # prep guarantees every start in the table is tile-aligned (rows to
    # the sublane tile, lanes to 128); Mosaic needs the hint to prove it
    sub_tile = 16 if win_s.dtype == jnp.bfloat16 else 8

    def window_dma(idx, slot):
        g = idx % n_groups
        ni = idx // (n_groups * n_cells)
        return pltpu.make_async_copy(
            xg_hbm.at[
                ni * n_groups + g,
                pl.ds(pl.multiple_of(starts_ref[idx, 0], sub_tile), hwin),
                pl.ds(pl.multiple_of(starts_ref[idx, 1], 128), wcwin),
            ],
            win_s.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        window_dma(0, 0).start()

    @pl.when(i + 1 < total)
    def _():
        window_dma(i + 1, (i + 1) % 2).start()

    window_dma(i, i % 2).wait()
    win = win_s[i % 2]  # (hwin, wcwin)

    qd = qd_ref[0, 0]  # (L, P)
    riota = jax.lax.broadcasted_iota(jnp.int32, (hwin, p_tile), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (wcwin, p_tile), 0) // cpg

    # f32 operands need multi-pass MXU precision: the default single bf16
    # pass injects ~1e-2 error, which breaks the "exact within the window"
    # contract. bf16 operands are single-pass either way.
    cdtype = win_s.dtype
    prec = None if cdtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    # NOTE: intermediates are built in f32 and cast at the matmul inputs.
    # Building r_mat natively in bf16 crashes the Mosaic compiler here,
    # and bf16 matmul accumulators are rejected ("acc must be 32-bit"),
    # so the f32-build + cast pattern is the supported one.

    def stage1(ly):
        """Row interpolation: 2-sparse matrix -> MXU. ly (1, P) ->
        v (wcwin, P) f32 via the lhs-transposed contraction
        win^T(wcwin, hwin) @ Rt(hwin, P)."""
        y0 = jnp.floor(ly)
        fy = ly - y0
        y0i = y0.astype(jnp.int32)
        r_mat = jnp.where(riota == y0i, 1.0 - fy, 0.0) + jnp.where(
            riota == y0i + 1, fy, 0.0
        )
        return jax.lax.dot_general(
            win,
            r_mat.astype(cdtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    def colweights(lx):
        """Column weights on the flat sublane index (col = sublane // cpg).
        lx (1, P) -> (wcwin, P)."""
        x0 = jnp.floor(lx)
        fx = lx - x0
        x0i = x0.astype(jnp.int32)
        return jnp.where(col == x0i, 1.0 - fx, 0.0) + jnp.where(
            col == x0i + 1, fx, 0.0
        )

    def stage2(acc, v, cw, mk, k):
        """Fused column-reduce + conv-weight contraction on the MXU:
        acc(o, P) += W_k(o, wcwin) @ u(wcwin, P)."""
        u = (v * cw * mk if mk is not None else v * cw).astype(cdtype)
        return acc + jax.lax.dot_general(
            w_ref[0, k],
            u,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    # per-tap: keeps peak VMEM at one (wcwin, P) intermediate instead of
    # a (k2*wcwin, P) block (which OOMs scoped vmem at the model shapes)
    acc = jnp.zeros((o, p_tile), jnp.float32)
    if shared:
        # repeat mode: every tap shares one (dy, dx) per pixel, so tap
        # (ty, tx) samples at center + (ty, tx) — one row interpolation
        # per kernel ROW and one column-weight build per kernel COLUMN
        # instead of per tap. qd sublanes: [ly, lx, mask_0..mask_{k2-1}]
        # (one mask sublane in 'shared' mask mode).
        ly_c = qd[0:1]
        lx_c = qd[1:2]
        cws = [colweights(lx_c + float(tx - (kw - 1) // 2)) for tx in range(kw)]
        for ty in range(kh):
            v = stage1(ly_c + float(ty - (kh - 1) // 2))
            for tx in range(kw):
                k = ty * kw + tx
                mk = qd[2 + k : 3 + k] if mask_mode == "per_tap" else None
                acc = stage2(acc, v, cws[tx], mk, k)
        if mask_mode == "shared":
            # one modulation scalar per (pixel, group) broadcast to every
            # tap: the sum over taps is linear, so scale the accumulator
            # once instead of k2 multiplies over (wcwin, P)
            acc = acc * qd[2:3]
    else:
        for k in range(k2):
            v = stage1(qd[k : k + 1])
            cw = colweights(qd[k2 + k : k2 + k + 1])
            mk = qd[2 * k2 + k : 2 * k2 + k + 1] if mask_mode == "per_tap" else None
            acc = stage2(acc, v, cw, mk, k)

    g = i % n_groups

    @pl.when(g == 0)
    def _():
        out_ref[0, 0] = acc

    @pl.when(g > 0)
    def _():
        out_ref[0, 0] = out_ref[0, 0] + acc


def _dcn_bwd_kernel(
    *refs,       # [starts_ref when anchored,] qd_ref, w_ref, gout_ref,
                 # xg_hbm, dqd_ref, dwin_ref, dwexp_ref, win_s, sems
    n_batch: int,
    n_groups: int,
    n_cells: int,
    n_tiles: int,
    band: int,
    xtile: int,
    k2: int,
    cpg: int,
    o: int,
    hwin: int,
    wcwin: int,
    kh: int = 3,
    kw: int = 3,
    shared: bool = False,
    mask_mode: str = "per_tap",
    a_y: int = 0,   # anchored: row anchor range (dwin block is hwin+2*a_y
    a_xc: int = 0,  # rows by wcwin+2*a_xc lanes; the cell's cotangent is
                    # stored at its dynamic anchored offset so the host
                    # overlap-add keeps static cell-corner starts)
):
    """Fully-Pallas backward of the windowed DCN (VERDICT round-2 task 9).

    Recomputes the forward interpolation factors per tap (checkpoint
    style) and emits all cotangents as MXU work:

      s_k   = W_k^T g            (wcwin, P)  — the output pullback
      dwin += Rt_k x (cw∘m∘s)^T  (hwin, wcwin) — per-cell window grad,
              overlap-added into the padded planes by the XLA wrapper
      dR    = win @ (cw∘m∘s)     (hwin, P) -> dly via the 2-sparse masks
      dlx   = colsel ∘ (v∘m∘s) summed over sublanes
      dm    = (v∘cw∘s) summed over sublanes
      dW_k += g x u_k^T          (o, wcwin), accumulated across cells

    Replaces the XLA lax.map backward whose serialized dynamic-slice
    additions dominated the training step (~400 of 515 ms at B2/T5/GT160,
    round-3 device trace).

    Grid is G-MAJOR here (i = g*(n*cells) + n_i*cells + cell) so the
    dwexp accumulator block stays resident across its visits.

    Anchored mode (a_y/a_xc > 0): the window DMA start comes from the
    scalar-prefetched per-cell starts table (g-major order) instead of
    the static cell corner, and dwin_ref is EXTENDED by the anchor range
    — the cell's (hwin, wcwin) cotangent is stored at its anchored
    offset inside the (hwin+2*a_y, wcwin+2*a_xc) block, so the host-side
    overlap-add keeps its static cell-corner diagonal structure.
    """
    anchored = a_y > 0 or a_xc > 0
    if anchored:
        (starts_ref, qd_ref, w_ref, gout_ref, xg_hbm,
         dqd_ref, dwin_ref, dwexp_ref, win_s, sems) = refs
    else:
        (qd_ref, w_ref, gout_ref, xg_hbm,
         dqd_ref, dwin_ref, dwexp_ref, win_s, sems) = refs
    i = pl.program_id(0)
    total = pl.num_programs(0)
    p_tile = band * xtile
    nc = n_batch * n_cells
    rem = i % nc
    sub_tile = 16 if win_s.dtype == jnp.bfloat16 else 8

    def window_dma(idx, slot):
        g = idx // nc
        r = idx % nc
        ni = r // n_cells
        cell = r % n_cells
        bi = cell // n_tiles
        tj = cell % n_tiles
        if anchored:
            row0 = pl.multiple_of(starts_ref[idx, 0], sub_tile)
            col0 = pl.multiple_of(starts_ref[idx, 1], 128)
        else:
            row0, col0 = bi * band, tj * xtile * cpg
        return pltpu.make_async_copy(
            xg_hbm.at[
                ni * n_groups + g,
                pl.ds(row0, hwin),
                pl.ds(col0, wcwin),
            ],
            win_s.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        window_dma(0, 0).start()

    @pl.when(i + 1 < total)
    def _():
        window_dma(i + 1, (i + 1) % 2).start()

    window_dma(i, i % 2).wait()
    win = win_s[i % 2]  # (hwin, wcwin), cdtype

    qd = qd_ref[0, 0]          # (L, P) f32
    gout = gout_ref[0, 0]      # (o, P) f32
    riota = jax.lax.broadcasted_iota(jnp.int32, (hwin, p_tile), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (wcwin, p_tile), 0) // cpg

    cdtype = win_s.dtype
    prec = None if cdtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    g_cd = gout.astype(cdtype)

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, (dims, ((), ())), preferred_element_type=jnp.float32,
            precision=prec,
        )

    def row_factors(ly):
        y0 = jnp.floor(ly)
        fy = ly - y0
        y0i = y0.astype(jnp.int32)
        r_mat = jnp.where(riota == y0i, 1.0 - fy, 0.0) + jnp.where(
            riota == y0i + 1, fy, 0.0
        )
        dsel = jnp.where(riota == y0i + 1, 1.0, 0.0) - jnp.where(
            riota == y0i, 1.0, 0.0
        )
        return r_mat, dsel

    def col_factors(lx):
        x0 = jnp.floor(lx)
        fx = lx - x0
        x0i = x0.astype(jnp.int32)
        cw = jnp.where(col == x0i, 1.0 - fx, 0.0) + jnp.where(
            col == x0i + 1, fx, 0.0
        )
        dsel = jnp.where(col == x0i + 1, 1.0, 0.0) - jnp.where(
            col == x0i, 1.0, 0.0
        )
        return cw, dsel

    dwin_acc = jnp.zeros((hwin, wcwin), jnp.float32)
    dwexp_taps = []
    if shared:
        ly_c = qd[0:1]
        lx_c = qd[1:2]
        cfs = [col_factors(lx_c + float(tx - (kw - 1) // 2)) for tx in range(kw)]
        dly = jnp.zeros((1, p_tile), jnp.float32)
        dlx = jnp.zeros((1, p_tile), jnp.float32)
        dms = []
        dm_shared = jnp.zeros((1, p_tile), jnp.float32)
        for ty in range(kh):
            r_mat, rdsel = row_factors(ly_c + float(ty - (kh - 1) // 2))
            r_cd = r_mat.astype(cdtype)
            v = dot(win, r_cd, ((0,), (0,)))  # (wcwin, P) f32
            e_row = jnp.zeros((wcwin, p_tile), jnp.float32)
            for tx in range(kw):
                k = ty * kw + tx
                cw, cdsel = cfs[tx]
                if mask_mode == "per_tap":
                    m = qd[2 + k : 3 + k]
                elif mask_mode == "shared":
                    m = qd[2:3]
                else:
                    m = None
                s = dot(w_ref[0, k], g_cd, ((0,), (0,)))  # (wcwin, P) f32
                ms = s * m if m is not None else s
                e = cw * ms
                e_row = e_row + e
                dlx = dlx + jnp.sum(cdsel * (v * ms), axis=0, keepdims=True)
                if mask_mode == "per_tap":
                    dms.append(jnp.sum(v * cw * s, axis=0, keepdims=True))
                elif mask_mode == "shared":
                    dm_shared = dm_shared + jnp.sum(v * cw * s, axis=0, keepdims=True)
                u = (v * cw * m if m is not None else v * cw).astype(cdtype)
                dwexp_taps.append(dot(g_cd, u, ((1,), (1,))))  # (o, wcwin)
            e_cd = e_row.astype(cdtype)
            dwin_acc = dwin_acc + dot(r_cd, e_cd, ((1,), (1,)))
            dldr = dot(win, e_cd, ((1,), (0,)))  # (hwin, P) f32
            dly = dly + jnp.sum(rdsel * dldr, axis=0, keepdims=True)
        rows = [dly, dlx]
        if mask_mode == "per_tap":
            rows += dms
        elif mask_mode == "shared":
            rows.append(dm_shared)
        dqd_ref[0, 0] = jnp.concatenate(rows, axis=0)
    else:
        dly_rows, dlx_rows, dm_rows = [], [], []
        for k in range(k2):
            r_mat, rdsel = row_factors(qd[k : k + 1])
            cw, cdsel = col_factors(qd[k2 + k : k2 + k + 1])
            m = qd[2 * k2 + k : 2 * k2 + k + 1] if mask_mode == "per_tap" else None
            r_cd = r_mat.astype(cdtype)
            v = dot(win, r_cd, ((0,), (0,)))
            s = dot(w_ref[0, k], g_cd, ((0,), (0,)))
            ms = s * m if m is not None else s
            e = cw * ms
            e_cd = e.astype(cdtype)
            dwin_acc = dwin_acc + dot(r_cd, e_cd, ((1,), (1,)))
            dldr = dot(win, e_cd, ((1,), (0,)))
            dly_rows.append(jnp.sum(rdsel * dldr, axis=0, keepdims=True))
            dlx_rows.append(jnp.sum(cdsel * (v * ms), axis=0, keepdims=True))
            if m is not None:
                dm_rows.append(jnp.sum(v * cw * s, axis=0, keepdims=True))
            u = (v * cw * m if m is not None else v * cw).astype(cdtype)
            dwexp_taps.append(dot(g_cd, u, ((1,), (1,))))
        dqd_ref[0, 0] = jnp.concatenate(dly_rows + dlx_rows + dm_rows, axis=0)

    if anchored:
        # place this cell's cotangent at its anchored offset inside the
        # extended block: buffer row 0 <-> plane row bi*band, so
        # roff = start_row - bi*band = ayq + a_y (a multiple of the
        # sublane tile), coff likewise a multiple of 128 lanes
        cell = rem % n_cells
        bi = cell // n_tiles
        tj = cell % n_tiles
        roff = pl.multiple_of(starts_ref[i, 0] - bi * band, sub_tile)
        coff = pl.multiple_of(starts_ref[i, 1] - tj * xtile * cpg, 128)
        dwin_ref[0, 0] = jnp.zeros((hwin + 2 * a_y, wcwin + 2 * a_xc),
                                   jnp.float32)
        dwin_ref[0, 0, pl.ds(roff, hwin), pl.ds(coff, wcwin)] = dwin_acc
    else:
        dwin_ref[0, 0] = dwin_acc
    dwexp = jnp.stack(dwexp_taps, axis=0)  # (k2, o, wcwin)

    @pl.when(rem == 0)
    def _():
        dwexp_ref[0] = dwexp

    @pl.when(rem > 0)
    def _():
        dwexp_ref[0] = dwexp_ref[0] + dwexp


@functools.lru_cache(maxsize=None)
def _fwd_call(geom):
    """Build the forward pallas_call closure for one static geometry."""
    (n, g, n_cells, n_tiles, band, xtile, k2, cpg, o, hwin, wcwin,
     kh, kw, shared, mask_mode, qd_lanes, dtype_str, interpret) = geom
    cdtype = jnp.dtype(dtype_str)
    p_tile = band * xtile
    total = n * n_cells * g
    kernel = functools.partial(
        _dcn_kernel,
        n_groups=g, n_cells=n_cells, n_tiles=n_tiles, band=band, xtile=xtile,
        k2=k2, cpg=cpg, o=o, hwin=hwin, wcwin=wcwin, kh=kh, kw=kw,
        shared=shared, mask_mode=mask_mode,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # the (total, 2) window-start table
        grid=(total,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, qd_lanes, p_tile),
                lambda i, s: (
                    (i // (g * n_cells)) * g + i % g,
                    (i // g) % n_cells,
                    0,
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, k2, o, wcwin),
                lambda i, s: (i % g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, o, p_tile),
            lambda i, s: (i // (g * n_cells), (i // g) % n_cells, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, hwin, wcwin), cdtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, n_cells, o, p_tile), jnp.float32),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _bwd_call(geom, ext=(0, 0)):
    """Build the backward pallas_call closure (g-major grid) for one
    static geometry. Returns (dqd, dwin_cells, dwexp).

    ``ext`` = (a_y, a_xc): anchored mode — the call takes a g-major
    (total, 2) starts table as scalar prefetch and dwin blocks are
    extended by the anchor range (see ``_dcn_bwd_kernel``)."""
    (n, g, n_cells, n_tiles, band, xtile, k2, cpg, o, hwin, wcwin,
     kh, kw, shared, mask_mode, qd_lanes, dtype_str, interpret) = geom
    a_y, a_xc = ext
    anchored = a_y > 0 or a_xc > 0
    h_e, wc_e = hwin + 2 * a_y, wcwin + 2 * a_xc
    cdtype = jnp.dtype(dtype_str)
    p_tile = band * xtile
    total = n * n_cells * g
    nc = n * n_cells
    kernel = functools.partial(
        _dcn_bwd_kernel,
        n_batch=n, n_groups=g, n_cells=n_cells, n_tiles=n_tiles, band=band,
        xtile=xtile, k2=k2, cpg=cpg, o=o, hwin=hwin, wcwin=wcwin, kh=kh,
        kw=kw, shared=shared, mask_mode=mask_mode, a_y=a_y, a_xc=a_xc,
    )

    def plane_cell(i):
        r = i % nc
        return ((r // n_cells) * g + i // nc, r % n_cells)

    in_specs = [
        pl.BlockSpec(
            (1, 1, qd_lanes, p_tile),
            (lambda i, s: (*plane_cell(i), 0, 0)) if anchored
            else (lambda i: (*plane_cell(i), 0, 0)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, k2, o, wcwin),
            (lambda i, s: (i // nc, 0, 0, 0)) if anchored
            else (lambda i: (i // nc, 0, 0, 0)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, o, p_tile),
            (lambda i, s: ((i % nc) // n_cells, (i % nc) % n_cells, 0, 0))
            if anchored
            else (lambda i: ((i % nc) // n_cells, (i % nc) % n_cells, 0, 0)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
    ]
    out_specs = [
        pl.BlockSpec(
            (1, 1, qd_lanes, p_tile),
            (lambda i, s: (*plane_cell(i), 0, 0)) if anchored
            else (lambda i: (*plane_cell(i), 0, 0)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, h_e, wc_e),
            (lambda i, s: (*plane_cell(i), 0, 0)) if anchored
            else (lambda i: (*plane_cell(i), 0, 0)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, k2, o, wcwin),
            (lambda i, s: (i // nc, 0, 0, 0)) if anchored
            else (lambda i: (i // nc, 0, 0, 0)),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n * g, n_cells, qd_lanes, p_tile), jnp.float32),
        jax.ShapeDtypeStruct((n * g, n_cells, h_e, wc_e), jnp.float32),
        jax.ShapeDtypeStruct((g, k2, o, wcwin), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((2, hwin, wcwin), cdtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if anchored:
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(total,),
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            interpret=interpret,
        )
    return pl.pallas_call(
        kernel,
        grid=(total,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )


def _overlap_add(dwin, h_e, wc_e, band, xc, n_bands, n_tiles, hp, wcp):
    """Overlap-add per-cell window cotangents into the padded planes.

    Window (bi, tj) starts at plane row bi*band, lane tj*xc (anchored
    cells already stored their contribution at the anchored offset
    INSIDE their extended block), so contributions land on aligned
    diagonals — a K x L static sum of dense slabs, no serialized
    scatter."""
    kk_n = -(-h_e // band)
    ll_n = -(-wc_e // xc)
    ng = dwin.shape[0]
    b = jnp.pad(
        dwin.reshape(ng, n_bands, n_tiles, h_e, wc_e),
        ((0, 0), (0, 0), (0, 0), (0, kk_n * band - h_e), (0, ll_n * xc - wc_e)),
    ).reshape(ng, n_bands, n_tiles, kk_n, band, ll_n, xc)
    acc = jnp.zeros(
        (ng, n_bands + kk_n - 1, band, n_tiles + ll_n - 1, xc), jnp.float32
    )
    for kk in range(kk_n):
        for ll in range(ll_n):
            acc = acc.at[:, kk : kk + n_bands, :, ll : ll + n_tiles, :].add(
                b[:, :, :, kk, :, ll, :].transpose(0, 1, 3, 2, 4)
            )
    return acc.reshape(
        ng, (n_bands + kk_n - 1) * band, (n_tiles + ll_n - 1) * xc
    )[:, :hp, :wcp]


@functools.lru_cache(maxsize=None)
def _core_op(geom):
    """The cell-level windowed-DCN op with a fully-Pallas custom VJP.

    core(qd, wexp, xg) -> (n, cells, o, P). The backward kernel returns
    the qd/wexp cotangents directly; the per-cell window cotangents are
    overlap-added into the padded source planes (``_overlap_add``)."""
    (n, g, n_cells, n_tiles, band, xtile, k2, cpg, o, hwin, wcwin,
     kh, kw, shared, mask_mode, qd_lanes, dtype_str, interpret) = geom
    cdtype = jnp.dtype(dtype_str)
    n_bands = n_cells // n_tiles
    xc = xtile * cpg

    # static (unanchored) window-start table: a compile-time constant
    # derived from the geometry
    import numpy as np

    cell_i = np.arange(n_cells, dtype=np.int32)
    st = np.stack([(cell_i // n_tiles) * band, (cell_i % n_tiles) * xc], -1)
    starts = np.broadcast_to(
        st[None, :, None], (n, n_cells, g, 2)).reshape(-1, 2).copy()

    @jax.custom_vjp
    def core(qd, wexp, xg):
        return _fwd_call(geom)(starts, qd, wexp, xg)

    def fwd(qd, wexp, xg):
        return _fwd_call(geom)(starts, qd, wexp, xg), (qd, wexp, xg)

    def bwd(res, gout):
        qd, wexp, xg = res
        dqd, dwin, dwexp = _bwd_call(geom)(qd, wexp, gout.astype(jnp.float32), xg)
        dxg = _overlap_add(dwin, hwin, wcwin, band, xc, n_bands, n_tiles,
                           xg.shape[1], xg.shape[2])
        return dqd, dwexp.astype(wexp.dtype), dxg.astype(cdtype)

    core.defvjp(fwd, bwd)
    return core


@functools.lru_cache(maxsize=None)
def _core_op_anchored(geom, a_y, a_xc):
    """Anchored cell-level core with a fully-Pallas custom VJP.

    core(starts, qd, wexp, xg): the per-(n, cell, g) window-start table
    is a TRACED non-differentiable input (its cotangent is float0). The
    backward runs ``_dcn_bwd_kernel`` in anchored mode — window DMAs
    follow the same starts, and each cell's window cotangent is stored
    at its anchored offset inside an anchor-range-extended block — so
    the host-side overlap-add keeps the static cell-corner diagonal
    structure of the unanchored path. The qd cotangent flows back
    through the residual-clip prep to the raw offsets as usual (the
    anchor quantization itself is round()-flat, gradient zero a.e.)."""
    import numpy as np

    (n, g, n_cells, n_tiles, band, xtile, k2, cpg, o, hwin, wcwin,
     kh, kw, shared, mask_mode, qd_lanes, dtype_str, interpret) = geom
    cdtype = jnp.dtype(dtype_str)
    n_bands = n_cells // n_tiles
    xc = xtile * cpg

    @jax.custom_vjp
    def core(starts, qd, wexp, xg):
        return _fwd_call(geom)(starts, qd, wexp, xg)

    def fwd(starts, qd, wexp, xg):
        return _fwd_call(geom)(starts, qd, wexp, xg), (starts, qd, wexp, xg)

    def bwd(res, gout):
        starts, qd, wexp, xg = res
        # fwd table is (n, cells, g, 2)-ordered; the bwd grid is g-major
        starts_b = starts.reshape(n, n_cells, g, 2).transpose(
            2, 0, 1, 3).reshape(-1, 2)
        dqd, dwin, dwexp = _bwd_call(geom, (a_y, a_xc))(
            starts_b, qd, wexp, gout.astype(jnp.float32), xg)
        dxg = _overlap_add(dwin, hwin + 2 * a_y, wcwin + 2 * a_xc, band, xc,
                           n_bands, n_tiles, xg.shape[1], xg.shape[2])
        return (np.zeros(starts.shape, dtype=jax.dtypes.float0), dqd,
                dwexp.astype(wexp.dtype), dxg.astype(cdtype))

    core.defvjp(fwd, bwd)
    return core


def deform_conv2d_pallas(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    *,
    max_displacement: int = 8,
    band: int = 8,
    xtile: int = 32,
    shared_taps: bool = False,
    shared_mask: bool = False,
    s2d: int = 1,
    anchor: bool = False,
    fullgrad: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Windowed modulated deformable conv (stride 1, 'same', dilation 1).

    ``fullgrad``: route the cell-level core through its custom VJP — the
    fully-Pallas backward kernel (``_dcn_bwd_kernel``); the surrounding
    prep/post (transposes, clips, weight expansion) is differentiated by
    JAX as usual, so ``jax.grad`` works end-to-end.

    Same signature/layout as :func:`crfp_tpu.ops.dcn.deform_conv2d` plus
    the window config:

      x: (N, H, W, C); offset: (N, H, W, G, K2, 2), last dim (dy, dx);
      mask: (N, H, W, G, K2); weight: (kh, kw, C, O); bias: (O,) | None.

    Displacements are clamped to ``±max_displacement``; within the window
    the result matches the exact gather formulation.

    ``shared_taps``: the reference's ``repeat=True`` mode — one (dy, dx)
    per (pixel, group) broadcast to every tap. Pass offset shaped
    (N, H, W, G, 1, 2); the kernel then builds one row-interpolation per
    kernel row and one column-weight set per kernel column instead of
    per tap (~kh-fold less stage-1 work).

    ``shared_mask`` (requires shared_taps): one modulation scalar per
    (pixel, group) broadcast to every tap — pass mask (N, H, W, G, 1).
    The sum over taps is linear, so the kernel scales its accumulator
    once instead of multiplying k2 (wcwin, P) intermediates (this is
    exactly the reference repeat-mode DCN_module, whose mask head emits
    one channel per group, /root/reference/model/CRFP.py:339-347).

    ``s2d=r``: every per-pixel operand arrives/leaves in space-to-depth(r)
    layout with unchanged full-resolution semantics — x (N, H/r, W/r,
    C*r^2) c-major, offset (N, H/r, W/r, G, K, 2, r^2), mask (N, H/r,
    W/r, G, Km, r^2), output (N, H/r, W/r, O*r^2). The hr_s2d model tail
    keeps its activations in this layout; folding the relayout into the
    kernel's existing prep/post transposes removes the pixel_shuffle /
    pixel_unshuffle copy pairs (~8 MB each at data-formatting rates) that
    a round-3 device trace showed bracketing every kernel call.

    ``anchor``: per-cell window anchoring (inference-only). Each (cell,
    group)'s DMA window starts at the cell's quantized mean displacement
    rather than the cell corner, shrinking the halo from ±D-sized to
    residual-sized (rows: ~16, cols: quantized by the 128-lane grid) —
    2-3.5x less stage-1 MXU work and window DMA at D=32 — while RAISING
    the effective displacement range to anchor±dl with |anchor| <= D
    rounded up. Exactness contract becomes: exact wherever the sample
    displacement lies within ±dl of the cell's anchor (dl >= 12; reported
    geometry in the source). For cell-coherent motion (smooth flows) this
    is strictly more accurate than the plain ±D clamp.

    Mosaic requires every manual DMA slice of the (8, 128)-tiled source
    planes to be tile-aligned in both sublane (rows) and lane (w*cpg)
    dims, so the geometry is quantized: band and the window row count to
    the sublane tile, xtile and the halo so column starts/widths are
    multiples of 128 lanes. The requested ``band``/``xtile`` are rounded
    up accordingly; the halo rounding only ever widens the exact window.
    """
    import math

    req_band, req_xtile = band, xtile  # pre-quantization, for fallbacks
    r = s2d
    assert r == 1 or not (r & (r - 1)) or True  # any r >= 1
    if shared_mask:
        assert shared_taps, "shared_mask is defined for shared_taps mode"
    kh, kw, wc, o = weight.shape
    k2 = kh * kw
    k_off = 1 if shared_taps else k2
    k_mask = 1 if shared_mask else k2
    if r > 1:
        n, hs, ws, cs = x.shape
        assert cs % (r * r) == 0, (x.shape, r)
        c = cs // (r * r)
        h, w = hs * r, ws * r
        g = offset.shape[3]
        assert offset.shape == (n, hs, ws, g, k_off, 2, r * r), offset.shape
        assert mask is None or mask.shape == (n, hs, ws, g, k_mask, r * r), (
            mask.shape)
    else:
        n, h, w, c = x.shape
        g = offset.shape[3]
        assert offset.shape == (n, h, w, g, k_off, 2), (offset.shape, shared_taps)
        assert mask is None or mask.shape == (n, h, w, g, k_mask), mask.shape
    assert wc == c, (weight.shape, x.shape)
    assert c % g == 0, (c, g)
    cpg = c // g
    pad_y, pad_x = (kh - 1) // 2, (kw - 1) // 2
    d = max_displacement

    def round_up(v, m):
        return -(-v // m) * m

    sub_tile = 16 if x.dtype == jnp.bfloat16 else 8
    lane_q = 128 // math.gcd(cpg, 128)
    # row starts and the slice height must be multiples of the sublane
    # tile (and of the s2d block); lane starts and the slice width
    # (xtile + 2*halo_c)*cpg multiples of 128 lanes
    band = round_up(band, sub_tile if r == 1 else math.lcm(sub_tile, r))
    xtile = round_up(xtile, lane_q if r == 1 else math.lcm(lane_q, r))
    if anchor:
        # Per-cell anchored windows (docs/PERF.md lever 2): the DMA window
        # for each (cell, group) starts at the cell's quantized mean
        # displacement instead of the cell corner, so the halo only needs
        # to cover the RESIDUAL spread around that anchor (plus the
        # anchor-quantization error), not the full ±D range. Exact-within-
        # window becomes "exact whenever |off - cell_anchor| <= dl"; for
        # cell-coherent motion the effective displacement range RISES to
        # ±(A + dl) > ±D. Differentiable when fullgrad: the backward
        # kernel follows the same starts table and stores each cell's
        # window cotangent at its anchored offset inside an extended
        # block, keeping the overlap-add's static diagonal structure.
        a_y = round_up(d, sub_tile)       # anchor range/quantum, rows
        a_x = round_up(d, lane_q)         # anchor range/quantum, cols
        dl_r = float(max(12, sub_tile // 2 + 8))
        dl_c = float(max(12, lane_q // 2 + 8))
        halo_r = round_up(int(dl_r) + pad_y + 2, sub_tile // 2)
        halo_c = round_up(int(dl_c) + pad_x + 2, max(1, lane_q // 2))
        dl_r = float(halo_r - pad_y - 2)  # use all the rounding slack
        dl_c = float(halo_c - pad_x - 2)
    else:
        a_y = a_x = 0
        dl_r = dl_c = float(d)
        halo_r = round_up(d + pad_y + 2, sub_tile // 2)
        halo_c = round_up(d + pad_x + 2, max(1, lane_q // 2))

    # scoped-VMEM guard: the per-cell intermediates (v f32, the column
    # weights — kw of them cached in shared mode — the u product in the
    # compute dtype, the double-buffered qd/out/weight blocks and the
    # window scratch) must stay under Mosaic's 16M stack limit; shrink the
    # band, then the xtile, until they do. (Observed: f32 P=2048 x
    # wcwin=512 OOMs at 16.71M; f32 shared g=1 cpg=32 hit 23.8M before the
    # wexp-block and cws terms were counted.)
    item = 2 if x.dtype == jnp.bfloat16 else 4
    l_est = round_up(2 * k_off + (k_mask if mask is not None else 0), sub_tile)
    band_q = sub_tile if r == 1 else math.lcm(sub_tile, r)
    xtile_q = lane_q if r == 1 else math.lcm(lane_q, r)

    def vmem_est(band_e, xtile_e):
        p_est = band_e * xtile_e
        wcwin_est = (xtile_e + 2 * halo_c) * cpg
        hwin_est = band_e + 2 * halo_r
        cw_bufs = 4 * (kw if shared_taps else 1)  # cached cws in shared mode
        est = (
            p_est * wcwin_est * (4 + item + cw_bufs)  # v f32 + u + cw(s)
            + p_est * (l_est + o + 8) * 4             # qd + out blocks (dense)
            + 2 * hwin_est * wcwin_est * item         # double-buffered window
            + 2 * k2 * o * wcwin_est * item           # double-buffered wexp block
        )
        # Mosaic's actual stack peaks run 1.3-1.75x over this sum
        # (ungrouped temporaries per tap; measured: f32 warp P=2048
        # 16.71M vs 12.6M est, f32 shared cpg=32 23.8M vs 13.8M est).
        # The backward kernel holds ~1.5x more live state (v/s/e + dldr +
        # the dwin accumulator; measured 19.98M where the forward guard
        # sized for ~13M), so fullgrad geometries get an extra factor —
        # larger still in shared-tap mode, whose backward keeps e_row and
        # the kw cached column factors live across the tap loop (measured
        # 17.04M where est*1.75*1.6 predicted 12.3M at the tiny-shape
        # dcn_3 train geometry: actual/est ~3.9x).
        # Applied whenever fullgrad (any dtype): f32 is the parity training
        # path, and bf16 differentiates under AMP training (TrainConfig.amp)
        # — the backward's live temporaries (v/s/e/dldr, the dwin
        # accumulator) are f32 either way, so the factor must not be gated
        # on the operand dtype. Inference (fullgrad=False) is unaffected.
        grad_f = (2.4 if shared_taps else 1.6) if fullgrad else 1.0
        est = est * (1.75 if shared_taps else 1.33) * grad_f
        if fullgrad and anchor:
            # the anchored backward's dwin output block is extended by
            # the anchor range (double-buffered by the pipeline)
            est += 2 * (hwin_est + 2 * a_y) * (wcwin_est + 2 * a_x * cpg) * 4
        return est

    while band > band_q and vmem_est(band, xtile) > 15_500_000:
        band -= band_q
    # band at its floor and still over: shrink xtile in steps that keep
    # p_tile a multiple of 128 lanes (and of the s2d block)
    xstep = math.lcm(xtile_q, 128 // math.gcd(band, 128))
    xtile = round_up(xtile, xstep)
    while xtile > xstep and vmem_est(band, xtile) > 15_500_000:
        xtile -= xstep

    if fullgrad and vmem_est(band, xtile) > 15_500_000:
        # Even the floor geometry cannot host the backward kernel's live
        # state — at small images with large D the ±D halo dominates the
        # window while band/xtile are already at their quantization
        # floors (observed: 16x16-LR dcn_3 train geometry, halo 64 vs
        # band 8, Mosaic stack 17.04M). Degrade this op to the
        # XLA-windowed backward (same math, same clamps) instead of
        # compile-OOMing; the forward stays the Mosaic kernel.
        if anchor:
            # anchored math: the backward must reproduce the kernel's
            # anchor cell grid exactly, so the RESOLVED band/xtile are
            # baked into the mirror (and into its forward request)
            op = _vjp_wrapped_anchored(
                max_displacement, band, xtile, sub_tile, lane_q,
                a_y, a_x, dl_r, dl_c, shared_taps, shared_mask,
                mask is not None, s2d, interpret)
            mk = mask if mask is not None else jnp.zeros((0,), jnp.float32)
            return op(x, offset, mk, weight,
                      bias if bias is not None
                      else jnp.zeros((weight.shape[-1],), x.dtype))
        if mask is None:
            op = _vjp_wrapped_nomask(
                max_displacement, req_band, req_xtile, shared_taps, s2d,
                interpret)
            return op(x, offset, weight,
                      bias if bias is not None
                      else jnp.zeros((weight.shape[-1],), x.dtype))
        op = _vjp_wrapped(
            max_displacement, req_band, req_xtile, shared_taps, shared_mask,
            s2d, interpret)
        return op(x, offset, mask, weight,
                  bias if bias is not None
                  else jnp.zeros((weight.shape[-1],), x.dtype))

    n_bands = -(-h // band)
    n_tiles = -(-w // xtile)
    h_pad = n_bands * band - h
    w_pad = n_tiles * xtile - w
    hwin = band + 2 * halo_r
    wwin = xtile + 2 * halo_c
    wcwin = wwin * cpg
    n_cells = n_bands * n_tiles
    p_tile = band * xtile
    pad_t, pad_l = a_y + halo_r, a_x + halo_c  # plane padding incl. anchor range

    # ---- XLA-side prep (cheap elementwise/transpose work) ----
    # padded group planes with flattened (w, cpg) lanes
    if r > 1:
        # one combined transpose from the s2d layout (channel = c*r^2 +
        # ry*r + rx, c-major) straight to the padded planes
        xg = x.reshape(n, hs, ws, g, cpg, r, r).transpose(0, 3, 1, 5, 2, 6, 4)
        xg = xg.reshape(n, g, h, w, cpg)
    else:
        xg = x.reshape(n, h, w, g, cpg).transpose(0, 3, 1, 2, 4)
    xg = jnp.pad(
        xg,
        ((0, 0), (0, 0), (pad_t, pad_t + h_pad), (pad_l, pad_l + w_pad), (0, 0)),
    ).reshape(n * g, h + h_pad + 2 * pad_t, (w + w_pad + 2 * pad_l) * cpg)

    # per-axis displacement components, f32 (phases trailing when r > 1)
    off_f = offset.astype(jnp.float32)
    oy_r = off_f[..., 0, :] if r > 1 else off_f[..., 0]  # (n,h',w',g,K[,r2])
    ox_r = off_f[..., 1, :] if r > 1 else off_f[..., 1]

    if anchor:
        # quantized per-(cell, group) mean displacement -> window anchors.
        # Edge cells mean over their zero pad, which only shrinks the
        # anchor magnitude there (conservative).
        def cell_mean(a):  # (n, h', w', g) -> (n, g, n_bands, n_tiles)
            if r > 1:
                a = jnp.pad(a, ((0, 0), (0, h_pad // r), (0, w_pad // r), (0, 0)))
                a = a.reshape(n, n_bands, band // r, n_tiles, xtile // r, g)
            else:
                a = jnp.pad(a, ((0, 0), (0, h_pad), (0, w_pad), (0, 0)))
                a = a.reshape(n, n_bands, band, n_tiles, xtile, g)
            return a.mean(axis=(2, 4)).transpose(0, 3, 1, 2)

        red_axes = (4, 5) if r > 1 else (4,)
        ay_m = cell_mean(jnp.clip(oy_r, -(a_y + dl_r), a_y + dl_r).mean(red_axes))
        ax_m = cell_mean(jnp.clip(ox_r, -(a_x + dl_c), a_x + dl_c).mean(red_axes))
        ayq = jnp.clip(jnp.round(ay_m / sub_tile), -a_y // sub_tile,
                       a_y // sub_tile) * sub_tile  # (n, g, nb, nt) f32
        axq = jnp.clip(jnp.round(ax_m / lane_q), -a_x // lane_q,
                       a_x // lane_q) * lane_q

        def to_field(aq):  # (n, g, nb, nt) -> broadcastable over oy_r
            f = jnp.repeat(
                jnp.repeat(aq.transpose(0, 2, 3, 1),
                           band // r if r > 1 else band, axis=1),
                xtile // r if r > 1 else xtile, axis=2)
            f = f[:, : oy_r.shape[1], : oy_r.shape[2]]
            return f[..., None, None] if r > 1 else f[..., None]

        # the anchor cancels out of the window-local coordinates (the DMA
        # start absorbs it), so only the residual-clip sees it
        oy = jnp.clip(oy_r - to_field(ayq), -dl_r, dl_r)
        ox = jnp.clip(ox_r - to_field(axq), -dl_c, dl_c)
        # per-grid-step window (row, lane) DMA starts
        bi_v = (jnp.arange(n_cells, dtype=jnp.int32) // n_tiles) * band
        tj_v = (jnp.arange(n_cells, dtype=jnp.int32) % n_tiles) * xtile
        rows = ayq.astype(jnp.int32).reshape(n, g, n_cells) + bi_v + a_y
        lanes = (axq.astype(jnp.int32).reshape(n, g, n_cells) + tj_v + a_x) * cpg
        starts = jnp.stack([rows, lanes], axis=-1)  # (n, g, cells, 2)
        starts = starts.transpose(0, 2, 1, 3).reshape(n * n_cells * g, 2)
    else:
        oy = jnp.clip(oy_r, -dl_r, dl_r)
        ox = jnp.clip(ox_r, -dl_c, dl_c)
        bi_v = (jnp.arange(n_cells, dtype=jnp.int32) // n_tiles) * band
        tj_v = (jnp.arange(n_cells, dtype=jnp.int32) % n_tiles) * xtile * cpg
        starts = jnp.stack(
            [jnp.broadcast_to(bi_v[:, None], (n_cells, g)),
             jnp.broadcast_to(tj_v[:, None], (n_cells, g))], axis=-1)
        starts = jnp.broadcast_to(starts[None], (n, n_cells, g, 2)).reshape(
            n * n_cells * g, 2)
    if r > 1:
        # s2d grid coordinates: y = Y*r + p//r, x = X*r + p%r with the
        # phase index p on the trailing axis
        py = (jnp.arange(r * r, dtype=jnp.float32) // r).reshape(1, 1, 1, 1, 1, r * r)
        px = (jnp.arange(r * r, dtype=jnp.float32) % r).reshape(1, 1, 1, 1, 1, r * r)
        gy = jnp.arange(hs, dtype=jnp.float32).reshape(1, hs, 1, 1, 1, 1) * r + py
        gx = jnp.arange(ws, dtype=jnp.float32).reshape(1, 1, ws, 1, 1, 1) * r + px
    else:
        gy = jnp.arange(h, dtype=jnp.float32).reshape(1, h, 1, 1, 1)
        gx = jnp.arange(w, dtype=jnp.float32).reshape(1, 1, w, 1, 1)
    if shared_taps:
        # center-tap coordinates only; the kernel adds the tap shifts
        sy = gy + oy  # (n,h,w,g,1[,r2])
        sx = gx + ox
    else:
        if r > 1:
            ty = (jnp.arange(kh, dtype=jnp.float32) - pad_y).repeat(kw).reshape(1, 1, 1, 1, k2, 1)
            tx = jnp.tile(jnp.arange(kw, dtype=jnp.float32) - pad_x, kh).reshape(1, 1, 1, 1, k2, 1)
            sy = gy + ty + oy  # (n, hs, ws, g, k2, r2)
            sx = gx + tx + ox
        else:
            ty = (jnp.arange(kh, dtype=jnp.float32) - pad_y).repeat(kw).reshape(1, 1, 1, 1, k2)
            tx = jnp.tile(jnp.arange(kw, dtype=jnp.float32) - pad_x, kh).reshape(1, 1, 1, 1, k2)
            sy = gy + ty + oy  # (n, h, w, g, k2)
            sx = gx + tx + ox

    def cellwise(a):
        """(n, h, w, g, K) [or the s2d form (n, hs, ws, g, K, r^2)] ->
        (n*g, n_cells, K, P): queries on the LANE axis, fields on sublanes
        — dense in HBM for any field count (P is a multiple of 128).

        Query order within a cell: row-major for r == 1; PHASE-MINOR for
        r > 1 (p = (ys*xtile_s + xs)*r^2 + phase). The kernel's math is
        per-query order-agnostic, and keeping the s2d phase axis minor
        makes this the same fusable transpose class as the r == 1 path —
        the full-res row-major order interleaved phases and lowered to
        ~16 standalone ~0.2 ms copies per step (round-3 lv3_s2d trace)."""
        if r > 1:
            kk = a.shape[4]
            a = jnp.pad(
                a,
                ((0, 0), (0, h_pad // r), (0, w_pad // r), (0, 0), (0, 0), (0, 0)),
            )
            a = a.reshape(n, n_bands, band // r, n_tiles, xtile // r, g, kk, r * r)
            a = a.transpose(0, 5, 1, 3, 6, 2, 4, 7)
            return a.reshape(n * g, n_cells, kk, p_tile)
        kk = a.shape[-1]
        a = jnp.pad(a, ((0, 0), (0, h_pad), (0, w_pad), (0, 0), (0, 0)))
        a = a.reshape(n, n_bands, band, n_tiles, xtile, g, kk)
        return a.transpose(0, 5, 1, 3, 6, 2, 4).reshape(n * g, n_cells, kk, p_tile)

    # local window coordinates (ly = sy - (cell_row0 - halo)) computed in
    # the DENSE image layout: per-row/col base vectors broadcast over the
    # frame, so the whole elementwise chain (clip + tap + base) fuses into
    # the cellwise transpose instead of running on tile-padded
    # (..., P, few-lane) intermediates
    if r > 1:
        # y//band depends only on the s2d block row because band % r == 0
        row_base = (
            band * (jnp.arange(hs, dtype=jnp.float32) // (band // r)) - halo_r
        ).reshape(1, hs, 1, 1, 1, 1)
        col_base = (
            xtile * (jnp.arange(ws, dtype=jnp.float32) // (xtile // r)) - halo_c
        ).reshape(1, 1, ws, 1, 1, 1)
    else:
        row_base = (band * (jnp.arange(h, dtype=jnp.float32) // band) - halo_r).reshape(
            1, h, 1, 1, 1
        )
        col_base = (xtile * (jnp.arange(w, dtype=jnp.float32) // xtile) - halo_c).reshape(
            1, 1, w, 1, 1
        )
    ly = cellwise(sy - row_base)
    lx = cellwise(sx - col_base)
    if mask is None:
        # unit modulation (the plain warp): skip the mask field entirely
        qd = jnp.concatenate([ly, lx], axis=2)
        qd_lanes = 2 * k_off
    else:
        mkq = cellwise(mask.astype(jnp.float32))
        # sublanes: [ly_0..ly_{K-1} | lx_0.. | mask_0..] (K=1 when
        # shared_taps; one mask sublane when shared_mask)
        qd = jnp.concatenate([ly, lx, mkq], axis=2)
        qd_lanes = 2 * k_off + k_mask

    # weights expanded transposed onto the flat sublane axis:
    # W[g, k, o, x*cpg + ch] = weight[k, ch, o] for every window column x
    w2 = weight.reshape(k2, g, cpg, o).transpose(1, 0, 3, 2)  # (g, k2, o, cpg)
    wexp = jnp.tile(w2, (1, 1, 1, wwin)).astype(x.dtype)  # (g, k2, o, wcwin)

    geom = (
        n, g, n_cells, n_tiles, band, xtile, k2, cpg, o, hwin, wcwin,
        kh, kw, shared_taps,
        "none" if mask is None else ("shared" if shared_mask else "per_tap"),
        qd_lanes, str(jnp.dtype(x.dtype)), interpret,
    )
    if fullgrad and anchor:
        out = _core_op_anchored(geom, a_y, a_x * cpg)(starts, qd, wexp, xg)
    elif fullgrad:
        out = _core_op(geom)(qd, wexp, xg)
    else:
        out = _fwd_call(geom)(starts, qd, wexp, xg)

    if r > 1:
        # emit straight back to s2d(r) layout (channel = oc*r^2 + phase;
        # P is phase-minor, see cellwise)
        out = out.reshape(n, n_bands, n_tiles, o, band // r, xtile // r, r * r)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(
            n, n_bands * (band // r), n_tiles * (xtile // r), o * r * r
        )[:, :hs, :ws]
    else:
        out = out.reshape(n, n_bands, n_tiles, o, band, xtile)
        out = out.transpose(0, 1, 4, 2, 5, 3).reshape(
            n, n_bands * band, n_tiles * xtile, o
        )[:, :h, :w]
    if bias is not None:
        out = out + (jnp.tile(bias[:, None], (1, r * r)).reshape(-1) if r > 1 else bias)
    return out.astype(x.dtype)


def _s2d_to_logical(shared_taps, k2, r, x, offset, mask):
    """Undo the s2d(r) operand layout (linear relayouts, autodiff-safe)."""
    from crfp_tpu.ops.shuffle import pixel_shuffle

    n, hs, ws, _ = x.shape
    g = offset.shape[3]
    k_off = 1 if shared_taps else k2
    x_full = pixel_shuffle(x, r)
    # offset (n, hs, ws, g, K, 2, r^2): flattening (g, K, 2, r^2) keeps the
    # phase minor, which is exactly pixel_shuffle's c-major channel order
    off_full = pixel_shuffle(offset.reshape(n, hs, ws, -1), r)
    h, w = hs * r, ws * r
    off_full = off_full.reshape(n, h, w, g, k_off, 2)
    mask_full = None
    if mask is not None:
        km = mask.shape[4]
        mask_full = pixel_shuffle(
            mask.reshape(n, hs, ws, g * km * r * r), r
        ).reshape(n, h, w, g, km)
    return x_full, off_full, mask_full


@functools.lru_cache(maxsize=None)
def _vjp_wrapped_nomask(
    max_displacement: int, band: int, xtile: int, shared_taps: bool,
    s2d: int, interpret: bool
):
    """custom_vjp closure for the unit-mask (plain warp) case."""

    @jax.custom_vjp
    def op(x, offset, weight, bias):
        return deform_conv2d_pallas(
            x, offset, None, weight, bias,
            max_displacement=max_displacement, band=band, xtile=xtile,
            shared_taps=shared_taps, s2d=s2d, interpret=interpret,
        )

    def fwd(x, offset, weight, bias):
        return op(x, offset, weight, bias), (x, offset, weight, bias)

    def bwd(res, g_out):
        from crfp_tpu.ops.dcn_windowed import deform_conv2d_windowed
        from crfp_tpu.ops.shuffle import pixel_unshuffle

        x, offset, weight, bias = res
        k2 = weight.shape[0] * weight.shape[1]

        def f(x, offset, weight, bias):
            if s2d > 1:
                x, offset, _ = _s2d_to_logical(shared_taps, k2, s2d, x, offset, None)
            if shared_taps:
                offset = jnp.broadcast_to(offset, offset.shape[:4] + (k2, 2))
            ones = jnp.ones(offset.shape[:4] + (k2,), jnp.float32)
            out = deform_conv2d_windowed(
                x, offset, ones, weight, bias, max_displacement=max_displacement
            )
            return pixel_unshuffle(out, s2d) if s2d > 1 else out

        _, pullback = jax.vjp(f, x, offset, weight, bias)
        return pullback(g_out.astype(jnp.float32) if g_out.dtype != x.dtype else g_out)

    op.defvjp(fwd, bwd)
    return op


@functools.lru_cache(maxsize=None)
def _vjp_wrapped(
    max_displacement: int, band: int, xtile: int, shared_taps: bool,
    shared_mask: bool, s2d: int, interpret: bool
):
    """custom_vjp closure per static window config.

    Forward: the Mosaic kernel above. Backward: ``jax.vjp`` of the XLA
    interpolation-matrix formulation (crfp_tpu/ops/dcn_windowed.py) — the
    SAME math (identical clamping), whose adjoints are einsum transposes
    and windowed dynamic-slice additions, i.e. scatter-free. This makes
    the kernel trainable; a fully-Pallas backward is a later optimization.
    """

    @jax.custom_vjp
    def op(x, offset, mask, weight, bias):
        return deform_conv2d_pallas(
            x, offset, mask, weight, bias,
            max_displacement=max_displacement, band=band, xtile=xtile,
            shared_taps=shared_taps, shared_mask=shared_mask, s2d=s2d,
            interpret=interpret,
        )

    def fwd(x, offset, mask, weight, bias):
        return op(x, offset, mask, weight, bias), (x, offset, mask, weight, bias)

    def bwd(res, g_out):
        from crfp_tpu.ops.dcn_windowed import deform_conv2d_windowed
        from crfp_tpu.ops.shuffle import pixel_unshuffle

        x, offset, mask, weight, bias = res
        k2 = weight.shape[0] * weight.shape[1]

        def f(x, offset, mask, weight, bias):
            if s2d > 1:
                x, offset, mask = _s2d_to_logical(shared_taps, k2, s2d, x, offset, mask)
            if shared_taps:
                offset = jnp.broadcast_to(offset, offset.shape[:4] + (k2, 2))
            if shared_mask:
                mask = jnp.broadcast_to(mask, mask.shape[:4] + (k2,))
            out = deform_conv2d_windowed(
                x, offset, mask, weight, bias, max_displacement=max_displacement
            )
            return pixel_unshuffle(out, s2d) if s2d > 1 else out

        _, pullback = jax.vjp(f, x, offset, mask, weight, bias)
        return pullback(g_out.astype(jnp.float32) if g_out.dtype != x.dtype else g_out)

    op.defvjp(fwd, bwd)
    return op


def _anchored_effective_offsets(offset, band, xtile, sub_tile, lane_q,
                                a_y, a_x, dl_r, dl_c):
    """XLA mirror of the anchored kernel's effective sampling offsets.

    ``offset``: full-resolution logical displacements (N, H, W, G, K, 2),
    taps already broadcast. ``band``/``xtile`` must be the RESOLVED cell
    geometry of the Mosaic forward (post-quantization, post-VMEM-shrink)
    — the anchor field is a function of the cell grid, so fwd/bwd must
    agree on it exactly. Mirrors the prep in :func:`deform_conv2d_pallas`:
    per-axis clip to ±(A+dl), tap mean, zero-padded cell mean, quantize
    to the DMA grid, then anchor + clip(residual, ±dl)."""
    n, h, w, g, _, _ = offset.shape
    n_bands, n_tiles = -(-h // band), -(-w // xtile)
    h_pad, w_pad = n_bands * band - h, n_tiles * xtile - w
    off = offset.astype(jnp.float32)

    def field(comp, a, quant, dl):
        m = jnp.clip(comp, -(a + dl), a + dl).mean(axis=4)  # (n,h,w,g)
        m = jnp.pad(m, ((0, 0), (0, h_pad), (0, w_pad), (0, 0)))
        m = m.reshape(n, n_bands, band, n_tiles, xtile, g).mean(axis=(2, 4))
        q = jnp.clip(jnp.round(m / quant), -(a // quant), a // quant) * quant
        f = jnp.repeat(jnp.repeat(q, band, axis=1), xtile, axis=2)[:, :h, :w]
        return jax.lax.stop_gradient(f[..., None])  # (n,h,w,g,1)

    oy, ox = off[..., 0], off[..., 1]
    fy = field(oy, a_y, sub_tile, dl_r)
    fx = field(ox, a_x, lane_q, dl_c)
    eff_y = fy + jnp.clip(oy - fy, -dl_r, dl_r)
    eff_x = fx + jnp.clip(ox - fx, -dl_c, dl_c)
    return jnp.stack([eff_y, eff_x], axis=-1)


@functools.lru_cache(maxsize=None)
def _vjp_wrapped_anchored(
    max_displacement: int, band: int, xtile: int, sub_tile: int, lane_q: int,
    a_y: int, a_x: int, dl_r: float, dl_c: float, shared_taps: bool,
    shared_mask: bool, has_mask: bool, s2d: int, interpret: bool
):
    """Anchored custom_vjp fallback for geometries whose Pallas backward
    exceeds scoped VMEM. Forward: the Mosaic anchored kernel AT THE
    RESOLVED band/xtile (so the anchor cell grid is pinned). Backward:
    ``jax.vjp`` of the effective-offset XLA formulation — identical
    anchors and clips, evaluated by ``deform_conv2d_windowed`` at a
    widened D so its own clamp and halo are inactive.

    ``has_mask=False`` (the plain warp): the mask argument is a (0,)
    dummy; the backward differentiates a unit-mask formulation and
    returns a zero cotangent for the dummy slot."""

    @jax.custom_vjp
    def op(x, offset, mask, weight, bias):
        return deform_conv2d_pallas(
            x, offset, mask if has_mask else None, weight, bias,
            max_displacement=max_displacement, band=band, xtile=xtile,
            shared_taps=shared_taps, shared_mask=shared_mask, s2d=s2d,
            anchor=True, interpret=interpret)

    def fwd(x, offset, mask, weight, bias):
        return op(x, offset, mask, weight, bias), (x, offset, mask, weight, bias)

    def bwd(res, g_out):
        from crfp_tpu.ops.dcn_windowed import deform_conv2d_windowed
        from crfp_tpu.ops.shuffle import pixel_unshuffle

        x, offset, mask, weight, bias = res
        k2 = weight.shape[0] * weight.shape[1]
        d_wide = int(max(a_y + dl_r, a_x + dl_c)) + 1

        def f(x, offset, mask, weight, bias):
            if s2d > 1:
                x, offset, mask = _s2d_to_logical(
                    shared_taps, k2, s2d, x, offset,
                    mask if has_mask else None)
            if shared_taps:
                offset = jnp.broadcast_to(offset, offset.shape[:4] + (k2, 2))
            if has_mask and shared_mask:
                mask = jnp.broadcast_to(mask, mask.shape[:4] + (k2,))
            if not has_mask:
                mask = jnp.ones(offset.shape[:-1], jnp.float32)
            off_eff = _anchored_effective_offsets(
                offset, band, xtile, sub_tile, lane_q, a_y, a_x, dl_r, dl_c)
            out = deform_conv2d_windowed(
                x, off_eff, mask, weight, bias, max_displacement=d_wide)
            return pixel_unshuffle(out, s2d) if s2d > 1 else out

        gc = g_out.astype(jnp.float32) if g_out.dtype != x.dtype else g_out
        if has_mask:
            _, pullback = jax.vjp(f, x, offset, mask, weight, bias)
            return pullback(gc)
        _, pullback = jax.vjp(
            lambda x, o, w, b: f(x, o, None, w, b), x, offset, weight, bias)
        dx, doff, dw, db = pullback(gc)
        return dx, doff, jnp.zeros_like(mask), dw, db

    op.defvjp(fwd, bwd)
    return op


def deform_conv2d_pallas_vjp(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    *,
    max_displacement: int = 8,
    band: int = 8,
    xtile: int = 32,
    shared_taps: bool = False,
    shared_mask: bool = False,
    s2d: int = 1,
    anchor: bool = False,
    anchor_vjp: bool = False,
    backward: str = "pallas",  # 'pallas' | 'xla'
    interpret: bool = False,
) -> jax.Array:
    """Differentiable windowed DCN.

    ``backward='pallas'`` (default): the cell-level core carries a custom
    VJP whose backward is the Mosaic kernel ``_dcn_bwd_kernel`` — dx via
    per-cell window cotangents overlap-added on aligned diagonals, all
    other grads as MXU contractions. ``backward='xla'``: the round-2
    fallback (jax.vjp of the lax.map interpolation-matrix form), kept for
    cross-checking — its serialized dynamic-slice additions dominated the
    training step (docs/PERF.md round-3 trace).

    ``mask=None`` means unit modulation (the plain warp): the mask field
    is dropped from the kernel's query data and its gradient is skipped.
    ``shared_mask`` / ``s2d`` / ``anchor``: see
    :func:`deform_conv2d_pallas`.

    ``anchor=True`` alone keeps the round-3 inference contract: no VJP
    is attached (differentiating raises instead of silently using
    unanchored windows in the backward) and the geometry resolves
    WITHOUT the backward's VMEM factor — the fast deployment path.
    ``anchor_vjp=True`` makes the anchored op trainable: the custom VJP
    runs ``_dcn_bwd_kernel`` in anchored mode (window DMAs follow the
    same per-cell starts table; each cell's window cotangent lands at
    its anchored offset inside an extended block so the overlap-add
    stays scatter-free), degrading to the geometry-mirrored XLA
    effective-offset backward where the Pallas backward exceeds scoped
    VMEM. Training pays the backward-sized tile geometry in the forward
    too — keep ``anchor_vjp=False`` for pure inference.
    """
    if anchor:
        return deform_conv2d_pallas(
            x, offset, mask, weight, bias,
            max_displacement=max_displacement, band=band, xtile=xtile,
            shared_taps=shared_taps, shared_mask=shared_mask, s2d=s2d,
            anchor=True, fullgrad=anchor_vjp, interpret=interpret,
        )
    if backward == "pallas":
        return deform_conv2d_pallas(
            x, offset, mask, weight, bias,
            max_displacement=max_displacement, band=band, xtile=xtile,
            shared_taps=shared_taps, shared_mask=shared_mask, s2d=s2d,
            fullgrad=True, interpret=interpret,
        )
    if bias is None:
        bias = jnp.zeros((weight.shape[-1],), x.dtype)
    if mask is None:
        op = _vjp_wrapped_nomask(
            max_displacement, band, xtile, shared_taps, s2d, interpret)
        return op(x, offset, weight, bias)
    op = _vjp_wrapped(
        max_displacement, band, xtile, shared_taps, shared_mask, s2d, interpret)
    return op(x, offset, mask, weight, bias)


# ---------------------------------------------------------------------------
# Fused-prep variant (round 3): consume the offset/mask HEAD OUTPUTS in their
# dense conv layout and build the per-query data inside the kernel.
#
# The standard entry point above needs ~5 XLA-side passes per call to
# transpose the structured (N,H,W,G,K2,·) offset/mask fields into the
# (fields, P) query blocks — a round-3 device trace shows ~0.5 ms/frame of
# standalone copies/reshapes per 1/4-res DCN stage doing exactly that
# (docs/PERF.md "remaining levers" 2-3). Here the kernel instead reads the
# head-conv outputs DIRECTLY:
#
#   offc (N, H, W, G*K2*2) f32 — clipped displacements, channel order
#        ((g*K2 + k)*2 + {0:dy, 1:dx}) = the offset head's natural output
#        (tanh·mag + flow + clip fuse into the conv epilogue in XLA);
#   mskc (N, H, W, G*K2) f32 — sigmoid modulation, channel (g*K2 + k).
#
# and builds the per-tap window coordinates from an in-kernel row/column
# iota. Layout flips back to queries-on-SUBLANES (the round-2 layout): the
# blocks that reach HBM are all dense ((band, xtile, 144+) conv outputs and
# a (P, O) output tile), so the round-2 layout's padding tax never applies,
# while every (P, ·) intermediate lives only in VMEM.
#
# The grid runs one step per CELL with the deformable-group loop unrolled
# INSIDE the kernel, so the offset/mask blocks are fetched once per cell
# (not per group), and the expanded weights arrive as ONE constant-index
# whole block — fetched once per call, where the structured kernel's
# per-group BlockSpec re-fetches ~0.6 MB every grid step (~170 MB per lv3
# call). (A factored stage 2 — u @ Ones column sum + a tiny (P, cpg) @
# (cpg, O) contraction — was tried first to avoid the expansion entirely:
# 2x SLOWER on chip; 72 extra small matmuls per cell cost more than the
# expanded contraction saves. Measured, do not retry.)
#
# Inference-only (like ``anchor``): no VJP is attached — training uses the
# structured path above. v1 scope: non-shared taps, per-tap mask, r=1 (the
# three 1/4-res alignment stages of the runtime model).
# ---------------------------------------------------------------------------


def _dcn_kernel_fusedprep(
    starts_ref,  # (2, n*cells*g) int32 scalar prefetch: window DMA starts
                 # ((row, lane) on the LEADING axis: SMEM pads the minor
                 # dim to 128 lanes, so a (rows, 2) table costs 512 B/row
                 # and overflows the 1 MB SMEM at small-tile geometries)
    off_ref,     # (1, band, xtile, G*K2*2) f32 clipped displacements
    msk_ref,     # (1, band, xtile, G*K2) f32 modulation
    w_hbm,       # (g, k2, wcwin, o) expanded weights, HBM — DMA'd into the
                 # single-buffered wexp_s scratch ONCE at grid step 0 (a
                 # VMEM BlockSpec would double-buffer it onto Mosaic's 16M
                 # stack: measured +9.4M at the lv3 shapes; the structured
                 # kernel's per-group block instead re-fetches ~0.6 MB
                 # every grid step = ~170 MB per lv3 call)
    xg_hbm,      # (N*G, Hp, Wcp) padded source planes, HBM
    out_ref,     # (1, 1, P, o) f32 output tile (queries on sublanes)
    win_s,       # (2, hwin, wcwin) VMEM scratch, double-buffered
    sems,        # (2,) DMA semaphores
    wexp_s,      # (g, k2, wcwin, o) VMEM scratch: expanded weights
    wsem,        # scalar DMA semaphore for the weight copy
    *,
    n_groups: int,
    n_cells: int,
    band: int,
    xtile: int,
    k2: int,
    cpg: int,
    o: int,
    hwin: int,
    wcwin: int,
    halo_r: int,
    halo_c: int,
    kh: int,
    kw: int,
):
    i = pl.program_id(0)  # flat (n, cell) index
    total = pl.num_programs(0)
    p_tile = band * xtile
    g = n_groups
    sub_tile = 16 if win_s.dtype == jnp.bfloat16 else 8

    def window_dma(j, slot):  # j = flat (n, cell, group) index
        gi = j % g
        ni = j // (g * n_cells)
        return pltpu.make_async_copy(
            xg_hbm.at[
                ni * g + gi,
                pl.ds(pl.multiple_of(starts_ref[0, j], sub_tile), hwin),
                pl.ds(pl.multiple_of(starts_ref[1, j], 128), wcwin),
            ],
            win_s.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        window_dma(0, 0).start()
        # one-time blocking weight fetch; the scratch persists across the
        # whole grid
        wcopy = pltpu.make_async_copy(w_hbm, wexp_s, wsem)
        wcopy.start()
        wcopy.wait()

    # (P, fields): collapse the dense (band, xtile, F) blocks onto query
    # sublanes — band and xtile are sublane-tile multiples, so this is a
    # pure leading-dim merge (no data movement)
    qoff = off_ref[0].reshape(p_tile, 2 * k2 * g)
    qmsk = msk_ref[0].reshape(p_tile, k2 * g)

    # per-query local row/col within the cell + the window origin shift
    qiota = jax.lax.broadcasted_iota(jnp.int32, (p_tile, 1), 0)
    qy = (qiota // xtile).astype(jnp.float32) + float(halo_r)
    qx = (qiota % xtile).astype(jnp.float32) + float(halo_c)
    # (1, ·) row vectors: the compares broadcast them against the (P, 1)
    # coordinates — materializing (P, ·) iotas here doubled the measured
    # Mosaic stack peak
    riota = jax.lax.broadcasted_iota(jnp.int32, (1, hwin), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, wcwin), 1) // cpg

    cdtype = win_s.dtype
    prec = None if cdtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    acc = jnp.zeros((p_tile, o), jnp.float32)
    for gi in range(g):
        j = i * g + gi
        # prefetch the next window (next group, or the next cell's first)
        if gi + 1 < g:
            window_dma(j + 1, (j + 1) % 2).start()
        else:

            @pl.when(i + 1 < total)
            def _():
                window_dma(j + 1, (j + 1) % 2).start()

        window_dma(j, j % 2).wait()
        win = win_s[j % 2]  # (hwin, wcwin)

        for k in range(k2):
            ty = float(k // kw - (kh - 1) // 2)
            tx = float(k % kw - (kw - 1) // 2)
            base = gi * k2 + k
            ly = qy + ty + qoff[:, 2 * base : 2 * base + 1]
            lx = qx + tx + qoff[:, 2 * base + 1 : 2 * base + 2]
            mk = qmsk[:, base : base + 1]

            # stage 1 — row interpolation on the MXU: Rt (P, hwin) @ win
            y0 = jnp.floor(ly)
            fy = ly - y0
            y0i = y0.astype(jnp.int32)
            r_t = jnp.where(riota == y0i, 1.0 - fy, 0.0) + jnp.where(
                riota == y0i + 1, fy, 0.0
            )
            v = jax.lax.dot_general(
                r_t.astype(cdtype),
                win,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )  # (P, wcwin) f32

            # stage 2 — column weights + modulation, then the fused
            # column-reduce + conv-weight contraction on the MXU
            x0 = jnp.floor(lx)
            fx = lx - x0
            x0i = x0.astype(jnp.int32)
            cw = jnp.where(col == x0i, 1.0 - fx, 0.0) + jnp.where(
                col == x0i + 1, fx, 0.0
            )
            u = (v * cw * mk).astype(cdtype)
            acc = acc + jax.lax.dot_general(
                u,
                wexp_s[gi, k],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )

    out_ref[0, 0] = acc


@functools.lru_cache(maxsize=None)
def _fused_call(geom):
    """Build the fused-prep forward pallas_call for one static geometry."""
    (n, g, n_cells, n_tiles, band, xtile, k2, cpg, o, hwin, wcwin,
     halo_r, halo_c, kh, kw, dtype_str, interpret) = geom
    cdtype = jnp.dtype(dtype_str)
    p_tile = band * xtile
    kernel = functools.partial(
        _dcn_kernel_fusedprep,
        n_groups=g, n_cells=n_cells, band=band, xtile=xtile, k2=k2, cpg=cpg,
        o=o, hwin=hwin, wcwin=wcwin, halo_r=halo_r, halo_c=halo_c,
        kh=kh, kw=kw,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n * n_cells,),
        in_specs=[
            pl.BlockSpec(
                (1, band, xtile, 2 * k2 * g),
                lambda i, s: (
                    i // n_cells,
                    (i % n_cells) // n_tiles,
                    (i % n_cells) % n_tiles,
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, band, xtile, k2 * g),
                lambda i, s: (
                    i // n_cells,
                    (i % n_cells) // n_tiles,
                    (i % n_cells) % n_tiles,
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, p_tile, o),
            lambda i, s: (i // n_cells, i % n_cells, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, hwin, wcwin), cdtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((g, k2, wcwin, o), cdtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, n_cells, p_tile, o), jnp.float32),
        interpret=interpret,
    )


def deform_conv2d_pallas_fusedprep(
    x: jax.Array,
    offc: jax.Array,
    mskc: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    *,
    max_displacement: int = 8,
    band: int = 32,
    xtile: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """Windowed modulated deformable conv, fused-prep form (see the section
    comment above). Inference-only — no VJP is attached.

    Args:
      x: (N, H, W, C) source feature.
      offc: (N, H, W, G*K2*2) CLIPPED displacements, channel order
        ((g*K2 + k)*2 + {0:dy, 1:dx}); values must already satisfy
        ``|offc| <= max_displacement`` (clip in XLA — it fuses into the
        offset head's conv epilogue).
      mskc: (N, H, W, G*K2) modulation, channel (g*K2 + k).
      weight: (kh, kw, C, O); bias: (O,) | None.

    Semantics match :func:`deform_conv2d_pallas` (same geometry rules,
    same ±D clamp) up to float reassociation of the per-column sums
    (both paths accumulate in f32).
    """
    import math

    kh, kw, wc, o = weight.shape
    k2 = kh * kw
    n, h, w, c = x.shape
    assert wc == c, (weight.shape, x.shape)
    assert offc.shape[-1] % (2 * k2) == 0, (offc.shape, k2)
    g = offc.shape[-1] // (2 * k2)
    assert offc.shape == (n, h, w, g * k2 * 2), offc.shape
    assert mskc.shape == (n, h, w, g * k2), mskc.shape
    assert c % g == 0, (c, g)
    cpg = c // g
    pad_y, pad_x = (kh - 1) // 2, (kw - 1) // 2
    d = max_displacement

    def round_up(v, m):
        return -(-v // m) * m

    sub_tile = 16 if x.dtype == jnp.bfloat16 else 8
    lane_q = 128 // math.gcd(cpg, 128)
    band = round_up(band, sub_tile)
    xtile = round_up(xtile, lane_q)
    halo_r = round_up(d + pad_y + 2, sub_tile // 2)
    halo_c = round_up(d + pad_x + 2, max(1, lane_q // 2))

    # scoped-VMEM guard (same discipline as deform_conv2d_pallas). Only the
    # BODY's live tensors count against Mosaic's 16M stack — the
    # offset/mask/weight BlockSpec buffers are pipeline allocations outside
    # it. Big live values: the (P, wcwin) v/cw/u triple, the (P, hwin) Rt,
    # the (P, o) accumulator, and the double-buffered window scratch.
    item = 2 if x.dtype == jnp.bfloat16 else 4

    def vmem_est(band_e, xtile_e):
        p_est = band_e * xtile_e
        wcwin_est = (xtile_e + 2 * halo_c) * cpg
        hwin_est = band_e + 2 * halo_r
        body = (
            p_est * wcwin_est * (4 + 4 + item)       # v f32, cw f32, u
            + p_est * round_up(hwin_est, 128) * 4    # Rt
            + p_est * round_up(o, 128) * 4           # acc
        )
        # pipeline/scratch buffers land on the same scoped stack (measured:
        # a VMEM-BlockSpec'd wexp added its full double-buffered size)
        bufs = (
            2 * p_est * round_up(2 * k2 * g, 128) * 4   # offc blocks
            + 2 * p_est * round_up(k2 * g, 128) * 4     # mskc blocks
            + 2 * p_est * round_up(o, 128) * 4          # out blocks
            + 2 * hwin_est * wcwin_est * item           # window scratch
            + g * k2 * wcwin_est * round_up(o, 128) * item  # wexp scratch
        )
        # measured Mosaic stack peaks run ~2x over the body sum (the
        # per-tap compare/multiply temporaries are all counted live)
        return body * 2.0 + bufs

    while band > sub_tile and vmem_est(band, xtile) > 15_500_000:
        band -= sub_tile
    xstep = math.lcm(lane_q, 128 // math.gcd(band, 128))
    xtile = round_up(xtile, xstep)
    while xtile > xstep and vmem_est(band, xtile) > 15_500_000:
        xtile -= xstep
    if vmem_est(band, xtile) > 15_500_000:
        raise ValueError(
            "deform_conv2d_pallas_fusedprep: even the floor tile geometry "
            f"(band {band}, xtile {xtile}) exceeds the Mosaic VMEM stack at "
            f"this shape (g={g}, cpg={cpg}, o={o}, dtype={x.dtype}); use "
            "deform_conv2d_pallas (the structured path) instead")

    n_bands = -(-h // band)
    n_tiles = -(-w // xtile)
    h_pad = n_bands * band - h
    w_pad = n_tiles * xtile - w
    hwin = band + 2 * halo_r
    wwin = xtile + 2 * halo_c
    wcwin = wwin * cpg
    n_cells = n_bands * n_tiles
    p_tile = band * xtile

    # padded group planes (identical to the structured path)
    xg = x.reshape(n, h, w, g, cpg).transpose(0, 3, 1, 2, 4)
    xg = jnp.pad(
        xg,
        ((0, 0), (0, 0), (halo_r, halo_r + h_pad), (halo_c, halo_c + w_pad), (0, 0)),
    ).reshape(n * g, h + h_pad + 2 * halo_r, (w + w_pad + 2 * halo_c) * cpg)

    # dense spatial pad of the head outputs (zero displacements/modulation
    # in the pad region; those queries are cropped in the post)
    offp = jnp.pad(
        offc.astype(jnp.float32), ((0, 0), (0, h_pad), (0, w_pad), (0, 0)))
    mskp = jnp.pad(
        mskc.astype(jnp.float32), ((0, 0), (0, h_pad), (0, w_pad), (0, 0)))

    # static window-start table, (2, n*cells*g): cell-major, group-minor
    # (leading (row, lane) axis — see the kernel's starts_ref note)
    bi_v = (jnp.arange(n_cells, dtype=jnp.int32) // n_tiles) * band
    tj_v = (jnp.arange(n_cells, dtype=jnp.int32) % n_tiles) * xtile * cpg
    starts = jnp.stack(
        [jnp.broadcast_to(bi_v[None, :, None], (n, n_cells, g)).reshape(-1),
         jnp.broadcast_to(tj_v[None, :, None], (n, n_cells, g)).reshape(-1)],
        axis=0)

    # expanded group-major weights on the window-column axis:
    # W[g, k, x*cpg + c, o] = weight[k, c, o] for every window column x
    w2 = weight.reshape(k2, g, cpg, o).transpose(1, 0, 2, 3)
    wexp = jnp.tile(w2, (1, 1, wwin, 1)).astype(x.dtype)  # (g, k2, wcwin, o)

    geom = (
        n, g, n_cells, n_tiles, band, xtile, k2, cpg, o, hwin, wcwin,
        halo_r, halo_c, kh, kw, str(jnp.dtype(x.dtype)), interpret,
    )
    out = _fused_call(geom)(starts, offp, mskp, wexp, xg)

    out = out.reshape(n, n_bands, n_tiles, band, xtile, o)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, n_bands * band, n_tiles * xtile, o
    )[:, :h, :w]
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)
