"""Block-sparse-row (BSR) operators — the TPU speed-of-light matvec path.

Design, driven by measured v5e characteristics (see git history):
  * a gather costs ~2.4 ns per ROW regardless of row width (<= 512 B), so
    the way to make unstructured FEM matvecs fast is FEWER, WIDER gathers;
  * segment-sum scatter is far slower than gathers, so it may run once per
    time step (assembly) but never per matvec.

With Hilbert-ordered nodes (mesh/geometry.py reorder_spatial) grouped into blocks
of ``bu`` (velocity) / ``bp`` (pressure), each block row couples to only a
handful of neighbor blocks.  The monolithic operator becomes:

  F    (n_vb, KB, bu, bu)   per-step values (static M/dt + nu K + C(u))
  G    (n_vb, KG, dim, bu, bp)   static pressure gradient
  G^T  (n_pb, KBb, dim, bp, bu)  static continuity

and a matvec is: one block gather + one batched small matmul per block
term — no scatter, no sort.  Per-step assembly reduces the element
matrices into the F slots with a single presorted segment-sum (the
reference rebuilds its whole Trilinos matrix per step,
src/NavierStokes.cpp:154-294).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from navierstokes_tpu.fem.spaces import TaylorHoodSpace
from navierstokes_tpu.ops.assembly import CellArrays
from navierstokes_tpu.ops.operators import (Scatter, build_scatter,
                                            convection_matrices)

_static = dict(static=True)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BsrData:
    # element inputs for the per-step convection rebuild
    cell_p2: jax.Array
    detj: jax.Array
    jinv: jax.Array
    t_hat: jax.Array
    # row-blocked convection-assembly plan: one entry per
    # (cell, local row node a, extended block row) contribution, sorted by
    # destination FLAT ROW id (v*bu + i).  Each contribution gathers the
    # a-th row of the cell's element matrix (n_v values) and expands it
    # into one C-wide row of the flat row-major F layout via a one-hot
    # column-placement compare, then a presorted segment-sum of C-wide
    # rows reduces them — every minor axis is the C(=128)-lane axis.
    # Replaces the scalar take+segment_sum (8M 4-byte rows, measured
    # 149 ms/step at 1M DoF); a (cell, block-pair)x(bu,bu) variant OOM'd
    # from XLA's 8x tile padding of (n,16,16) batches, and a 36-wide
    # whole-element variant spent 31 ms in the placement product.
    con_row: jax.Array           # (ncon,) int32 source row = cell*n_v + a
    con_cpos: jax.Array          # (ncon, n_v) int8/int32 dest column
    #                              in [0,C), or -1 (dead / other row)
    con_seg: jax.Array           # (ncon,) int32 dest flat row, ascending
    # F block graph (velocity-velocity, scalar per component).  With the
    # overflow split (build_bsr f_kmax) the table has n_vb physical block
    # rows followed by virtual rows holding the spill slots of high-degree
    # rows; ovf_rows maps each virtual row back to its physical row and the
    # apply adds a small scatter-add.  Cuts the ELL padding (~40% of the
    # gather rows and value bytes at K_max=16, mean 9.5 on the 1M-DoF 2D
    # bench graph) from every matvec.
    f_cols: jax.Array            # (n_vb_ext, K) int32 block columns
    ovf_rows: object             # None | (n_vb_ext - n_vb,) int32
    diag_idx: jax.Array          # (n_p2,) int32 flat index of diagonal
    # F-family values use the FLAT ROW-MAJOR layout (n_vb_ext, bu, K*bu):
    # slot (v, k, i, j) lives at [v, i, k*bu + j].  With K*bu a multiple of
    # 128 the multiply-reduce in apply_f runs with the 128-lane axis fully
    # utilized (the (v,K,bu,bu) layout put the dim-2 vector axis minor ->
    # 2/128 lanes, measured 6.6 ms vs ~1.7 ms at 1M DoF) and the array is
    # stored without HBM tile padding — which also removes the 8x lane
    # padding that capped 3D at ~500k DoF (VALIDATION.md round 2).
    m_blk: object                # (n_vb_ext, bu, K*bu) static mass, or None
    k_blk: object                # (n_vb_ext, bu, K*bu) static stiffness/None
    # (None when the model keeps the static blocks host-side and uploads
    # only the combined A0 — halves resident F-family HBM; see
    # models/navier_stokes._build_static)
    # pressure coupling (static)
    # G/B use the same flat row-major idea as F: per-component panels with
    # the (slot, within-block-col) axes folded into the 128-multiple minor
    # With the G/B overflow split (build_bsr gb_kmax=-1) the row counts
    # are EXTENDED (physical rows + virtual spill rows); g_spill/b_spill
    # are per-PHYSICAL-row gather tables of virtual-row indices (padded
    # with the one-past-the-end dead index) so the apply folds spills
    # with a gather + tiny-axis sum instead of a scatter.  Measured fill
    # of the unsplit max-K ELL on the 305k-DoF 3D graph: G 0.44, B 0.67
    # (scripts/exp_hbm_account.py) — the split cuts the static G/B value
    # storage and per-apply HBM traffic by ~2.3x / ~1.4x.
    g_cols: jax.Array            # (n_vbg_ext, KG) int32 pressure-block cols
    g_blk: jax.Array             # (n_vbg_ext, dim, bu, KG*bp)
    b_cols: jax.Array            # (n_pb_ext, KBb) int32 velocity-block cols
    b_blk: jax.Array             # (n_pb_ext, bp, KBb*bu*dim), inner (k, j, d)
    # pressure-pressure graph (for the PCD convection operator)
    pp_cols: jax.Array           # (n_pb, KPP) int32 pressure-block columns
    pp_slot_scatter: Scatter     # (nc*n_p*n_p,) -> flat PP slots
    tp_hat: jax.Array            # P1 convection reference tensor
    cell_p1: jax.Array           # (nc, n_p) int32
    # static geometry of the blocking
    n_p2: int = dataclasses.field(metadata=_static)
    n_p1: int = dataclasses.field(metadata=_static)
    bu: int = dataclasses.field(metadata=_static)
    bp: int = dataclasses.field(metadata=_static)
    n_vb: int = dataclasses.field(metadata=_static, default=0)  # physical
    # block rows (0 => f_cols.shape[0], i.e. no overflow split)
    n_pb: int = dataclasses.field(metadata=_static, default=0)  # physical
    # pressure block rows (0 => b_cols.shape[0])
    # G/B overflow-split spill tables (see g_cols/b_cols docs above)
    g_spill: object = None       # None | (n_vb, Sg) int32
    b_spill: object = None       # None | (n_pb, Sb) int32
    # curved (boundary-snapped) cell subset for the per-step convection fix
    # (see ops/assembly.CellArrays.curv_* and operators.convection_matrices)
    curv_ids: object = None      # (k,) int32
    curv_nodes: object = None    # (k, n_v) int32
    curv_phi: object = None      # (n_cq, n_v)
    curv_dphys: object = None    # (k, n_cq, n_v, dim), w*detJ folded
    # static segment-aligned chunking of the convection segment-sum: the
    # (ncon, C) one-hot-expanded rows array is the largest per-step
    # transient (9.3 GiB at 3.39M DoF 3D — the round-5 OOM in
    # logs/st_3d1_34M_diag.log); each chunk covers a disjoint contiguous
    # destination-row range so the chunk outputs concatenate.
    # ((i0, i1, s0, s1), ...): contribution slice [i0:i1) -> rows [s0:s1)
    con_splits: tuple = dataclasses.field(metadata=_static,
                                          default=None)


def segsum_splits(seg_host, width: int, n_seg_total: int,
                  trigger_bytes: float = 4e9,
                  target_bytes: float = 1.5e9) -> tuple:
    """Static segment-aligned chunk boundaries for a presorted one-hot
    segment-sum whose (n, width) f32 rows input would exceed
    ``trigger_bytes``.  Every chunk covers a disjoint contiguous range of
    destination segments (boundaries advance to the next segment change),
    so chunk outputs concatenate with no cross-chunk accumulation.
    Returns ((i0, i1, s0, s1), ...)."""
    seg_host = np.asarray(seg_host)
    n = len(seg_host)
    bytes_full = n * width * 4
    if bytes_full <= trigger_bytes:
        return ((0, n, 0, n_seg_total),)
    k = int(np.ceil(bytes_full / target_bytes))
    splits = []
    i0, s0 = 0, 0
    for j in range(1, k):
        tgt = n * j // k
        while tgt < n and seg_host[tgt] == seg_host[tgt - 1]:
            tgt += 1
        if tgt >= n or tgt <= i0:
            continue
        s_here = int(seg_host[tgt])
        splits.append((i0, tgt, s0, s_here))
        i0, s0 = tgt, s_here
    splits.append((i0, n, s0, n_seg_total))
    return tuple(splits)


def onehot_segsum(c6, con_row, cpos, seg, width: int, splits, dt_):
    """rows[n, c] = sum_b c6[con_row[n], b] * (cpos[n, b] == c), reduced by
    the presorted ``seg`` — in one pass, or chunked per ``splits`` (each
    chunk emits its own disjoint destination-row range)."""
    io = jnp.arange(width, dtype=jnp.int32)
    outs = []
    for (i0, i1, s0, s1) in splits:
        ce = jnp.take(c6, con_row[i0:i1], axis=0, mode="clip")
        W = cpos[i0:i1, :, None].astype(jnp.int32) == io
        rows = (ce[:, :, None] * W.astype(dt_)).sum(1)
        outs.append(jax.ops.segment_sum(
            rows, seg[i0:i1] - s0, num_segments=s1 - s0,
            indices_are_sorted=True))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def _block_pairs(rows, cols, bu, bv, n_rb):
    """Unique (row_block, col_block) pairs -> ELL table + slot lookup.

    Returns (cols_table (n_rb, K), K, pair_key_sorted, row_of_pair,
    k_of_pair) where pair lookups use searchsorted on pair_key_sorted."""
    RI = rows // bu
    CJ = cols // bv
    stride = np.int64(CJ.max() + 2 if len(CJ) else 2)
    key = RI.astype(np.int64) * stride + CJ
    order = np.argsort(key, kind="stable")
    ks = key[order]
    first = np.ones(len(ks), dtype=bool)
    first[1:] = ks[1:] != ks[:-1]
    uk = ks[first]
    ru = (uk // stride).astype(np.int64)
    cu = (uk % stride).astype(np.int64)
    counts = np.bincount(ru, minlength=n_rb)
    K = max(1, int(counts.max()) if len(counts) else 1)
    table = np.zeros((n_rb, K), dtype=np.int64)
    row_start = np.zeros(n_rb + 1, dtype=np.int64)
    np.cumsum(counts, out=row_start[1:])
    k_of = np.arange(len(ru)) - row_start[ru]
    table[ru, k_of] = cu
    return table, K, uk, ru, k_of, stride


def _split_overflow(pr_row, k_of, cols_of_pair, n_rb, k_step, rup):
    """Overflow split of a block-ELL graph (the F-graph trick, reusable).

    Rows with more than K0 column slots spill the excess into virtual
    rows appended after the physical ones; K0 is chosen among multiples
    of ``k_step`` (keeps the flat value minor axis 128-lane aligned) to
    minimize total extended storage (n_rb + n_virt) * K0.  Unlike the F
    split (which scatter-folds), the returned ``spill`` table maps each
    PHYSICAL row to its virtual rows (dead entries = n_ext, one past the
    end) so applies fold with a gather + short-axis sum.

    Returns (vrow (n_pairs,), kext (n_pairs,), cols (n_ext, K0),
    spill (n_rb, S) | None, n_ext, K0)."""
    counts = np.bincount(pr_row, minlength=n_rb)
    kmax = max(1, int(counts.max()) if len(counts) else 1)
    cands = list(range(k_step, kmax + k_step, k_step))

    def _cost(k0):
        spillc = np.maximum(counts - k0, 0)
        return (n_rb + int(np.ceil(spillc / k0).sum())) * k0

    K0 = min(cands, key=_cost)
    over = k_of >= K0
    if not over.any():
        cols = np.zeros((n_rb, K0), dtype=np.int64)
        cols[pr_row, k_of] = cols_of_pair
        return pr_row, k_of, cols, None, n_rb, K0
    chunk = (k_of[over] - K0) // K0                 # spill chunk per pair
    vkey = pr_row[over].astype(np.int64) * 64 + chunk   # chunk < 64 always
    uniq, vinv = np.unique(vkey, return_inverse=True)
    n_or = rup(len(uniq))
    n_ext = n_rb + n_or
    vrow = np.where(over, 0, pr_row).astype(np.int64)
    vrow[over] = n_rb + vinv
    kext = np.where(over, (k_of - K0) % K0, k_of)
    cols = np.zeros((n_ext, K0), dtype=np.int64)
    cols[vrow, kext] = cols_of_pair
    rows_u = (uniq // 64).astype(np.int64)
    counts_u = np.bincount(rows_u, minlength=n_rb)
    S = int(counts_u.max())
    first = np.zeros(n_rb + 1, dtype=np.int64)
    np.cumsum(counts_u, out=first[1:])
    within = np.arange(len(uniq)) - first[rows_u]
    spill = np.full((n_rb, S), n_ext, dtype=np.int64)
    spill[rows_u, within] = n_rb + np.arange(len(uniq))
    return vrow, kext, cols, spill, n_ext, K0


def _fold_spills(spill, y, n_phys):
    """Fold virtual-row partial sums into their physical rows via the
    per-physical-row spill gather table.  y: (n_ext, ...) ->
    (n_phys, ...).  Dead table entries point one past the end of y; the
    appended zero row makes them no-ops (mode='clip' then hits it)."""
    if spill is None:
        return y
    yz = jnp.concatenate([y, jnp.zeros_like(y[:1])], axis=0)
    return y[:n_phys] + jnp.take(yz, spill, axis=0, mode="clip").sum(axis=1)


def build_bsr(space: TaylorHoodSpace, cells: CellArrays, dtype=jnp.float32,
              bu: int | None = None, bp: int | None = None,
              row_multiple: int = 1,
              static_device: bool = True,
              f_kmax: int = 0, gb_kmax: int = 0) -> BsrData:
    """Host construction.  ``cells`` = numpy CellArrays
    (assembly.cell_arrays_numpy).

    ``row_multiple``: round the block-row counts (and the cell count) up to
    a multiple — required for even device_put sharding over an N-device
    mesh (models/navier_stokes._apply_gspmd_sharding).  Padding block rows
    have zero values and column 0; padding cells have zero detj/jinv and
    scatter into a dead slot, so they contribute nothing."""
    dim = space.dim
    # default 16: the isolated F matvec is gather-ROW-count bound
    # (~2.4 ns/row on v5e) and prefers 32-wide blocks (2.1-2.2x at the
    # probe points, scripts/exp_gather_probe.py), but END-TO-END the
    # projection step measures FASTER at 16 (1.896 vs 1.811 steps/s at
    # the 1M-DoF 2D bench) — the 1.5x larger value stream at 32 taxes the
    # per-step convection scatter and the block-Jacobi rebuild more than
    # the matvec saves.  (8 in 3D lane-pads 16x under TPU tiling: OOM.)
    bu = bu or 16
    bp = bp or bu
    n_p2, n_p1 = space.n_p2, space.n_p1
    cp2 = np.asarray(space.cell_p2, dtype=np.int64)
    cp1 = np.asarray(space.cell_p1, dtype=np.int64)
    nc, nv = cp2.shape
    npp = cp1.shape[1]
    rup = lambda n: -(-n // row_multiple) * row_multiple
    nc_pad = rup(nc) - nc
    n_vb = rup(-(-n_p2 // bu))
    n_pb = rup(-(-n_p1 // bp))

    # ---- F block graph ----------------------------------------------------
    rows = np.repeat(cp2, nv, axis=1).reshape(-1)
    cols = np.tile(cp2, (1, nv)).reshape(-1)
    f_cols, KB, pair_keys, pr_row, k_of_pair, stride = _block_pairs(
        rows, cols, bu, bu, n_vb)

    # Re-order each block-row's slots diagonal-first (then ascending), so
    # the diagonal always stays in the physical table under the overflow
    # split below and f_diag needs no special casing.
    pc = (pair_keys % stride).astype(np.int64)
    is_diag = pc == pr_row
    diag_pos = np.zeros(n_vb, np.int64)
    diag_pos[pr_row[is_diag]] = k_of_pair[is_diag]
    kn = np.where(is_diag, 0,
                  np.where(k_of_pair < diag_pos[pr_row],
                           k_of_pair + 1, k_of_pair))

    # Overflow split: slots kn >= K0 spill to virtual block rows (one per
    # (row, chunk-of-K0) with spill), appended after the physical rows.
    if f_kmax == -1:
        # auto: K0 must keep the flat row-major minor axis K0*bu a
        # multiple of the 128-lane tile (no HBM padding, full-lane
        # reduce); among those candidates pick minimal total storage
        # n_ext(K0) * K0.
        counts = np.bincount(pr_row, minlength=n_vb)
        step_k = max(1, 128 // bu)
        cands = list(range(step_k, KB + step_k, step_k))
        def _cost(k0):
            spill = np.maximum(counts - k0, 0)
            n_virt = int(np.ceil(spill / k0).sum())
            return (n_vb + n_virt) * k0
        f_kmax = min(cands, key=_cost)
    # f_kmax > KB means "pad K up" (lane alignment without a split):
    # the extra slots are ordinary zero-valued ELL padding.
    K0 = f_kmax if f_kmax > 0 else KB
    over = kn >= K0
    ovf_rows_host = np.zeros(0, np.int64)
    # TILE: round the extended row count so n_vb_ext is a multiple of the
    # Pallas matvec row-tile (ops/pallas_matvec.ROW_TILE).  Padding rows
    # ride the overflow mechanism: zero values, scatter-add into physical
    # row 0 (a no-op).  Cost <= 63 zero block rows.
    TILE = 64
    if over.any():
        chunk = (kn[over] - K0) // K0
        vkey = pr_row[over] * 64 + chunk            # chunk < 64 always
        uniq, vinv = np.unique(vkey, return_inverse=True)
        n_or = rup(len(uniq))
        n_or += (-(n_vb + n_or)) % TILE
        ovf_rows_host = np.zeros(n_or, np.int64)    # pad rows scatter to 0
        ovf_rows_host[:len(uniq)] = uniq // 64
        vrow_pair = np.where(over, 0, pr_row)       # placeholder
        vrow_pair[over] = n_vb + vinv
        kext_pair = np.where(over, (kn - K0) % K0, kn)
    else:
        n_or = (-n_vb) % TILE
        ovf_rows_host = np.zeros(n_or, np.int64)
        vrow_pair = pr_row
        kext_pair = kn
    n_vb_ext = n_vb + n_or
    f_cols = np.zeros((n_vb_ext, K0), dtype=np.int64)
    f_cols[vrow_pair, kext_pair] = pc

    # per element-matrix entry: flat slot in the extended value array,
    # flat row-major layout (v, i, k*bu + j)
    want = (rows // bu).astype(np.int64) * stride + (cols // bu)
    pos = np.searchsorted(pair_keys, want)
    slot = ((vrow_pair[pos] * bu + rows % bu) * K0
            + kext_pair[pos]) * bu + (cols % bu)

    n_slots = n_vb_ext * K0 * bu * bu

    # ---- row-blocked convection-assembly plan ----------------------------
    # one contribution per unique (cell, local row node, extended block
    # row); see BsrData.con_* docs
    Cw = K0 * bu
    e_cell = np.repeat(np.arange(nc, dtype=np.int64), nv * nv)
    e_a = np.tile(np.repeat(np.arange(nv, dtype=np.int64), nv), nc)
    e_b = np.tile(np.arange(nv, dtype=np.int64), nc * nv)
    e_v = vrow_pair[pos]
    e_q = kext_pair[pos] * bu + (cols % bu)
    e_fr = e_v * bu + (rows % bu)
    ckey = (e_cell * nv + e_a) * np.int64(n_vb_ext) + e_v
    uniq_ck, idx0, inv_ck = np.unique(ckey, return_index=True,
                                      return_inverse=True)
    con_fr = e_fr[idx0]
    con_row = (e_cell * nv + e_a)[idx0]
    corder = np.argsort(con_fr, kind="stable")
    rank = np.empty(len(uniq_ck), np.int64)
    rank[corder] = np.arange(len(uniq_ck))
    con_fr, con_row = con_fr[corder], con_row[corder]
    con_cpos = np.full((len(uniq_ck), nv), -1, np.int64)
    con_cpos[rank[inv_ck], e_b] = e_q
    ncon = rup(len(con_row))
    if ncon > len(con_row):
        padn = ncon - len(con_row)
        con_row = np.concatenate([con_row, np.zeros(padn, np.int64)])
        con_cpos = np.concatenate(
            [con_cpos, np.full((padn, nv), -1, np.int64)])
        con_fr = np.concatenate(
            [con_fr, np.full(padn, n_vb_ext * bu - 1, np.int64)])
    cpos_dtype = np.int8 if Cw <= 128 else np.int32
    con_splits = segsum_splits(con_fr, Cw, n_vb_ext * bu)

    def reduce_blk(elem_vals):
        out = np.zeros(n_slots)
        np.add.at(out, slot, elem_vals.reshape(-1))
        return out.reshape(n_vb_ext, bu, K0 * bu)

    m_blk = reduce_blk(np.asarray(cells.mass, np.float64))
    k_blk = reduce_blk(np.asarray(cells.stiff, np.float64))

    # diagonal flat index per node (diag-first ordering => slot 0, but
    # computed generically through the pair lookup)
    i_all = np.arange(n_p2, dtype=np.int64)
    Iall = i_all // bu
    want_d = Iall * stride + Iall
    pos_d = np.searchsorted(pair_keys, want_d)
    # diagonal block must exist (every node couples to itself)
    diag_idx = ((vrow_pair[pos_d] * bu + i_all % bu) * K0
                + kext_pair[pos_d]) * bu + (i_all % bu)

    # ---- G (u rows, p cols), static ----------------------------------------
    grad = np.asarray(cells.grad, np.float64)            # (nc, nv, dim, npp)
    g_rows = np.repeat(cp2, npp, axis=1).reshape(-1)
    g_cols_flat = np.tile(cp1, (1, nv)).reshape(-1)
    g_tab, KG, gkeys, g_ru, gk_of, gstride = _block_pairs(
        g_rows, g_cols_flat, bu, bp, n_vb)
    g_tab_full = g_tab        # physical (unsplit) table, for host consumers
    g_spill = None
    n_vbg = n_vb
    if gb_kmax == -1:
        g_vrow, g_kext, g_tab, g_spill, n_vbg, KG = _split_overflow(
            g_ru, gk_of, (gkeys % gstride).astype(np.int64), n_vb,
            128 // math.gcd(128, bp), rup)
    else:
        g_vrow, g_kext = g_ru, gk_of
    gwant = (g_rows // bu).astype(np.int64) * gstride + (g_cols_flat // bp)
    gpos = np.searchsorted(gkeys, gwant)
    gkb = g_kext[gpos]
    GI = g_vrow[gpos]
    # slot layout: (n_vbg, dim, bu, KG*bp) — flat row-major per component
    g_vals = np.zeros(n_vbg * KG * dim * bu * bp)
    vals = grad.transpose(0, 1, 3, 2).reshape(-1, dim)   # (nc*nv*npp, dim)
    for d in range(dim):
        gslot = (((GI * dim + d) * bu + g_rows % bu) * KG + gkb) * bp \
                + (g_cols_flat % bp)
        np.add.at(g_vals, gslot, vals[:, d])
    g_blk = g_vals.reshape(n_vbg, dim, bu, KG * bp)
    g_cols = g_tab

    # ---- B (p rows, u cols), static ----------------------------------------
    b_rows = np.repeat(cp1, nv, axis=1).reshape(-1)
    b_cols_flat = np.tile(cp2, (1, npp)).reshape(-1)
    b_tab, KBb, bkeys, b_ru, bk_of, bstride = _block_pairs(
        b_rows, b_cols_flat, bp, bu, n_pb)
    b_spill = None
    n_pbe = n_pb
    if gb_kmax == -1:
        b_vrow, b_kext, b_tab, b_spill, n_pbe, KBb = _split_overflow(
            b_ru, bk_of, (bkeys % bstride).astype(np.int64), n_pb,
            128 // math.gcd(128, bu * dim), rup)
    else:
        b_vrow, b_kext = b_ru, bk_of
    bwant = (b_rows // bp).astype(np.int64) * bstride + (b_cols_flat // bu)
    bpos = np.searchsorted(bkeys, bwant)
    bkb = b_kext[bpos]
    BI = b_vrow[bpos]
    # slot layout: (n_pbe, bp, KBb*bu*dim) with inner (k, j, d) — matches
    # the natural (k, j, d) order of the gathered velocity blocks
    b_vals = np.zeros(n_pbe * KBb * dim * bp * bu)
    bsrc = grad.transpose(0, 3, 1, 2).reshape(-1, dim)   # (nc*npp*nv, dim)
    for d in range(dim):
        bslot = ((((BI * bp + b_rows % bp) * KBb + bkb) * bu
                  + b_cols_flat % bu) * dim) + d
        np.add.at(b_vals, bslot, bsrc[:, d])
    b_blk = b_vals.reshape(n_pbe, bp, KBb * bu * dim)
    b_cols = b_tab

    # ---- P1-P1 pressure graph (PCD convection), per-step values ----------
    p_rows = np.repeat(cp1, npp, axis=1).reshape(-1)
    p_cols_flat = np.tile(cp1, (1, npp)).reshape(-1)
    pp_cols, KPP, pkeys, _, pk_of, pstride = _block_pairs(
        p_rows, p_cols_flat, bp, bp, n_pb)
    pwant = (p_rows // bp).astype(np.int64) * pstride + (p_cols_flat // bp)
    ppos = np.searchsorted(pkeys, pwant)
    pkb = pk_of[ppos]
    PI = p_rows // bp
    pp_slot = ((PI * KPP + pkb) * bp + p_rows % bp) * bp + (p_cols_flat % bp)
    pp_slot_all = pp_slot.astype(np.int64)
    n_pp_slots = n_pb * KPP * bp * bp
    if nc_pad:
        pp_slot_all = np.concatenate(
            [pp_slot_all,
             np.full(nc_pad * npp * npp, n_pp_slots - 1, np.int64)])
    pp_plan = build_scatter(pp_slot_all.reshape(-1, 1), n_pp_slots)

    def pad_cells(a, n_extra):
        a = np.asarray(a)
        if not n_extra:
            return a
        return np.concatenate(
            [a, np.zeros((n_extra,) + a.shape[1:], a.dtype)], axis=0)

    f = lambda x: jnp.asarray(x, dtype)
    from navierstokes_tpu.ops.assembly import curved_conv_inputs
    ci, cn, cphi, cdphys = curved_conv_inputs(space)
    out = BsrData(
        curv_ids=None if ci is None else jnp.asarray(ci),
        curv_nodes=None if ci is None else jnp.asarray(cn),
        curv_phi=None if ci is None else f(cphi),
        curv_dphys=None if ci is None else f(cdphys),
        cell_p2=jnp.asarray(pad_cells(space.cell_p2, nc_pad)),
        detj=f(pad_cells(cells.detj, nc_pad)),
        jinv=f(pad_cells(cells.jinv, nc_pad)),
        t_hat=f(space.rs.T_hat),
        con_row=jnp.asarray(con_row.astype(np.int32)),
        con_cpos=jnp.asarray(con_cpos.astype(cpos_dtype)),
        con_seg=jnp.asarray(con_fr.astype(np.int32)),
        con_splits=con_splits,
        f_cols=jnp.asarray(f_cols.astype(np.int32)),
        ovf_rows=(jnp.asarray(ovf_rows_host.astype(np.int32))
                  if n_or else None),
        diag_idx=jnp.asarray(diag_idx.astype(np.int32)),
        m_blk=f(m_blk) if static_device else None,
        k_blk=f(k_blk) if static_device else None,
        g_cols=jnp.asarray(g_cols.astype(np.int32)), g_blk=f(g_blk),
        b_cols=jnp.asarray(b_cols.astype(np.int32)), b_blk=f(b_blk),
        g_spill=(jnp.asarray(g_spill.astype(np.int32))
                 if g_spill is not None else None),
        b_spill=(jnp.asarray(b_spill.astype(np.int32))
                 if b_spill is not None else None),
        pp_cols=jnp.asarray(pp_cols.astype(np.int32)),
        pp_slot_scatter=pp_plan,
        tp_hat=f(space.rs.Tp_hat),
        cell_p1=jnp.asarray(pad_cells(space.cell_p1, nc_pad)),
        n_p2=n_p2, n_p1=n_p1, bu=bu, bp=bp, n_vb=n_vb, n_pb=n_pb,
    )
    # Host copies of the graph tables, used by setup-time consumers
    # (coarse plan, block-Jacobi plan).  Pulling these back off the device
    # costs ~80 s EACH over a tunneled TPU; plain attributes (not pytree
    # fields) so they exist only on the freshly-built instance.
    out.host_f_cols = f_cols.astype(np.int64)
    out.host_ovf_rows = ovf_rows_host
    # always the PHYSICAL (unsplit) G table — the Schur coarse plan
    # contracts G block PAIRS within whole rows (solvers/schur.py)
    out.host_g_cols = g_tab_full.astype(np.int64)
    out.host_m_blk = m_blk
    out.host_k_blk = k_blk
    return out


# ---------------------------------------------------------------------------
# applies
# ---------------------------------------------------------------------------


def _n_vb_phys(bsr: BsrData) -> int:
    return bsr.n_vb or bsr.f_cols.shape[0]


def _ublocks(bsr: BsrData, xu):
    n_vb = _n_vb_phys(bsr)
    pad = n_vb * bsr.bu - bsr.n_p2
    xp_ = jnp.pad(xu, ((0, pad), (0, 0)))
    return xp_.reshape(n_vb, bsr.bu, -1)


def _fold_overflow(bsr: BsrData, y):
    """Add virtual-row partial sums back into their physical block rows.
    y: (n_vb_ext, bu, d) -> (n_vb, bu, d)."""
    if bsr.ovf_rows is None:
        return y
    n_vb = _n_vb_phys(bsr)
    return y[:n_vb].at[bsr.ovf_rows].add(y[n_vb:])


def _n_pb_phys(bsr: BsrData) -> int:
    return bsr.n_pb or bsr.b_cols.shape[0]


def _pblocks(bsr: BsrData, p):
    n_pb = _n_pb_phys(bsr)
    pad = n_pb * bsr.bp - bsr.n_p1
    return jnp.pad(p, (0, pad)).reshape(n_pb, bsr.bp)


def apply_f(bsr: BsrData, f_blk, xu):
    """F matvec with flat row-major values: full-lane VPU multiply-reduce.

    f_blk: (n_vb_ext, bu, C) with C = K*bu (a multiple of 128 when
    build_bsr's auto f_kmax is used).  The reduce's minor axis is C, so
    the VPU streams the values at full 128-lane width; the velocity
    components live on the (tiny) broadcast axis instead of the lanes.
    XLA lowers the naive block einsum as a huge batch of (bu,bu)x(bu,dim)
    MXU matmuls, padding dim->128 (64x waste); earlier layouts that kept
    dim or bu minor measured 6.6 ms/matvec at 1M DoF vs ~2 ms for this
    one (scripts/profile_bench.py, scripts/exp_flatmv*.py)."""
    n_ext, bu, C = f_blk.shape
    d = xu.shape[1]
    xb = _ublocks(bsr, xu)
    ys = []
    for dd in range(d):
        # per-component gather (A/B'd against one (…, bu, d) gather +
        # minor transpose, per-component strided slices, and an MXU
        # batched dot: 5.2 / 7.1 / 7.6 / 5.6 ms at 1M DoF)
        xg = jnp.take(xb[..., dd], bsr.f_cols, axis=0,
                      mode="clip").reshape(n_ext, C)
        if f_blk.dtype == jnp.bfloat16:
            # mixed precision: bf16 value reads (the dominant HBM
            # traffic), fp32 accumulation
            prod = f_blk * xg.astype(jnp.bfloat16)[:, None, :]
            ys.append(prod.astype(jnp.float32).sum(-1))
        else:
            ys.append((f_blk * xg[:, None, :]).sum(-1)) # (n_vb_ext, bu)
    y = jnp.stack(ys, axis=-1)                          # (n_vb_ext, bu, d)
    y = _fold_overflow(bsr, y)
    return y.reshape(-1, d)[:bsr.n_p2].astype(xu.dtype)


def apply_bt(bsr: BsrData, p):
    pb = _pblocks(bsr, p)
    n_ext = bsr.g_cols.shape[0]
    pg = jnp.take(pb, bsr.g_cols, axis=0, mode="clip").reshape(n_ext, -1)
    g = bsr.g_blk                                       # (n_ext,dim,bu,KG*bp)
    if g.dtype == jnp.bfloat16:
        prod = g * pg.astype(jnp.bfloat16)[:, None, None, :]
        y = prod.astype(jnp.float32).sum(-1)            # (n_ext, dim, bu)
        y = y.astype(p.dtype)
    else:
        y = (g * pg[:, None, None, :]).sum(-1)
    y = _fold_spills(bsr.g_spill, y, _n_vb_phys(bsr))
    y = jnp.swapaxes(y, 1, 2)                           # (n_vb, bu, dim)
    return y.reshape(-1, y.shape[2])[:bsr.n_p2]


def apply_b(bsr: BsrData, xu):
    ub = _ublocks(bsr, xu)
    n_ext = bsr.b_cols.shape[0]
    # natural gathered order (k, j, d) matches the stored inner order
    ug = jnp.take(ub, bsr.b_cols, axis=0, mode="clip").reshape(n_ext, -1)
    b = bsr.b_blk                                       # (n_ext,bp,KBb*bu*dim)
    if b.dtype == jnp.bfloat16:
        prod = b * ug.astype(jnp.bfloat16)[:, None, :]
        z = prod.astype(jnp.float32).sum(-1).astype(xu.dtype)
    else:
        z = (b * ug[:, None, :]).sum(-1)                # (n_ext, bp)
    z = _fold_spills(bsr.b_spill, z, _n_pb_phys(bsr))
    return z.reshape(-1)[:bsr.n_p1]


def f_diag(bsr: BsrData, f_blk):
    return jnp.take(f_blk.reshape(-1), bsr.diag_idx, mode="clip")


def mass_apply(bsr: BsrData, u):
    assert bsr.m_blk is not None, \
        "mass blocks are host-only; use the model's mass_ell path"
    return apply_f(bsr, bsr.m_blk, u)


def schur_diag(bsr: BsrData, node_weights):
    wb = _ublocks(bsr, node_weights[:, None])[..., 0]   # (n_vb, bu)
    n_ext = bsr.b_cols.shape[0]
    wg = jnp.take(wb, bsr.b_cols, axis=0, mode="clip")  # (n_ext, KBb, bu)
    dim = bsr.b_blk.shape[2] // (bsr.b_cols.shape[1] * bsr.bu)
    wgf = jnp.broadcast_to(wg[..., None],
                           wg.shape + (dim,)).reshape(n_ext, -1)
    z = (bsr.b_blk * bsr.b_blk * wgf[:, None, :]).sum(-1)
    z = _fold_spills(bsr.b_spill, z, _n_pb_phys(bsr))
    return z.reshape(-1)[:bsr.n_p1]


def g_blocks(bsr: BsrData):
    """View the flat G values as (n_vb, KG, dim, bu, bp) blocks
    (setup-time consumers only — the apply path reads the flat form)."""
    assert bsr.g_spill is None, (
        "g_blocks needs whole-row G tables; build with gb_kmax=0 "
        "(the Schur coarse plan contracts G pairs within rows)")
    n_vb, KG = bsr.g_cols.shape
    dim = bsr.g_blk.shape[1]
    return bsr.g_blk.reshape(n_vb, dim, bsr.bu, KG, bsr.bp).transpose(
        0, 3, 1, 2, 4)


def pressure_convection_blk(bsr: BsrData, u):
    """Per-step pressure-space convection N_p(u) in blocked form:
    (n_pb, KPP, bp, bp).  np_ij = int psi_i (u . grad psi_j) — the moving
    part of the PCD preconditioner's Fp operator."""
    u_c = jnp.take(u, bsr.cell_p2, axis=0, mode="clip")              # (nc, n_v, dim)
    w = jnp.einsum("cxd,ced->cxe", bsr.jinv, u_c) * bsr.detj[:, None, None]
    np_elem = jnp.einsum("ijxe,cxe->cij", bsr.tp_hat, w)
    vals = bsr.pp_slot_scatter(np_elem.reshape(-1, 1))
    n_pb, KPP = bsr.pp_cols.shape
    return vals.reshape(n_pb, KPP, bsr.bp, bsr.bp)


def apply_pp(bsr: BsrData, pp_blk, xp):
    """Pressure-graph matvec: (n_p1,) -> (n_p1,)."""
    pb = _pblocks(bsr, xp)
    pg = jnp.take(pb, bsr.pp_cols, axis=0, mode="clip")              # (n_pb, KPP, bp)
    if pp_blk.dtype == jnp.bfloat16:
        prod = pp_blk * pg.astype(jnp.bfloat16)[:, :, None, :]
        z = prod.astype(jnp.float32).sum(axis=(1, 3)).astype(xp.dtype)
    else:
        z = (pp_blk * pg[:, :, None, :]).sum(axis=(1, 3))
    return z.reshape(-1)[:bsr.n_p1]


def convection_blk(bsr: BsrData, u):
    """Per-step convection assembly into the flat row-major F layout.

    Each (cell, block-pair) contribution places its element matrix rows
    and columns into a dense (bu, bu) block via two one-hot batched
    matmuls (MXU), then a presorted segment-sum over (bu*bu)-wide rows
    reduces contributions per pair.  The element matrices themselves are
    the reference's T1 convection integrand (src/NavierStokes.cpp:204-208)
    rebuilt every time step, like the reference's per-step reassembly
    (src/NavierStokes.cpp:154-294) but without touching the static part."""
    c_elem = convection_matrices(bsr, bsr.t_hat, u)     # (nc, nv, nv)
    bu = bsr.bu
    dt_ = c_elem.dtype
    nc, nv, _ = c_elem.shape
    n_vb_ext, K0 = bsr.f_cols.shape
    Cw = K0 * bu
    c6 = c_elem.reshape(nc * nv, nv)
    splits = bsr.con_splits or ((0, bsr.con_row.shape[0], 0,
                                 n_vb_ext * bu),)
    vals = onehot_segsum(c6, bsr.con_row, bsr.con_cpos, bsr.con_seg,
                         Cw, splits, dt_)
    return vals.reshape(n_vb_ext, bu, Cw)


class BsrOps:
    """Ops-interface implementation over BsrData (models/navier_stokes).

    ``f_matvec="pallas"`` routes the F apply through the fused
    multi-component Pallas kernel (ops/pallas_matvec.py) — one HBM pass
    over the values for all velocity components instead of one per
    component."""

    def __init__(self, f_matvec: str = "xla"):
        self.f_matvec = f_matvec

    def _apply_f(self, bsr, f_blk, xu):
        if self.f_matvec == "pallas":
            from navierstokes_tpu.ops.pallas_matvec import apply_f_fused
            return apply_f_fused(bsr, f_blk, xu)
        return apply_f(bsr, f_blk, xu)

    def convection(self, params, u):
        return convection_blk(params.cells, u)

    def apply_blocks(self, params, f_blk, xu, xp, with_f=True, with_g=True,
                     with_gt=True):
        bsr = params.cells
        yu = None
        if with_f:
            yu = self._apply_f(bsr, f_blk, xu)
        if with_g:
            g = apply_bt(bsr, xp)
            yu = g if yu is None else yu + g
        if yu is None:
            yu = jnp.zeros_like(xu)
        yp = apply_b(bsr, xu) if with_gt else jnp.zeros_like(xp)
        # layout pin (see ops/operators.py): anchor loop-carried outputs to
        # the input layout so XLA's layout assignment terminates quickly
        return yu + 0.0 * xu, yp + 0.0 * xp

    def f_diag(self, params, f_blk):
        return f_diag(params.cells, f_blk)

    def mass_apply(self, params, u):
        if params.cells.m_blk is None:
            from navierstokes_tpu.ops.p1ell import node_mass_apply
            return node_mass_apply(params.mass_ell, u)
        return self._apply_f(params.cells, params.cells.m_blk, u)

    def schur_diag(self, params, node_weights):
        return schur_diag(params.cells, node_weights)
