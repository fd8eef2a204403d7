"""Pallas TPU kernel for ICM bank scoring — the speed-of-light walk.

The reference scores one base at a time with a data-dependent tree walk
(``ICM_t::Full_Window_Prob``, reference src/ICM/icm.cc:557-610). XLA lowers
the walk's gathers to effectively scalar code (~130M gathers/s measured),
and a first MXU one-hot-matmul formulation of the lookups was VPU-layout
bound: per-position state shaped (E, 1) uses 1 of 128 lanes.

This kernel keeps every per-position value in a dense (S, 128) layout —
all 128 lanes live — and resolves every table lookup with Mosaic's
lane-wise dynamic gather (``jnp.take_along_axis(table_row, idx, axis=1)``):

  * Walk step k reads ``mut_info_pos`` only for nodes at tree level k, so
    the lookup table for step k is just the level-k slice of the tree
    (4^k entries). Levels 0..3 fit in ONE 128-lane row -> a single gather;
    deeper levels select over ceil(4^k/128) rows (2/8/32 for levels 4/5/6,
    46 gathers total per walk) with the level-local offset o = node - base_k
    (o' = 4*o + b mirrors child = 4*node + b + 1, icm.cc:580).
  * The final probability lookup addresses (node, predicted base) =
    21845*4 entries as a select-loop of one gather + one compare per row.
    Each int32 entry packs TWO 16-bit fixed-point log-probs (scale 1/256
    over [-128, 0], bases 2k and 2k+1 of one node), so the loop covers
    342 rows x 128 lanes — the row count, not the unpack, is the cost.
    Quantization error is <=2^-9 per base -> ~2e-5 relative on a 500 bp
    read total, far inside the classification argmax margins (the exact
    path for score parity is ops/icm_score.py).
  * Pruned-node backup (mip == -2 -> parent, icm.cc:590) is folded into the
    prob table at build time (pruned rows get their parent's probs), which
    also handles walks that stop ON a pruned node.
  * Partial windows (first model_len-1 bases, Partial_Window_Prob
    icm.cc:807) fall out of the same code path via the per-position
    ``thresh`` cutoff — no ragged control flow.

Frames are made uniform per kernel instance by splitting positions into
the 3 frame phases (total scores are order-free sums).

Performance model (measured r3, v5e, honest in-loop protocol — the remote
relay memoizes repeat calls, so steps run inside one jitted fori_loop with
rolled inputs, overhead-subtracted):

  * The select-scan costs ~table_bytes/512B gather-ops per (8,128) position
    group: 342 prob rows + 46 walk rows, ~3 VPU ops each. At the bench
    shape (512x510x16) that is ~4.9M (8,128)-ops in a 3.19 ms single pass
    = ~1.75 ops/cycle — ~85% of Mosaic's dual-issue ceiling. Variants that
    break the select dependency chain (OR-accumulate K=4: 3.32 ms;
    round-robin selects K=8: 3.49 ms) or roll the loop (fori_loop chunks:
    35 ms — Mosaic cannot software-pipeline the dynamic VMEM slices) are
    all SLOWER or equal: the kernel is issue-bound, not latency-bound,
    once the grid pipelines back-to-back instances.
  * The only remaining >=2x lever is table BYTES; 16 bits/entry is the
    precision floor (8-bit quantization puts ~0.06/base of error against
    per-read scores where the parity bound is lengths/512), leaf
    densification does not shrink bytes, and real trees are ~96% live so
    compaction is dead. MXU one-hot row-fetch costs table_size MACs per
    position (~2x the select-scan even at int8 TOPS) plus an equally
    expensive one-hot build.
  * Mosaic's sublane gather (jnp.take_along_axis(tab, idx, axis=0), lowered
    to tpu.DynamicGatherOp) was probed as a row-scan replacement: it
    compiles only for one-vreg operands (8 sublanes; 64/344-row operands
    fail Mosaic compilation) and fixes the lane (out[s,l] = tab[idx[s,l],
    l]).  The select-scan needs tab[row[s,l], lane[s,l]] with BOTH indices
    data-dependent, and the two-step sublane-then-lane composition
    evaluates the inner index at the wrong row for any layout (the
    permutation cannot be factored), so vreg gathers cannot shortcut the
    scan.

Compile cost: the unrolled scan takes minutes per (models, batch) shape on
the remote-compile tunnel (cold); the persistent compilation cache
(bench.py sets jax_compilation_cache_dir) amortizes it. The ``groups``
knob trades compile for runtime: groups=2 compiles in ~3 s but runs ~25%
slower (4.26 ms); groups=8 is the production default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
E_BLOCK = 1024  # positions per walk group (tuned on v5e)
GROUPS = 8  # level-synchronized groups per kernel instance (latency hiding)
# fixed-point scale for packed log-probs: 16-bit signed, range [-128, 0],
# quantization step 1/512 after round-to-nearest
FIXED_SCALE = 256.0


def _level_rows(depth: int) -> list[int]:
    """Rows of 128 lanes needed for each walk level 0..depth-1."""
    return [max(1, (4**k + LANES - 1) // LANES) for k in range(depth)]


def pack_tables(bank_mip: np.ndarray, bank_probs: np.ndarray, depth: int = 7):
    """(M, P, N) mip + (M, P, N, 4) probs -> kernel tables.

    Returns (level_mip (M, P, LR, 128) int32, probs_pk (M, P, rows*2, 128)
    int32) where LR = sum of per-level row counts and probs_pk packs two
    16-bit fixed-point log-probs per int32 (scale FIXED_SCALE, clamped to
    [-128, 0]): probs_pk[:, :, hi*2 + (base>>1), lo] holds base 2(base>>1)
    in bits 15..0 and base 2(base>>1)+1 in bits 31..16 for
    node = hi*128 + lo.
    """
    m, p, n = bank_mip.shape
    rows = (n + LANES - 1) // LANES
    pad_n = rows * LANES

    # per-level mut_info_pos tables (walk reads levels 0..depth-1 only)
    lr = _level_rows(depth)
    level_mip = np.full((m, p, sum(lr), LANES), -1, dtype=np.int32)
    off = 0
    for k, rk in enumerate(lr):
        base = (4**k - 1) // 3
        cnt = min(4**k, max(0, n - base))
        flat = np.full((m, p, rk * LANES), -1, dtype=np.int32)
        flat[:, :, :cnt] = bank_mip[:, :, base : base + cnt].astype(np.int32)
        level_mip[:, :, off : off + rk] = flat.reshape(m, p, rk, LANES)
        off += rk

    # fold pruned backup: probs[pruned] = probs[parent]
    probs_eff = np.array(bank_probs, dtype=np.float32)
    parent = np.maximum(0, (np.arange(n) - 1) // 4)
    pruned = bank_mip == -2  # (M, P, N)
    mi, pi, ni = np.nonzero(pruned)
    probs_eff[mi, pi, ni] = probs_eff[mi, pi, parent[ni]]

    probs_pad = np.zeros((m, p, pad_n, 4), dtype=np.float32)
    probs_pad[:, :, :n] = probs_eff
    # [m, p, hi, lo, base] -> [m, p, hi*2 + base>>1, lo] with two int16
    # fixed-point values per int32 (even base low half, odd base high half).
    probs_t = probs_pad.reshape(m, p, rows, LANES, 4).transpose(0, 1, 2, 4, 3)
    # clamp BEFORE scaling: device-trained banks mark zero-prob entries with
    # -FLT_MAX, which overflows f32 when multiplied by FIXED_SCALE
    probs_t = np.maximum(probs_t, np.float32(-32768.0 / FIXED_SCALE))
    q = np.clip(np.rint(probs_t * FIXED_SCALE), -32768, 0).astype(np.int64)
    even = q[:, :, :, 0::2]  # bases 0, 2 -> pairs 0, 1
    odd = q[:, :, :, 1::2]
    packed = ((odd << 16) | (even & 0xFFFF)).astype(np.int32)
    # [m, p, rows, 2 pairs, lanes] -> [m, p, rows*2, lanes]
    packed = packed.reshape(m, p, rows * 2, LANES)
    return level_mip, packed


def pack_tables_int8(bank_mip: np.ndarray, bank_probs: np.ndarray,
                     depth: int = 7, scale: float = 8.0):
    """8-bit variant of :func:`pack_tables`: FOUR int8 fixed-point
    log-probs per int32 (one node's 4 bases in one lane entry), halving
    the prob-table rows (342 -> 171) that dominate the select-scan cost.

    Range [-128/scale, 0] with quantization step 1/scale (round-to-
    nearest error <= 1/(2*scale) = 1/16 per base at the default). The r4
    measured effect on a realistic 256-model bank is recorded in
    tools/int8_study.py + COMPONENTS.md (VERDICT r3 task 3): argmax
    flips vs the exact walk decide whether classification may use it.
    """
    m, p, n = bank_mip.shape
    rows = (n + LANES - 1) // LANES
    pad_n = rows * LANES

    lr = _level_rows(depth)
    level_mip = np.full((m, p, sum(lr), LANES), -1, dtype=np.int32)
    off = 0
    for k, rk in enumerate(lr):
        base = (4**k - 1) // 3
        cnt = min(4**k, max(0, n - base))
        flat = np.full((m, p, rk * LANES), -1, dtype=np.int32)
        flat[:, :, :cnt] = bank_mip[:, :, base : base + cnt].astype(np.int32)
        level_mip[:, :, off : off + rk] = flat.reshape(m, p, rk, LANES)
        off += rk

    probs_eff = np.array(bank_probs, dtype=np.float32)
    parent = np.maximum(0, (np.arange(n) - 1) // 4)
    mi, pi, ni = np.nonzero(bank_mip == -2)
    probs_eff[mi, pi, ni] = probs_eff[mi, pi, parent[ni]]

    probs_pad = np.zeros((m, p, pad_n, 4), dtype=np.float32)
    probs_pad[:, :, :n] = probs_eff
    probs_t = probs_pad.reshape(m, p, rows, LANES, 4).transpose(0, 1, 2, 4, 3)
    probs_t = np.maximum(probs_t, np.float32(-128.0 / scale))
    q = np.clip(np.rint(probs_t * scale), -128, 0).astype(np.int64) & 0xFF
    packed = (
        q[:, :, :, 0] | (q[:, :, :, 1] << 8) | (q[:, :, :, 2] << 16)
        | (q[:, :, :, 3] << 24)
    ).astype(np.uint32).astype(np.int32)
    return level_mip, packed.reshape(m, p, rows, LANES), scale


def _row_gather(tab, r0, rows, idx_lane, idx_row, init, shape):
    """out[s,l] = tab[r0 + idx_row[s,l], idx_lane[s,l]] via select-loop."""
    out = init
    for r in range(rows):
        rowb = jnp.broadcast_to(tab[r0 + r : r0 + r + 1, :], shape)
        g = jnp.take_along_axis(rowb, idx_lane, axis=1)
        out = g if (rows == 1 and init is None) else jnp.where(idx_row == r, g, out)
    return out


def _walk_kernel(
    level_mip_ref, probs_pk_ref, ctx_ref, thresh_ref, last_ref, out_ref, *,
    depth, groups, s_grp, int8=False, scale=FIXED_SCALE
):
    """Walk ``groups`` independent (s_grp, 128) position groups level-
    synchronized, so the per-level gather->arith dependency chains of the
    groups interleave and hide the dynamic-gather latency (the single-group
    walk is latency-bound, not throughput-bound)."""
    lm = level_mip_ref[0, 0]  # (LR, 128) i32
    pk = probs_pk_ref[0, 0]  # (rows*2, 128) i32
    g_slice = lambda ref, g: ref[0][g * s_grp : (g + 1) * s_grp, :]
    ctxs = [g_slice(ctx_ref, g) for g in range(groups)]
    threshs = [g_slice(thresh_ref, g) for g in range(groups)]
    lasts = [g_slice(last_ref, g) for g in range(groups)]
    shape = (s_grp, LANES)

    nodes = [jnp.zeros(shape, jnp.int32) for _ in range(groups)]
    dones = [jnp.zeros(shape, dtype=jnp.bool_) for _ in range(groups)]
    lrows = _level_rows(depth)
    off = 0
    for k in range(depth):
        base_k = (4**k - 1) // 3
        poss = []
        for g in range(groups):
            o = nodes[g] - base_k
            lane_idx = o & (LANES - 1)
            if lrows[k] == 1:
                poss.append(_row_gather(lm, off, 1, lane_idx, None, None, shape))
            else:
                poss.append(
                    _row_gather(
                        lm, off, lrows[k], lane_idx, o >> 7,
                        jnp.full(shape, -1, jnp.int32), shape,
                    )
                )
        off += lrows[k]
        for g in range(groups):
            avail = poss[g] >= threshs[g]
            b = (ctxs[g] >> (2 * jnp.maximum(poss[g], 0))) & 3
            child = 4 * nodes[g] + b + 1
            nodes[g] = jnp.where(dones[g] | ~avail, nodes[g], child)
            dones[g] = dones[g] | ~avail

    # final prob: fixed16x2 gather over (node>>7)*2 + (last>>1) rows, then
    # pick the 16-bit half by last&1; int8x4 packs a whole node in one
    # int32 (one row per 128 nodes), byte-selected by last (arithmetic
    # shifts sign-extend in both layouts)
    outs = []
    for g in range(groups):
        lo = nodes[g] & (LANES - 1)
        if int8:
            hi = nodes[g] >> 7
            acc = _row_gather(pk, 0, pk.shape[0], lo, hi,
                              jnp.zeros(shape, jnp.int32), shape)
            val = (acc << (24 - 8 * lasts[g])) >> 24
        else:
            hi2 = (nodes[g] >> 7) * 2 + (lasts[g] >> 1)
            acc = _row_gather(pk, 0, pk.shape[0], lo, hi2,
                              jnp.zeros(shape, jnp.int32), shape)
            val = jnp.where((lasts[g] & 1) == 1, acc >> 16, (acc << 16) >> 16)
        outs.append(val.astype(jnp.float32) * jnp.float32(1.0 / scale))
    out_ref[0, 0] = jnp.concatenate(outs, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("model_len", "depth", "interpret", "e_block", "groups",
                     "int8", "scale"),
)
def bank_score_reads_pallas(
    level_mip,  # (M, P, LR, 128) i32 from pack_tables
    probs_pk,  # (M, P, rows*2, 128) i32 packed fixed16x2 (or rows, int8x4)
    reads,  # (B, L) int32, L % 3 == 0
    lengths,  # (B,)
    model_len: int = 12,
    depth: int = 7,
    interpret: bool = False,
    e_block: int | None = None,
    groups: int = GROUPS,
    int8: bool = False,
    scale: float = FIXED_SCALE,
):
    """(B, M) total log-prob of each read under each bank model (frame 0)."""
    e_blk = (E_BLOCK if e_block is None else e_block) * groups
    assert e_blk % (LANES * groups) == 0
    s_blk = e_blk // LANES
    s_grp = s_blk // groups
    m, p, lr, _ = level_mip.shape
    b, l = reads.shape
    if l % 3 != 0:
        raise ValueError("pad read length to a multiple of 3")
    l3 = l // 3

    # per-position fields
    w = model_len - 1
    s = reads.astype(jnp.int32)
    padded = jnp.concatenate([jnp.zeros((b, w), jnp.int32), s], axis=1)
    ctx = jnp.zeros((b, l), jnp.int32)
    for k in range(w):
        ctx = ctx | (jax.lax.dynamic_slice_in_dim(padded, k, l, axis=1) << (2 * k))
    i = jnp.arange(l, dtype=jnp.int32)
    thresh = jnp.maximum(0, w - i)[None, :].repeat(b, 0)
    valid = (i[None, :] < lengths[:, None]).astype(jnp.float32)

    # split into frame phases: position i has frame i % 3 (Score_String from 0)
    def phase(x, f):
        return x[:, f::3].reshape(-1)  # (B * l3,)

    e_total = b * l3
    pad_e = (-e_total) % e_blk
    n_blocks = (e_total + pad_e) // e_blk

    def prep(x):
        out = jnp.stack([phase(x, f) for f in range(3)])  # (3, E)
        out = jnp.pad(out, ((0, 0), (0, pad_e)))
        return out.reshape(3, n_blocks * s_blk, LANES)

    ctx_p = prep(ctx)
    thr_p = prep(thresh)
    last_p = prep(s)

    grid = (m, 3, n_blocks)
    out = pl.pallas_call(
        functools.partial(_walk_kernel, depth=depth, groups=groups,
                          s_grp=s_grp, int8=int8, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, lr, LANES), lambda mm, ff, bb: (mm, ff, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, probs_pk.shape[2], LANES),
                         lambda mm, ff, bb: (mm, ff, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_blk, LANES), lambda mm, ff, bb: (ff, bb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_blk, LANES), lambda mm, ff, bb: (ff, bb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_blk, LANES), lambda mm, ff, bb: (ff, bb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, s_blk, LANES), lambda mm, ff, bb: (mm, ff, bb, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((m, 3, n_blocks * s_blk, LANES), jnp.float32),
        interpret=interpret,
    )(level_mip, probs_pk, ctx_p, thr_p, last_p)

    out = out.reshape(m, 3, n_blocks * e_blk)[:, :, :e_total].reshape(m, 3, b, l3)
    # re-apply validity and sum positions + frames
    valid3 = jnp.stack([valid[:, f::3] for f in range(3)])  # (3, B, l3)
    scores = jnp.sum(out * valid3[None], axis=(1, 3))  # (M, B)
    return scores.T


# ---------------------------------------------------------------------------
# Exact fixed-frame per-base scoring (glimmer-mg 6-frame precompute)
# ---------------------------------------------------------------------------


def pack_tables_exact(bank_mip: np.ndarray, bank_probs: np.ndarray,
                      depth: int = 7):
    """(M, P, N) mip + (M, P, N, 4) probs -> EXACT kernel tables.

    Unlike :func:`pack_tables` (16-bit fixed point for the classification
    argmax path), the prob table here stays full f32 so per-base outputs are
    bitwise equal to the reference walk (Frame_Score, icm.cc:485) — required
    because the 6-frame LLRs feed the event DP whose output is byte-compared
    against the reference binary.  Layout: flat entry index node*4 + last ->
    (row = idx >> 7, lane = idx & 127); pruned nodes inherit their parent's
    probs (the icm.cc:590 back-up folded in at pack time).

    Tables are flattened over (model, frame) so a per-block scalar map can
    select any (model, frame) pair: returns
    (level_mip (M*P, LR, 128) i32, probs_x (M*P, PR, 128) f32).
    """
    m, p, n = bank_mip.shape
    lr = _level_rows(depth)
    level_mip = np.full((m, p, sum(lr), LANES), -1, dtype=np.int32)
    off = 0
    for k, rk in enumerate(lr):
        base = (4**k - 1) // 3
        cnt = min(4**k, max(0, n - base))
        flat = np.full((m, p, rk * LANES), -1, dtype=np.int32)
        flat[:, :, :cnt] = bank_mip[:, :, base : base + cnt].astype(np.int32)
        level_mip[:, :, off : off + rk] = flat.reshape(m, p, rk, LANES)
        off += rk

    probs_eff = np.array(bank_probs, dtype=np.float32)
    parent = np.maximum(0, (np.arange(n) - 1) // 4)
    mi, pi, ni = np.nonzero(bank_mip == -2)
    probs_eff[mi, pi, ni] = probs_eff[mi, pi, parent[ni]]

    pr = (n * 4 + LANES - 1) // LANES
    probs_x = np.zeros((m, p, pr * LANES), dtype=np.float32)
    probs_x[:, :, : n * 4] = probs_eff.reshape(m, p, n * 4)
    return (
        level_mip.reshape(m * p, sum(lr), LANES),
        probs_x.reshape(m * p, pr, LANES),
    )


def _fixed_frame_kernel(tab_map_ref, level_mip_ref, probs_ref, ctx_ref,
                        thresh_ref, last_ref, out_ref, *, depth, groups, s_grp):
    """Fixed-frame walk + exact f32 prob fetch for one position block.

    The (model, frame) table pair was selected by the scalar-prefetch block
    map in the BlockSpec index_maps; the body is the same level-synchronized
    lane-gather walk as ``_walk_kernel`` with an unpacked f32 final gather.
    """
    del tab_map_ref  # consumed by the index_maps only
    lm = level_mip_ref[0]
    pb = probs_ref[0]
    g_slice = lambda ref, g: ref[0][g * s_grp : (g + 1) * s_grp, :]
    shape = (s_grp, LANES)
    ctxs = [g_slice(ctx_ref, g) for g in range(groups)]
    threshs = [g_slice(thresh_ref, g) for g in range(groups)]
    lasts = [g_slice(last_ref, g) for g in range(groups)]

    nodes = [jnp.zeros(shape, jnp.int32) for _ in range(groups)]
    dones = [jnp.zeros(shape, dtype=jnp.bool_) for _ in range(groups)]
    lrows = _level_rows(depth)
    off = 0
    for k in range(depth):
        base_k = (4**k - 1) // 3
        poss = []
        for g in range(groups):
            o = nodes[g] - base_k
            lane_idx = o & (LANES - 1)
            if lrows[k] == 1:
                poss.append(_row_gather(lm, off, 1, lane_idx, None, None, shape))
            else:
                poss.append(
                    _row_gather(
                        lm, off, lrows[k], lane_idx, o >> 7,
                        jnp.full(shape, -1, jnp.int32), shape,
                    )
                )
        off += lrows[k]
        for g in range(groups):
            avail = poss[g] >= threshs[g]
            b = (ctxs[g] >> (2 * jnp.maximum(poss[g], 0))) & 3
            child = 4 * nodes[g] + b + 1
            nodes[g] = jnp.where(dones[g] | ~avail, nodes[g], child)
            dones[g] = dones[g] | ~avail

    outs = []
    for g in range(groups):
        idx = nodes[g] * 4 + lasts[g]
        outs.append(
            _row_gather(pb, 0, pb.shape[0], idx & (LANES - 1), idx >> 7,
                        jnp.zeros(shape, jnp.float32), shape)
        )
    out_ref[0] = jnp.concatenate(outs, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("model_len", "depth", "interpret", "reads_per_block",
                     "groups"),
)
def fixed_frame_scores_pallas(
    level_mip,  # (T, LR, 128) i32 from pack_tables_exact (T = models*frames)
    probs_x,  # (T, PR, 128) f32
    seqs,  # (C, B, L) int32 — C independent sequence variants per read
    lengths,  # (B,)
    tab_map,  # (C, n_read_blocks) int32 — table index per position block
    model_len: int = 12,
    depth: int = 7,
    interpret: bool = False,
    reads_per_block: int = 8,
    groups: int = 4,
):
    """(C, B, L) f32 per-base log-probs with a per-block (model, frame) map.

    Each position block covers ``reads_per_block`` whole reads of one
    sequence variant c; ``tab_map[c, rb]`` picks its walk/prob tables, so a
    chunk of reads parameterized by DIFFERENT per-read models (glimmer-mg
    classes mode) runs as ONE kernel launch — the reference reloads each ICM
    once per 500k-read chunk instead (glimmer-mg.cc:327-452).  Exact-f32:
    outputs are bitwise equal to models.icm.per_base_logprob_vec.
    """
    t, lr, _ = level_mip.shape
    sv, b, l = seqs.shape
    c = tab_map.shape[0]
    if c % sv != 0:
        raise ValueError("tab_map combos must be a multiple of seq variants")
    fps = c // sv  # frames per sequence variant (combo cc uses seqs[cc//fps])
    if (b % reads_per_block) != 0:
        raise ValueError("pad batch to a multiple of reads_per_block")
    e_blk = reads_per_block * l
    if e_blk % (LANES * groups) != 0:
        raise ValueError("reads_per_block * L must divide LANES * groups")
    s_blk = e_blk // LANES
    s_grp = s_blk // groups
    n_rb = b // reads_per_block

    w = model_len - 1
    s32 = seqs.astype(jnp.int32)
    padded = jnp.concatenate([jnp.zeros((sv, b, w), jnp.int32), s32], axis=2)
    ctx = jnp.zeros((sv, b, l), jnp.int32)
    for k in range(w):
        ctx = ctx | (jax.lax.dynamic_slice_in_dim(padded, k, l, axis=2) << (2 * k))
    i = jnp.arange(l, dtype=jnp.int32)
    thresh = jnp.broadcast_to(jnp.maximum(0, w - i)[None, None, :], (sv, b, l))

    def prep(x):
        return x.reshape(sv, n_rb * s_blk, LANES)

    ctx_p, thr_p, last_p = prep(ctx), prep(thresh), prep(s32)

    grid = (c, n_rb)
    out = pl.pallas_call(
        functools.partial(
            _fixed_frame_kernel, depth=depth, groups=groups, s_grp=s_grp
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, lr, LANES),
                             lambda cc, bb, m: (m[cc, bb], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, probs_x.shape[1], LANES),
                             lambda cc, bb, m: (m[cc, bb], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s_blk, LANES),
                             lambda cc, bb, m: (cc // fps, bb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s_blk, LANES),
                             lambda cc, bb, m: (cc // fps, bb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s_blk, LANES),
                             lambda cc, bb, m: (cc // fps, bb, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, s_blk, LANES), lambda cc, bb, m: (cc, bb, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((c, n_rb * s_blk, LANES), jnp.float32),
        interpret=interpret,
    )(tab_map.astype(jnp.int32), level_mip, probs_x, ctx_p, thr_p, last_p)
    return out.reshape(c, b, l)


def _pick_reads_per_block(l: int, groups: int = 4, target: int = 4096) -> int:
    """Smallest reads/block >= target positions whose sublane block is both
    a multiple of the f32 tile (8 rows; Mosaic requires the trailing block
    dims be divisible by (8, 128)) and divisible by ``groups``."""
    import math

    quantum = LANES * (8 * groups // math.gcd(8, groups))
    for rpb in range(1, 129):
        if (rpb * l) % quantum == 0 and rpb * l >= target:
            return rpb
    for rpb in range(128, 0, -1):
        if (rpb * l) % quantum == 0:
            return rpb
    raise ValueError(f"read length {l} incompatible with lane quantum")


def plan_group_layout(grp, l):
    """Group-sorted, block-padded row layout shared by the six-frame
    kernel and the DP batch (rows of one kernel block must be
    model-homogeneous). Returns (row_src (B2,) int64 with -1 pads,
    block_groups (n_rb,) int32, rpb)."""
    grp = np.asarray(grp)
    rpb = _pick_reads_per_block(l)
    order = np.argsort(grp, kind="stable")
    sorted_groups = grp[order]
    present = np.unique(sorted_groups)
    rows: list = []
    block_groups: list = []
    for gi in present:
        lo, hi = np.searchsorted(sorted_groups, [gi, gi + 1])
        members = order[lo:hi]
        padded_n = -(-len(members) // rpb) * rpb
        rows.extend(members.tolist())
        rows.extend([-1] * (padded_n - len(members)))
        block_groups.extend([int(gi)] * (padded_n // rpb))
    b2 = len(rows)
    quantum = rpb * max(8, -(-128 // rpb))
    b2_pad = max(rpb, -(-b2 // quantum) * quantum)
    rows.extend([-1] * (b2_pad - b2))
    block_groups.extend([int(present[0]) if len(present) else 0]
                        * ((b2_pad - b2) // rpb))
    return (np.asarray(rows, dtype=np.int64),
            np.asarray(block_groups, dtype=np.int32), rpb)


@functools.partial(jax.jit, static_argnames=("l",))
def _variants_device(reads_dev, lens_dev, l):
    """(rev, comp) sequence variants built ON DEVICE in one jit: the
    host-side numpy construction + 4 MB tunnel upload cost ~190 ms per
    1k-read chunk, and EAGER device ops each pay a remote-dispatch RPC
    (~10-20 ms on this tunnel) — a single jitted program pays once."""
    i = jnp.arange(l, dtype=jnp.int32)[None, :]
    lens2 = lens_dev[:, None]
    fl = jnp.flip(reads_dev, axis=1)            # fl[x] = reads[l-1-x]
    idx = jnp.clip(i + (l - lens2), 0, l - 1)   # rev[i] = fl[i + l - len]
    rev = jnp.where(i < lens2, jnp.take_along_axis(fl, idx, axis=1), 0)
    comp = jnp.where(i < lens2, 3 - reads_dev, 0)
    return jnp.stack([rev, comp]).astype(jnp.int32)


_EXACT_TABLE_CACHE: dict = {}


def exact_tables_cached(key, bank_mip, bank_probs, depth):
    """pack_tables_exact with a process-wide cache (chunks reuse model sets)."""
    hit = _EXACT_TABLE_CACHE.get(key)
    if hit is None:
        if len(_EXACT_TABLE_CACHE) > 64:
            _EXACT_TABLE_CACHE.clear()
        hit = pack_tables_exact(bank_mip, bank_probs, depth)
        _EXACT_TABLE_CACHE[key] = hit
    return hit


def mg_six_frame_pallas(
    gene_mip,  # (G, P, N) int — stacked gene ICM bank (numpy)
    gene_probs,  # (G, P, N, 4) f32
    indep_mip,  # (G, 3, N2) int — per-model null ICMs
    indep_probs,  # (G, 3, N2, 4) f32
    reads: np.ndarray,  # (B, L) int32 padded base indices
    lengths: np.ndarray,  # (B,)
    group: np.ndarray,  # (B,) int32 — bank index of each read's model pair
    model_len: int = 12,
    depth: int = 7,
    gene_periodicity: int = 3,
    interpret: bool = False,
    cache_key=None,
    layout=None,
):
    """Pallas TPU path of the 6-frame precompute: bitwise equal to
    :func:`glimmer_mg_tpu.ops.icm_score.mg_six_frame_batch` (same return
    convention) but through the lane-gather walk kernel with exact f32
    tables — the end-to-end prediction engine's device fast path.

    Reads are stably sorted by model group and each group padded to whole
    position blocks so every kernel block is model-homogeneous; ``tab_map``
    then drives the scalar-prefetch table selection.  With ``layout``
    (a plan_group_layout result) the caller has ALREADY arranged reads in
    that padded order (possibly as a device array — only ~0.5 KB/read ever
    crosses the host link then) and gets outputs in the same order; without
    it, sorting happens here and outputs are un-permuted to input order.
    The rev/comp sequence variants are always built on device.
    """
    b, l = reads.shape
    g, p, _n = gene_mip.shape
    # groups=8 measured 2.8x faster than 4 on v5e at (1024, 512) (r5);
    # fall back when the lane quantum does not divide
    try:
        _pick_reads_per_block(l, groups=8)
        sf_groups = 8
    except ValueError:
        sf_groups = 4

    if layout is not None:
        rows_arr, block_groups, rpb = layout
        reads2 = jnp.asarray(reads, jnp.int32)
        lens2 = np.asarray(lengths, dtype=np.int32)
    else:
        rows_arr, block_groups, rpb = plan_group_layout(group, l)
        src = np.maximum(rows_arr, 0)
        reads2 = jnp.asarray(np.asarray(reads, dtype=np.int32)[src])
        lens2 = np.where(
            rows_arr >= 0, np.asarray(lengths, dtype=np.int32)[src], 0)
    if (rpb * l) % (LANES * sf_groups) != 0:
        sf_groups = 4

    # sequence variants: reversed read (fwd frames), complemented (rev
    # frames) — built on device
    seqs = _variants_device(reads2, jnp.asarray(lens2), l)  # (2, B2, L)

    n_rb = len(block_groups)
    bg = np.asarray(block_groups, dtype=np.int32)
    tab_map = np.stack([bg * 3 + (cc % 3) for cc in range(6)])  # (6, n_rb)

    gkey = (cache_key, "gene", depth) if cache_key is not None else None
    ikey = (cache_key, "ind") if cache_key is not None else None
    if gkey is not None:
        glm, gpx = exact_tables_cached(gkey, gene_mip, gene_probs, depth)
        ilm, ipx = exact_tables_cached(ikey, indep_mip, indep_probs, 2)
    else:
        glm, gpx = pack_tables_exact(gene_mip, gene_probs, depth)
        ilm, ipx = pack_tables_exact(indep_mip, indep_probs, 2)

    gene_out = fixed_frame_scores_pallas(
        glm, gpx, seqs, lens2, tab_map, model_len=model_len, depth=depth,
        interpret=interpret, reads_per_block=rpb, groups=sf_groups,
    )
    ind_out = fixed_frame_scores_pallas(
        ilm, ipx, seqs, lens2, tab_map, model_len=3, depth=2,
        interpret=interpret, reads_per_block=rpb, groups=sf_groups,
    )

    if layout is not None:
        # caller works in layout order: no un-permute (the inverse-order
        # row gather costs ~30 ms/array at this shape)
        return (jnp.transpose(gene_out, (1, 0, 2)),
                jnp.transpose(ind_out, (1, 0, 2)))

    # (6, B2, L) -> input read order (B, 6, L)
    inv = np.full(b, -1, dtype=np.int64)
    for row, srcread in enumerate(rows_arr):
        if srcread >= 0:
            inv[srcread] = row
    gene_r = jnp.transpose(gene_out, (1, 0, 2))[inv]
    ind_r = jnp.transpose(ind_out, (1, 0, 2))[inv]
    return gene_r, ind_r
