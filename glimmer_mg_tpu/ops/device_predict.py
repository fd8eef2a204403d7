"""Chip-resident per-read gene prediction (ORF scan + event DP on device).

This module closes SURVEY §7.4/§7.5 (the on-device ORF/start scan and the
on-device event-graph DP): the COMPLETE error-free prediction path — 6-frame
ICM LLR precompute, ORF enumeration, start scoring (ICM + prior + start
codon + gene length + RBS mixture), per-ORF event construction, the
event-graph dynamic program with bounded-overlap re-linking, and traceback —
runs inside one jitted device computation, vmapped over a read batch. Only
gene calls (~a few tens of bytes per read) cross the host link, so the
reads/s metric scales with chips instead of host cores.

Reference anchors (behavioral spec — the architecture here is array-based,
nothing like the reference's pointer machines):
  Find_Orfs / Do_*_Stop_Codon        glimmer_base.cc:461-780
  Score_Orfs_Errors / Score_Orf_Starts  glimmer-mg.cc:1605-1860
  Add_Events_Fwd / Add_Events_Rev    glimmer_base.cc:43-263
  Add_PWM_Score                      glimmer_base.cc:267-295
  PWM_Meta_Score_Fwd/Rev_Start       glimmer-mg.cc:1900-2060
  Process_Events + helpers           glimmer_base.cc:1530-1896
  Trace_Back                         glimmer3.cc:1631-1759

Scope (gated by callers): error-free classes/user-ICM mode (no indels or
substitution branching, no quality vectors), linear reads,
allow_truncated_orfs=True, default start codons. Everything else stays on
the byte-exact host engines.

Numerics: the reference carries event scores in C doubles and compares DP
candidates in float32; here LLR accumulations and event scores use f64
(via ``jax.enable_x64``) with the same f32 candidate casts. Per-ORF
cumulative scores are computed as differences of whole-read f64 prefix
sums rather than fresh per-ORF sums, and transcendentals (log) are XLA's,
so scores can differ from the host engine in the last ulps; acceptance is
coordinate-identical .predict output (verified on the 999 sample reads and
on fuzz batches in tests/test_device_predict.py), with the byte-exact host
path remaining the default output mode.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

BIG = np.int32(1 << 29)
F32 = np.float32

# Padded event/gene capacities. Overflow is detected per read and reported
# so callers can fall back to the host engine for that read.
MAX_EVENTS = 160
MAX_GENES = 48


# ---------------------------------------------------------------------------
# Bank construction (host side): stack every per-model table the device
# path needs. Groups mirror the six-frame precompute's grouping (one entry
# per distinct Models bundle in the chunk).
# ---------------------------------------------------------------------------


def _codon_tables(patterns):
    """(65,)-entry can/must/which tables over pure 2-bit codons.

    Index = 16*b0 + 4*b1 + b2 (b0 = first base); index 64 = the partial-
    codon sentinel (always false / -1). Exactness: dna.can_be/must_be are
    the reference's Codon_t semantics; a filtered read has pure bases, so
    per-codon table lookup == the streaming register test.
    """
    from ..models import dna

    masks_of = np.array([1, 2, 4, 8], dtype=np.int32)
    codes = np.arange(64)
    b0, b1, b2 = codes // 16, (codes // 4) % 4, codes % 4
    cod12 = (
        (masks_of[b0] << 8) | (masks_of[b1] << 4) | masks_of[b2]
    ).astype(np.int32)

    def can(pats):
        out = np.zeros(65, dtype=bool)
        out[:64] = dna.can_be(cod12, pats)
        return out

    def must(pats):
        out = np.zeros(65, dtype=bool)
        out[:64] = dna.must_be(cod12, pats)
        return out

    def which(pats):
        w = np.full(65, -1, dtype=np.int8)
        for pi in range(len(pats) - 1, -1, -1):
            w[:64][dna.can_be(cod12, pats[pi : pi + 1])] = pi
        return w

    return {
        "fwd_start": can(patterns.fwd_start),
        "rev_start": can(patterns.rev_start),
        "fwd_stop": must(patterns.fwd_stop),
        "rev_stop": must(patterns.rev_stop),
        "which_fwd": which(patterns.fwd_start),
        "which_rev": which(patterns.rev_start),
    }


@dataclasses.dataclass
class DeviceBank:
    """Stacked per-group model tables (numpy, host-built)."""

    # ICM bank (shared with ops.icm_score.mg_six_frame_batch)
    gene_mip: np.ndarray
    gene_probs: np.ndarray
    indep_mip: np.ndarray
    indep_probs: np.ndarray
    model_len: int
    depth: int
    periodicity: int
    # codon tables (G, 65)
    fwd_start: np.ndarray
    rev_start: np.ndarray
    fwd_stop: np.ndarray
    rev_stop: np.ndarray
    which_fwd: np.ndarray
    which_rev: np.ndarray
    # feature tables
    prior: np.ndarray  # (G,) f32
    start_lo: np.ndarray  # (G, S) f32
    len_score: np.ndarray  # (G, 3, T) f64: rows = (full, 5'or3'-trunc, both)
    adj_or: np.ndarray  # (G, 4) f32: ff, fr, rf, rr
    adj_dist: np.ndarray  # (G, 3, D) f32: ff, fr, rf (padded; saturate=last)
    adj_dist_len: np.ndarray  # (G, 3) int32 true lengths
    ignore_score_len: np.ndarray  # (G,) int32
    # RBS mixture (PWM_Meta) or user log-odds PWM
    pwm_cols: np.ndarray  # (G, C, W, 4) f64 raw-prob mixture columns
    pwm_n: np.ndarray  # (G,) int32 — 0 = no PWM for this group
    pwm_user: np.ndarray  # (G, W, 4) f64 log-odds (user -b PWM) or zeros
    pwm_is_user: np.ndarray  # (G,) bool
    gc_lp: np.ndarray  # (G, 4) f64 background logs
    # scalars (uniform across the chunk; enforced by the builder)
    min_gene_len: int
    max_olap: int
    event_threshold: float
    start_threshold: float
    ribosome_window: int
    pwm_w: int


def build_bank(models_list, max_read_len: int) -> DeviceBank:
    """Stack a chunk's Models bundles into device tables.

    Raises ValueError when the bundles cannot share one kernel instance
    (mixed scalars/model shapes) — callers fall back to the host engine.
    """
    from ..ops import icm_score

    m0 = models_list[0]
    for m in models_list:
        if (
            m.min_gene_len != m0.min_gene_len
            or m.max_olap_bases != m0.max_olap_bases
            or m.event_threshold != m0.event_threshold
            or m.start_threshold != m0.start_threshold
            or m.ribosome_window_size != m0.ribosome_window_size
            or m.gene_icm.model_len != m0.gene_icm.model_len
            or m.gene_icm.periodicity != m0.gene_icm.periodicity
            or m.use_first_start_codon
            or m.circular
            or not m.allow_truncated_orfs
        ):
            raise ValueError("device path needs uniform scalar models")

    gmip, gprobs = icm_score.stack_bank([m.gene_icm for m in models_list])
    imip, iprobs = icm_score.stack_bank([m.indep_model for m in models_list])

    g = len(models_list)
    ct = [_codon_tables(m.patterns) for m in models_list]
    n_start = max(len(m.logodds_start.log_odds) for m in models_list)
    start_lo = np.zeros((g, n_start), dtype=np.float32)

    t_len = max_read_len // 3 + 3
    len_score = np.zeros((g, 3, t_len), dtype=np.float64)
    adj_tabs = []
    prior = np.zeros(g, dtype=np.float32)
    adj_or = np.zeros((g, 4), dtype=np.float32)
    isl = np.zeros(g, dtype=np.int32)

    pwm_lists = []
    user_pwms = []
    for gi, m in enumerate(models_list):
        prior[gi] = m.logodds_prior
        start_lo[gi, : len(m.logodds_start.log_odds)] = m.logodds_start.log_odds
        ld = m.logodds_length
        # The classes-mode LengthDist is built per (classes, read-length)
        # cache entry with a single fragment distribution, so score() is a
        # pure function of (length, trunc flags); pre-evaluate it densely.
        for L in range(t_len):
            len_score[gi, 0, L] = ld.score(L, False, False, max_read_len // 3)
            len_score[gi, 1, L] = ld.score(L, True, False, max_read_len // 3)
            len_score[gi, 2, L] = ld.score(L, True, True, max_read_len // 3)
        ad = m.logodds_adj_dist
        adj_or[gi] = [m.logodds_adj_or.ff, m.logodds_adj_or.fr,
                      m.logodds_adj_or.rf, m.logodds_adj_or.rr]
        adj_tabs.append((ad.ff, ad.fr, ad.rf, ad.max_overlap))
        isl[gi] = min(int(m.ignore_score_len), int(BIG))
        meta = getattr(m, "_meta_pwms", None)
        if meta:
            pwm_lists.append([p.cols for p in meta])
            user_pwms.append(None)
        elif m.user_rbs and not m.logodds_pwm.is_empty():
            pwm_lists.append(None)
            user_pwms.append(m.logodds_pwm.cols)
        else:
            pwm_lists.append([])
            user_pwms.append(None)

    for ff, fr, rf, mo in adj_tabs:
        if mo not in (0, m0.max_olap_bases):
            raise ValueError("adj-dist max_overlap mismatch")

    d_max = max(max(len(t[0]), len(t[1]), len(t[2])) for t in adj_tabs)
    adj_dist = np.zeros((g, 3, d_max), dtype=np.float32)
    adj_dist_len = np.zeros((g, 3), dtype=np.int32)
    for gi, (ff, fr, rf, _mo) in enumerate(adj_tabs):
        for k, t in enumerate((ff, fr, rf)):
            adj_dist[gi, k, : len(t)] = t
            adj_dist[gi, k, len(t):] = t[-1]  # saturate pads at .back()
            adj_dist_len[gi, k] = len(t)

    widths = set()
    cmax = 1
    for gi in range(g):
        if pwm_lists[gi]:
            widths.update(p.shape[0] for p in pwm_lists[gi])
            cmax = max(cmax, len(pwm_lists[gi]))
        if user_pwms[gi] is not None:
            widths.add(user_pwms[gi].shape[0])
    if len(widths) > 1:
        raise ValueError("mixed PWM widths in one chunk")
    w = widths.pop() if widths else 0

    pwm_cols = np.zeros((g, cmax, max(w, 1), 4), dtype=np.float64)
    pwm_n = np.zeros(g, dtype=np.int32)
    pwm_user = np.zeros((g, max(w, 1), 4), dtype=np.float64)
    pwm_is_user = np.zeros(g, dtype=bool)
    gc_lp = np.zeros((g, 4), dtype=np.float64)
    for gi, m in enumerate(models_list):
        gc = m.indep_gc_frac
        gc_log = np.log(0.5 * np.float64(gc))
        at_log = np.log(0.5 * (1.0 - np.float64(gc)))
        gc_lp[gi] = [at_log, gc_log, gc_log, at_log]
        if pwm_lists[gi]:
            for ci, cols in enumerate(pwm_lists[gi]):
                pwm_cols[gi, ci] = cols
            pwm_n[gi] = len(pwm_lists[gi])
        elif user_pwms[gi] is not None:
            pwm_user[gi] = user_pwms[gi]
            pwm_is_user[gi] = True

    return DeviceBank(
        gene_mip=gmip, gene_probs=gprobs, indep_mip=imip, indep_probs=iprobs,
        model_len=m0.gene_icm.model_len, depth=max(
            m.gene_icm.model_depth for m in models_list),
        periodicity=m0.gene_icm.periodicity,
        fwd_start=np.stack([c["fwd_start"] for c in ct]),
        rev_start=np.stack([c["rev_start"] for c in ct]),
        fwd_stop=np.stack([c["fwd_stop"] for c in ct]),
        rev_stop=np.stack([c["rev_stop"] for c in ct]),
        which_fwd=np.stack([c["which_fwd"] for c in ct]),
        which_rev=np.stack([c["which_rev"] for c in ct]),
        prior=prior, start_lo=start_lo, len_score=len_score,
        adj_or=adj_or, adj_dist=adj_dist, adj_dist_len=adj_dist_len,
        ignore_score_len=isl,
        pwm_cols=pwm_cols, pwm_n=pwm_n, pwm_user=pwm_user,
        pwm_is_user=pwm_is_user, gc_lp=gc_lp,
        min_gene_len=m0.min_gene_len, max_olap=m0.max_olap_bases,
        event_threshold=m0.event_threshold,
        start_threshold=m0.start_threshold,
        ribosome_window=m0.ribosome_window_size,
        pwm_w=w,
    )


# ---------------------------------------------------------------------------
# Per-read device computation. Everything below is jnp code over one padded
# read (vmapped by predict_batch); Lp (padded length, multiple of 3) is
# static, n is traced.
# ---------------------------------------------------------------------------


def _cls3_cummax(vals):
    """Running max within each i%3 class (frame-strided scan)."""
    import jax

    v = vals.reshape(-1, 3)
    return jax.lax.associative_scan(_maximum, v, axis=0).reshape(-1)


def _cls3_revcummin(vals):
    import jax

    v = vals.reshape(-1, 3)
    return jax.lax.associative_scan(_minimum, v, axis=0, reverse=True).reshape(-1)


def _maximum(a, b):
    import jax.numpy as jnp

    return jnp.maximum(a, b)


def _minimum(a, b):
    import jax.numpy as jnp

    return jnp.minimum(a, b)


def _shift_right(arr, k, fill):
    """arr shifted right by k (arr[i-k]), front filled."""
    import jax.numpy as jnp

    return jnp.concatenate([jnp.full((k,), fill, arr.dtype), arr[:-k]])


def _shift_left(arr, k, fill):
    import jax.numpy as jnp

    return jnp.concatenate([arr[k:], jnp.full((k,), fill, arr.dtype)])


def _gather_guard(arr, idx, fill):
    """arr[idx] with out-of-range idx -> fill."""
    import jax.numpy as jnp

    ok = (idx >= 0) & (idx < arr.shape[0])
    return jnp.where(ok, arr[jnp.clip(idx, 0, arr.shape[0] - 1)], fill)


def _read_tables(seq, n, gi, bank):
    """Per-position codon-class tables and scan arrays for one read.

    Returns a dict of (Lp,) arrays mirroring the host's boolean codon
    arrays (engine.orfs.scan_codons) and stop-index arrays
    (MgSequenceState._save_prev_stops), plus the frame-strided
    next/prev-start/stop scans the ORF assembler queries.
    """
    import jax.numpy as jnp

    Lp = seq.shape[0]
    i = jnp.arange(Lp, dtype=jnp.int32)
    valid = i < n

    s0 = _shift_right(seq, 2, 0)
    s1 = _shift_right(seq, 1, 0)
    cod6 = jnp.where((i >= 2) & valid, s0 * 16 + s1 * 4 + seq, 64)

    t = {}
    t["cod6"] = cod6
    t["is_fwd_start"] = bank["fwd_start"][gi][cod6]
    t["is_rev_start"] = bank["rev_start"][gi][cod6]
    t["is_fwd_stop"] = bank["fwd_stop"][gi][cod6]
    t["is_rev_stop"] = bank["rev_stop"][gi][cod6]
    t["which_fwd"] = bank["which_fwd"][gi][cod6].astype(jnp.int32)
    t["which_rev"] = bank["which_rev"][gi][cod6].astype(jnp.int32)

    nBIG = jnp.int32(BIG)
    t["pstop_f"] = _cls3_cummax(jnp.where(t["is_fwd_stop"], i, -nBIG))
    t["nstop_f"] = _cls3_revcummin(jnp.where(t["is_fwd_stop"], i, nBIG))
    t["pstop_r"] = _cls3_cummax(jnp.where(t["is_rev_stop"], i, -nBIG))
    t["nstop_r"] = _cls3_revcummin(jnp.where(t["is_rev_stop"], i, nBIG))
    t["nstart_f"] = _cls3_revcummin(jnp.where(t["is_fwd_start"], i, nBIG))
    t["pstart_r"] = _cls3_cummax(jnp.where(t["is_rev_start"], i, -nBIG))
    # nsq[q]: next q' >= q (same class) whose codon LAST base q'+2 is a fwd
    # start — the scorer's start-candidate positions (start first base).
    hit2f = _shift_left(t["is_fwd_start"], 2, False)
    t["nsq_f"] = _cls3_revcummin(jnp.where(hit2f, i, nBIG))
    t["psu_r"] = _cls3_cummax(jnp.where(t["is_rev_start"], i, -nBIG))

    # Save_Prev_Stops mirrors (MgSequenceState): per-position previous fwd
    # stop / next rev stop register values (glimmer-mg.cc:675).
    cls = i % 3
    init_f = jnp.where(cls == 0, 0, jnp.where(cls == 1, 1, -1))
    t["fwd_prev"] = jnp.maximum(init_f, t["pstop_f"])
    f_r = (n - 1 - i) % 3
    init_r = jnp.where(f_r == 0, n - 1, jnp.where(f_r == 1, n - 2, n))
    hit_r = _shift_left(t["is_rev_stop"], 2, False)
    rn_cand = _cls3_revcummin(jnp.where(hit_r, i, nBIG))
    t["rev_next"] = jnp.minimum(init_r, rn_cand)
    return t


def _fps(t, n, x):
    """fwd_prev_stop(x) with the host's out-of-range passthrough."""
    import jax.numpy as jnp

    inside = (x >= 0) & (x < n)
    return jnp.where(inside, _gather_guard(t["fwd_prev"], x, 0), x)


def _rns(t, n, x):
    import jax.numpy as jnp

    inside = (x >= 0) & (x < n)
    return jnp.where(inside, _gather_guard(t["rev_next"], x, 0), x)


def _fwd_orf_slots(t, n, Lp, min_gene_len):
    """Forward-ORF candidate slots: Lp real (by stop last-base subscript)
    + 3 virtual truncated stops at subscripts n..n+2.

    Mirrors Do_Fwd_Stop_Codon / Handle_First_Forward_Stop
    (glimmer_base.cc:461-506, 946-974; host engine.orfs.find_orfs) and the
    scorer's segment bounds (MgScorer.score_orf_starts, glimmer-mg.cc:1693).
    """
    import jax.numpy as jnp

    nBIG = jnp.int32(BIG)
    iS = jnp.concatenate(
        [jnp.arange(Lp, dtype=jnp.int32), n + jnp.arange(3, dtype=jnp.int32)]
    )
    real = jnp.arange(Lp + 3) < Lp
    slot_exists = jnp.where(real, jnp.pad(t["is_fwd_stop"], (0, 3)), True)

    c = iS % 3
    # previous stop in class: real -> pstop[iS-3]; virtual -> last real stop
    pst3 = _shift_right(t["pstop_f"], 3, -nBIG)
    last_in_cls = t["pstop_f"][Lp - 3 + c]  # top of each class column
    ip = jnp.where(real, _gather_guard(pst3, iS, -nBIG), last_in_cls)
    has_prev = ip > -nBIG // 2

    # first fwd start strictly after the previous stop (subscript > ip),
    # or (no previous stop) the first class position >= 2
    c0 = jnp.where(c == 2, 2, c + 3)
    q_from = jnp.where(has_prev, ip + 3, c0)
    s_star = _gather_guard(t["nstart_f"], q_from, nBIG)
    gene_len = jnp.where(s_star < iS, iS - s_star, 0)

    orf_len = jnp.where(has_prev, iS - ip - 3, (iS - 2) - ((iS - 2) % 3))
    gene_len = jnp.where(
        (~has_prev) & (gene_len < min_gene_len), orf_len, gene_len
    )
    emit = slot_exists & (gene_len >= min_gene_len)

    # scorer bounds (Cumulative_Frame_Score segment)
    hi = iS - 2
    lo = _fps(t, n, hi - 1) + 1
    mm = hi - lo
    top_j = jnp.maximum(((mm - 1) // 3) * 3, -3)
    orf_trunc = lo < 3
    t3 = iS >= n  # stop_position > n - 2
    key = jnp.where(real, 2 * iS + 1, 2 * Lp + 8 + (iS - n))
    return {
        "iS": iS, "emit": emit, "lo": lo, "hi": hi, "mm": mm,
        "top_j": top_j, "orf_trunc": orf_trunc, "t3": t3, "key": key,
        "stop_pos": iS - 1,
    }


def _rev_orf_slots(t, n, Lp, min_gene_len):
    """Reverse-ORF candidate slots: Lp real (closing rev-stop subscript)
    + 3 end-of-sequence slots (frame classes 0..2).

    Mirrors Do_Rev_Stop_Codon / Handle_First_Reverse_Stop / Finish_Orfs
    (glimmer_base.cc:509-539, 978-1000, 783-806; allow_truncated linear).
    """
    import jax.numpy as jnp

    nBIG = jnp.int32(BIG)
    idx = jnp.arange(Lp + 3, dtype=jnp.int32)
    real = idx < Lp
    iC = jnp.where(real, idx, n + (idx - Lp))  # closing boundary subscript
    cls = iC % 3
    f_end = idx - Lp  # end-slot frame class (host Finish_Orfs f)
    c = jnp.where(real, cls, f_end)
    slot_exists = jnp.where(real, jnp.pad(t["is_rev_stop"], (0, 3)), True)

    pst3 = _shift_right(t["pstop_r"], 3, -nBIG)
    last_in_cls = t["pstop_r"][Lp - 3 + c]
    ip = jnp.where(real, _gather_guard(pst3, iC, -nBIG), last_in_cls)
    has_prev = ip > -nBIG // 2

    vstop = jnp.where(c == 0, -1, jnp.where(c == 1, 0, -2))
    orf_stop = jnp.where(has_prev, ip - 1, vstop)

    # last rev start strictly inside the segment and before the boundary
    bound = jnp.where(real, iC, n)  # end slots: subscripts < n
    ls = _gather_guard(t["pstart_r"], bound - 3, -nBIG)
    ls_ok = (ls > jnp.where(has_prev, ip, -nBIG)) & (ls > -nBIG // 2)
    gene_len = jnp.where(ls_ok, (ls - 1) - orf_stop, 0)

    end_orf_len = n - orf_stop - 2
    end_orf_len = end_orf_len - end_orf_len % 3
    orf_len = jnp.where(real, bound - orf_stop - 4, end_orf_len)
    # allow_truncated fill applies only to the end-of-sequence handler
    gene_len = jnp.where(
        (~real) & (gene_len < min_gene_len), orf_len, gene_len
    )
    emit = slot_exists & (gene_len >= min_gene_len)

    end_point = orf_stop + 3
    lo = end_point
    hi = _rns(t, n, end_point - 1) + 1
    mm = hi - lo
    top_j = jnp.maximum(((mm - 1) // 3) * 3, -3)
    orf_trunc = (n - (hi - 1)) < 3
    t3 = orf_stop < 1
    key = jnp.where(real, 2 * iC, 2 * Lp + 4 + f_end)
    return {
        "iC": iC, "emit": emit, "lo": lo, "hi": hi, "mm": mm,
        "top_j": top_j, "orf_trunc": orf_trunc, "t3": t3, "key": key,
        "stop_pos": orf_stop,
    }
