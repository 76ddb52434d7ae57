"""Host <-> device batching for the fast (TPU) codec paths.

Packs lists of parsed FCZ payloads into padded, bucket-shaped device arrays
for kernels/decode.py, and expands the resulting atom14 tensors back into
AtomArray records for PDB output. The exact byte-level FCZ parse/serialize
stays in codec/fcz.py; this module only moves numbers.

Padded shapes are rounded up to buckets so XLA compiles a handful of shapes
for an entire database instead of one per protein.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core.aatable import (ALT_PERM, ATOM_NAMES, MAX_ATOM,
                            N_ATOMS, N_SC_TORSION)
from ..core.codes import (NUM_AA, THREE_LETTER, three_letter_from_one)
from ..io.structure import AtomArray
from .fcz import FczData, unpack_records

F32 = np.float32
I32 = np.int32

# Flipped to True the first time a device batch completes IN THIS PROCESS.
# The hybrid scheduler's EndgameGuard reads it: a warm in-process pipeline
# reaches its first completion in one dispatch, so the persisted
# cold-start estimate (trace + compile + program upload) would wrongly
# sideline the device on short jobs that follow a warm one.
DEVICE_WARMED = False


def _round_up(x: int, m: int) -> int:
    return ((max(x, 1) + m - 1) // m) * m


def segments_of(f: FczData):
    """Per-segment (start_residue, record_count) from the anchor indices.

    Derived from the decompression loop bounds (foldcomp.cpp:812-858): every
    segment's records and torsions are contiguous from its anchor; the final
    segment runs to the last residue.
    """
    n = f.n_residue
    anchors = [int(a) for a in f.anchor_indices]
    starts, counts = [], []
    for s in range(f.n_anchor - 1):
        first = min(anchors[s], n - 1)
        if s == f.n_anchor - 2:
            m = n - first
        else:
            m = min(anchors[s + 1] + 1, n - 1) - first
        starts.append(first)
        counts.append(max(m, 1))
    return starts, counts


@dataclass
class DecodeMeta:
    """Per-protein bookkeeping the device kernel does not need."""
    n_residue: int
    idx_residue: int
    idx_atom: int
    chain: str
    title: str
    first_residue: str
    last_residue: str
    has_oxt: bool
    oxt_coords: np.ndarray


def pack_decode_batch(fczs, l_bucket: int = 32, s_bucket: int = 4,
                      seg_bucket: int = 8):
    """List[FczData] -> (dict of padded numpy arrays, List[DecodeMeta])."""
    b = len(fczs)
    seg_info = [segments_of(f) for f in fczs]
    l_pad = _round_up(max(f.n_residue for f in fczs), l_bucket)
    s_pad = _round_up(max(len(st) for st, _ in seg_info), s_bucket)
    seg_pad = _round_up(max(max(cn) for _, cn in seg_info), seg_bucket)

    records = np.zeros((b, l_pad, 8), np.uint8)
    mins = np.zeros((b, 6), F32)
    cont_fs = np.zeros((b, 6), F32)
    sc_codes = np.zeros((b, l_pad, 11), np.uint8)
    tf_codes = np.zeros((b, l_pad), np.uint8)
    tf_min = np.zeros(b, F32)
    tf_cont = np.zeros(b, F32)
    anchor_xyz = np.zeros((b, s_pad + 1, 3, 3), F32)
    # padded segments must never win the "last segment starting <= r" stitch
    seg_start = np.full((b, s_pad), l_pad + seg_pad + 1, I32)
    seg_m = np.ones((b, s_pad), I32)
    n_res = np.zeros(b, I32)

    metas = []
    for i, f in enumerate(fczs):
        n = f.n_residue
        n_res[i] = n
        records[i, :n] = f.records
        mins[i] = f.mins
        cont_fs[i] = f.cont_fs
        tf_codes[i, :n] = f.tf_codes
        tf_min[i] = f.tf_min
        tf_cont[i] = f.tf_cont

        starts, counts = seg_info[i]
        ns = len(starts)
        seg_start[i, :ns] = starts
        seg_m[i, :ns] = counts
        anchor_xyz[i, :f.n_anchor] = f.anchor_coords

        # side-chain stream -> per-residue [11] slots (vectorized scatter:
        # stream element j of residue r lands at flat index r*11 + j)
        res_code = unpack_records(f.records)[0]
        counts_sc = np.where(res_code < NUM_AA, N_SC_TORSION[res_code], 0)
        total = int(counts_sc.sum())
        if total:
            res_of = np.repeat(np.arange(n, dtype=np.int64), counts_sc)
            ends = np.cumsum(counts_sc)
            within = np.arange(total, dtype=np.int64) - \
                np.repeat(ends - counts_sc, counts_sc)
            sc_codes[i].reshape(-1)[res_of * 11 + within] = \
                f.sc_codes[:total]

        metas.append(DecodeMeta(
            n_residue=n, idx_residue=f.idx_residue, idx_atom=f.idx_atom,
            chain=f.chain, title=f.title, first_residue=f.first_residue,
            last_residue=f.last_residue, has_oxt=f.has_oxt,
            oxt_coords=np.asarray(f.oxt_coords, F32)))

    arrays = dict(records=records, mins=mins, cont_fs=cont_fs,
                  sc_codes=sc_codes, tf_codes=tf_codes, tf_min=tf_min,
                  tf_cont=tf_cont, anchor_xyz=anchor_xyz,
                  seg_start=seg_start, seg_m=seg_m)
    return arrays, metas, seg_pad


@dataclass
class SegDecodeMeta:
    """Per-protein host-side state for the segment-space decode path.

    Carries everything needed to assemble/format the protein from the
    device's segment-space atom14 output — residue codes and temp factors
    are computed on host (they never need the device), and (lane_of,
    rec_of) index each residue's row in the [N, SEG, 14, 3] output (the
    'stitch' done as a host fancy-index)."""
    n_residue: int
    idx_residue: int
    idx_atom: int
    chain: str
    title: str
    first_residue: str
    last_residue: str
    has_oxt: bool
    oxt_coords: np.ndarray
    res_code: np.ndarray   # i32 [n]
    temp: np.ndarray       # f32 [n]
    lane_of: np.ndarray    # i64 [n]
    rec_of: np.ndarray     # i64 [n]
    res_base: int = 0      # row offset in the residue-space output [R]
    sc_codes: np.ndarray | None = None  # u8 stream, bb-only wire mode


def pack_decode_batch_seg(fczs, s_bucket: int = 4, seg_bucket: int = 8):
    """List[FczData] -> segment-space device arrays + SegDecodeMeta list.

    The host window-expands records/side-chain codes into segment space so
    the device pipeline needs zero gathers (see kernels/decode.py
    decode_seg_core). Windows overlap by one record (the shared anchor
    residue), ~4% duplication at the default anchor interval.

    Fully vectorized ACROSS proteins: all residue streams concatenate
    into global arrays and every expansion (segment windows, side-chain
    slot scatter, the stitch index) is one fancy-index / one global
    searchsorted — the per-protein numpy-call loop was the fast decode
    path's host bound (~2 Mres/s/thread; this form is several times
    that)."""
    b = len(fczs)
    nres = np.array([f.n_residue for f in fczs], np.int64)
    rec_base = np.zeros(b + 1, np.int64)
    np.cumsum(nres, out=rec_base[1:])
    r_tot = int(rec_base[-1])

    # global segment table (segments_of semantics, vectorized over the
    # whole batch: decompression loop bounds of foldcomp.cpp:812-858)
    na = np.array([f.n_anchor for f in fczs], np.int64)
    anchors_all = np.concatenate(
        [np.asarray(f.anchor_indices, np.int64) for f in fczs])
    ab = np.cumsum(na)
    s_i = na - 1                                 # segments per protein
    seg_ord = _ragged_arange(s_i)
    first_idx = np.repeat(ab - na, s_i) + seg_ord
    a0 = anchors_all[first_idx]
    a1 = anchors_all[first_idx + 1]
    nres_rep = np.repeat(nres, s_i)
    first = np.minimum(a0, nres_rep - 1)
    is_last = seg_ord == np.repeat(s_i - 1, s_i)
    counts_g = np.maximum(
        np.where(is_last, nres_rep - first,
                 np.minimum(a1 + 1, nres_rep - 1) - first), 1)

    s_pad = _round_up(int(s_i.max()), s_bucket)
    seg_pad = _round_up(int(counts_g.max()), seg_bucket)
    n = b * s_pad
    ar = np.arange(seg_pad)
    records_all = np.concatenate(
        [np.asarray(f.records, np.uint8).reshape(-1, 8) for f in fczs])

    # global per-residue side-chain slot scatter (stream element j of
    # residue r lands at flat r*11 + j; proteins concatenate in order)
    res_code_all = unpack_records(records_all)[0].astype(np.int32)
    counts_sc = np.where(res_code_all < NUM_AA,
                         N_SC_TORSION[res_code_all], 0).astype(np.int64)
    totals = np.add.reduceat(counts_sc, rec_base[:-1]) if r_tot else \
        np.zeros(b, np.int64)
    # 12-byte rows so the window gather below runs as 3 x u32 moves
    # instead of 11 per-element u8 moves (numpy fancy-indexing cost is
    # per ELEMENT; the wider view is ~4x on this path)
    sc_res_all = np.zeros((r_tot, 12), np.uint8)
    tot = int(counts_sc.sum())
    if tot:
        stream = np.concatenate(
            [np.asarray(f.sc_codes[:t], np.uint8)
             for f, t in zip(fczs, totals)])
        res_of = np.repeat(_arange(r_tot), counts_sc)
        ends = np.cumsum(counts_sc)
        within = _arange(tot) - np.repeat(ends - counts_sc, counts_sc)
        sc_res_all.reshape(-1)[res_of * 12 + within] = stream

    # all real lanes at once: global record-row window per (protein, seg)
    lane_index = np.repeat(np.arange(b, dtype=np.int64) * s_pad, s_i) + \
        seg_ord
    starts_g = first + np.repeat(rec_base[:-1], s_i)
    last_g = np.repeat(rec_base[1:] - 1, s_i)
    idx = np.minimum(starts_g[:, None] + ar[None, :], last_g[:, None])

    # window-expand through wide views: one u64 per 8-byte record row,
    # three u32 per 12-byte sc row — fancy-indexing moves elements, not
    # bytes, so wide elements are ~4-8x faster than u8 gathers
    seg_records = np.zeros((n, seg_pad, 8), np.uint8)
    seg_records.view(np.uint64)[:, :, 0][lane_index] = \
        records_all.view(np.uint64)[:, 0][idx]
    sc_seg12 = np.zeros((n, seg_pad, 12), np.uint8)
    sc_seg12.view(np.uint32)[lane_index] = sc_res_all.view(np.uint32)[idx]
    sc_seg = sc_seg12[:, :, :11]
    seg_m = np.ones(n, I32)
    seg_m[lane_index] = counts_g

    mins_lane = np.repeat(np.stack([f.mins for f in fczs]).astype(F32),
                          s_pad, axis=0)
    cont_lane = np.repeat(np.stack([f.cont_fs for f in fczs]).astype(F32),
                          s_pad, axis=0)
    anchor_xyz = np.zeros((b, s_pad + 1, 3, 3), F32)
    for i, f in enumerate(fczs):
        anchor_xyz[i, :f.n_anchor] = f.anchor_coords

    # stitch: residue r owned by the last segment starting <= r
    # (foldcomp.cpp:849-857); starts_g is globally ascending, and every
    # protein's first start equals its rec_base, so ONE searchsorted
    # lands inside the right protein for every residue
    r_g = _arange(r_tot)
    s_of_r = np.searchsorted(starts_g, r_g, side="right") - 1
    lane_of_g = lane_index[s_of_r]
    rec_of_g = np.clip(r_g - starts_g[s_of_r], 0, seg_pad - 1)

    # residue-space stitch index for the on-device stitch; coarse bucket
    # (4096) so R is not a fresh jit shape per batch (one extra compile
    # costs ~9 s on a remote-compile service)
    res_index = np.zeros(_round_up(r_tot, 4096), I32)
    res_index[:r_tot] = lane_of_g * seg_pad + rec_of_g

    tf_all = np.concatenate(
        [np.asarray(f.tf_codes, np.uint8) for f in fczs]).astype(F32)
    temp_all = (tf_all
                * np.repeat(np.array([f.tf_cont for f in fczs], F32), nres)
                + np.repeat(np.array([f.tf_min for f in fczs], F32),
                            nres)).astype(F32)

    metas = []
    for i, f in enumerate(fczs):
        lo, hi = int(rec_base[i]), int(rec_base[i + 1])
        metas.append(SegDecodeMeta(
            n_residue=f.n_residue, idx_residue=f.idx_residue,
            idx_atom=f.idx_atom, chain=f.chain, title=f.title,
            first_residue=f.first_residue, last_residue=f.last_residue,
            has_oxt=f.has_oxt, oxt_coords=np.asarray(f.oxt_coords, F32),
            res_code=res_code_all[lo:hi], temp=temp_all[lo:hi],
            lane_of=lane_of_g[lo:hi], rec_of=rec_of_g[lo:hi],
            res_base=lo))

    arrays = dict(
        seg_records=np.ascontiguousarray(seg_records.transpose(1, 0, 2)),
        mins_lane=mins_lane, cont_lane=cont_lane,
        sc_codes_seg=np.ascontiguousarray(sc_seg.transpose(2, 1, 0)),
        anchor_xyz=anchor_xyz, seg_m=seg_m, res_index=res_index)
    return arrays, metas


_ARANGE = np.arange(0, dtype=np.int64)


def _arange(n):
    """Cached read-only arange view — on this VM a FRESH 2.8M-element
    arange faults pages at ~15-25 MB/s (1.5 s!), so the big index
    vectors reuse one growing buffer (PROFILE.md round 4)."""
    global _ARANGE
    if _ARANGE.size < n:
        _ARANGE = np.arange(max(n, 2 * _ARANGE.size), dtype=np.int64)
        _ARANGE.setflags(write=False)
    return _ARANGE[:n]


def _ragged_arange(counts):
    """[0..c0), [0..c1), ... concatenated."""
    total = int(counts.sum())
    out = _arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    return out


LANE_PAD = 1024  # fused-kernel lane quantum (kernels/pallas_decode.py)


def _pack_lanes_native(fczs, seg_bucket: int = 8,
                       max_seg: int | None = None):
    """One-pass C fill of the ragged-lane arrays (native/fccodec.c
    fcz_pack_lanes) from per-entry FczData field pointers, GIL-free.
    Byte-identical to the python pack (tests/test_pallas_fused.py);
    returns None when the native library is unavailable or any entry's
    field arrays are not plain contiguous numpy."""
    import ctypes

    from ..native import get_lib
    lib = get_lib()
    if lib is None:
        return NotImplemented   # python fallback
    n = len(fczs)

    def cptr(arrs, dtype):
        ptrs = (ctypes.c_void_p * n)()
        keep = []
        for i, a in enumerate(arrs):
            a = np.ascontiguousarray(a, dtype)
            keep.append(a)
            ptrs[i] = a.ctypes.data
        return ptrs, keep

    try:
        nres = np.array([f.n_residue for f in fczs], np.int32)
        na = np.array([f.n_anchor for f in fczs], np.int32)
        n_scs = np.array([len(f.sc_codes) for f in fczs], np.int32)
        tfmin = np.array([f.tf_min for f in fczs], F32)
        tfcont = np.array([f.tf_cont for f in fczs], F32)
        recs, k1 = cptr([f.records for f in fczs], np.uint8)
        scs, k2 = cptr([f.sc_codes for f in fczs], np.uint8)
        aidx, k3 = cptr([f.anchor_indices for f in fczs], np.int32)
        axyz, k4 = cptr([f.anchor_coords for f in fczs], F32)
        mins6, k5 = cptr([f.mins for f in fczs], F32)
        cont6, k6 = cptr([f.cont_fs for f in fczs], F32)
        tfc, k7 = cptr([f.tf_codes for f in fczs], np.uint8)
    except (ValueError, TypeError):
        return NotImplemented   # python fallback

    r_tot = int(nres.sum(dtype=np.int64))
    nl = int((na.astype(np.int64) - 1).sum())
    nlp = _round_up(nl, LANE_PAD)
    seg_max = int(lib.fcz_pack_seg_max(n, nres, na, aidx))
    seg_pad = _round_up(seg_max, seg_bucket)

    seg_records = np.empty((8, seg_pad, nlp), np.uint8)
    sc_seg = np.empty((seg_pad, 11, nlp), np.uint8)
    mins_lane = np.empty((nlp, 6), F32)
    cont_lane = np.empty((nlp, 6), F32)
    fwd9 = np.empty((9, nlp), F32)
    rev9 = np.empty((9, nlp), F32)
    is_first = np.empty(nlp, bool)
    seg_m = np.empty(nlp, I32)
    res_code = np.empty(r_tot, I32)
    temp = np.empty(r_tot, F32)
    lane_of = np.empty(r_tot, I32)
    rec_of = np.empty(r_tot, I32)

    if max_seg is not None and seg_max > max_seg:
        return None             # caller falls back to the XLA-grid pack
    got = lib.fcz_pack_lanes(
        n, nres, na, recs, scs, n_scs, aidx, axyz, mins6, cont6,
        tfmin, tfcont, tfc, nlp, seg_pad, r_tot,
        seg_records.reshape(-1), sc_seg.reshape(-1),
        mins_lane.reshape(-1), cont_lane.reshape(-1),
        fwd9.reshape(-1), rev9.reshape(-1),
        is_first.view(np.uint8), seg_m,
        res_code, temp, lane_of, rec_of)
    if got != nl:
        return NotImplemented   # python fallback

    metas = []
    base = 0
    for f in fczs:
        lo, hi = base, base + f.n_residue
        metas.append(SegDecodeMeta(
            n_residue=f.n_residue, idx_residue=f.idx_residue,
            idx_atom=f.idx_atom, chain=f.chain, title=f.title,
            first_residue=f.first_residue, last_residue=f.last_residue,
            has_oxt=f.has_oxt, oxt_coords=np.asarray(f.oxt_coords, F32),
            res_code=res_code[lo:hi], temp=temp[lo:hi],
            lane_of=lane_of[lo:hi], rec_of=rec_of[lo:hi], res_base=lo))
        base = hi
    arrays = dict(seg_records=seg_records, mins_lane=mins_lane,
                  cont_lane=cont_lane, sc_codes_seg=sc_seg,
                  fwd9=fwd9, rev9=rev9, is_first=is_first, seg_m=seg_m,
                  nl_out=_round_up(nl, 512))
    return arrays, metas


def pack_decode_batch_lanes(fczs, seg_bucket: int = 8,
                            native: bool = True,
                            max_seg: int | None = None):
    """List[FczData] -> RAGGED-lane device arrays for the fused decode.

    Unlike pack_decode_batch_seg's [B, S_max] lane grid, lanes here exist
    only for REAL segments (NL = sum(s_i), padded to the fused kernel's
    1024-lane quantum). Protein-level lane padding disappears — on mixed
    corpora the [b, s_pad] grid pads every short protein to the longest
    protein's segment count — and the decode output needs NO residue
    gather on device: the fused epilogue transposes to per-lane rows
    [NL, SEG, 42] and the host row-gathers each protein's residues
    ((lane_of, rec_of) fancy-index, one contiguous 84 B row per residue).

    Per-lane anchors replace the [B, S+1, 3, 3] anchor block: fwd9/rev9
    are the segment's own start/end anchor triples (9 components,
    atom-major), and `is_first` marks each protein's first segment so the
    refine reseed can shift tails by ONE lane (segment s's seed is
    segment s-1's blended tail, foldcomp.cpp:849-857) with a plain roll.

    When the native library is available the fill runs as ONE GIL-free
    C call (native/fccodec.c fcz_pack_lanes) writing the device layouts
    directly — the python pack's ~3.3 Mres/s/thread was the healthy-link
    e2e ceiling (VERDICT r3 #5).
    """
    if native:
        got = _pack_lanes_native(fczs, seg_bucket, max_seg=max_seg)
        if got is not NotImplemented:
            return got
    b = len(fczs)
    nres = np.array([f.n_residue for f in fczs], np.int64)
    rec_base = np.zeros(b + 1, np.int64)
    np.cumsum(nres, out=rec_base[1:])
    r_tot = int(rec_base[-1])

    na = np.array([f.n_anchor for f in fczs], np.int64)
    anchors_all = np.concatenate(
        [np.asarray(f.anchor_indices, np.int64) for f in fczs])
    acoords_all = np.concatenate(
        [np.asarray(f.anchor_coords, F32).reshape(-1, 9) for f in fczs])
    ab = np.cumsum(na)
    s_i = na - 1
    seg_ord = _ragged_arange(s_i)
    first_idx = np.repeat(ab - na, s_i) + seg_ord
    a0 = anchors_all[first_idx]
    a1 = anchors_all[first_idx + 1]
    nres_rep = np.repeat(nres, s_i)
    first = np.minimum(a0, nres_rep - 1)
    is_last = seg_ord == np.repeat(s_i - 1, s_i)
    counts_g = np.maximum(
        np.where(is_last, nres_rep - first,
                 np.minimum(a1 + 1, nres_rep - 1) - first), 1)

    nl = int(s_i.sum())
    if max_seg is not None and int(counts_g.max()) > max_seg:
        return None             # caller falls back to the XLA-grid pack
    nlp = _round_up(nl, LANE_PAD)
    seg_pad = _round_up(int(counts_g.max()), seg_bucket)
    ar = np.arange(seg_pad)
    records_all = np.concatenate(
        [np.asarray(f.records, np.uint8).reshape(-1, 8) for f in fczs])

    # global per-residue side-chain slot scatter (see pack_decode_batch_seg)
    res_code_all = unpack_records(records_all)[0].astype(np.int32)
    counts_sc = np.where(res_code_all < NUM_AA,
                         N_SC_TORSION[res_code_all], 0).astype(np.int64)
    totals = np.add.reduceat(counts_sc, rec_base[:-1]) if r_tot else \
        np.zeros(b, np.int64)
    sc_res_all = np.zeros((r_tot, 12), np.uint8)
    tot = int(counts_sc.sum())
    if tot:
        stream = np.concatenate(
            [np.asarray(f.sc_codes[:t], np.uint8)
             for f, t in zip(fczs, totals)])
        res_of = np.repeat(_arange(r_tot), counts_sc)
        ends = np.cumsum(counts_sc)
        within = _arange(tot) - np.repeat(ends - counts_sc, counts_sc)
        sc_res_all.reshape(-1)[res_of * 12 + within] = stream

    # dense ragged lanes: global record-row window per segment
    starts_g = first + np.repeat(rec_base[:-1], s_i)
    last_g = np.repeat(rec_base[1:] - 1, s_i)
    idx = np.minimum(starts_g[:, None] + ar[None, :], last_g[:, None])

    seg_records = np.zeros((nlp, seg_pad, 8), np.uint8)
    seg_records.view(np.uint64)[:nl, :, 0] = \
        records_all.view(np.uint64)[:, 0][idx]
    sc_seg12 = np.zeros((nlp, seg_pad, 12), np.uint8)
    sc_seg12.view(np.uint32)[:nl] = sc_res_all.view(np.uint32)[idx]
    sc_seg = sc_seg12[:, :, :11]
    seg_m = np.ones(nlp, I32)
    seg_m[:nl] = counts_g

    mins_lane = np.zeros((nlp, 6), F32)
    cont_lane = np.zeros((nlp, 6), F32)
    mins_lane[:nl] = np.repeat(np.stack([f.mins for f in fczs])
                               .astype(F32), s_i, axis=0)
    cont_lane[:nl] = np.repeat(np.stack([f.cont_fs for f in fczs])
                               .astype(F32), s_i, axis=0)

    fwd9 = np.zeros((9, nlp), F32)
    rev9 = np.zeros((9, nlp), F32)
    fwd9[:, :nl] = acoords_all[first_idx].T
    rev9[:, :nl] = acoords_all[first_idx + 1].T
    is_first = np.ones(nlp, bool)          # pad lanes keep their own seed
    is_first[:nl] = seg_ord == 0

    # stitch: residue r owned by the last segment starting <= r
    r_g = _arange(r_tot)
    lane_of_g = np.searchsorted(starts_g, r_g, side="right") - 1
    rec_of_g = np.clip(r_g - starts_g[lane_of_g], 0, seg_pad - 1)

    tf_all = np.concatenate(
        [np.asarray(f.tf_codes, np.uint8) for f in fczs]).astype(F32)
    temp_all = (tf_all
                * np.repeat(np.array([f.tf_cont for f in fczs], F32), nres)
                + np.repeat(np.array([f.tf_min for f in fczs], F32),
                            nres)).astype(F32)

    metas = []
    for i, f in enumerate(fczs):
        lo, hi = int(rec_base[i]), int(rec_base[i + 1])
        metas.append(SegDecodeMeta(
            n_residue=f.n_residue, idx_residue=f.idx_residue,
            idx_atom=f.idx_atom, chain=f.chain, title=f.title,
            first_residue=f.first_residue, last_residue=f.last_residue,
            has_oxt=f.has_oxt, oxt_coords=np.asarray(f.oxt_coords, F32),
            res_code=res_code_all[lo:hi], temp=temp_all[lo:hi],
            lane_of=lane_of_g[lo:hi], rec_of=rec_of_g[lo:hi],
            res_base=lo))

    arrays = dict(
        seg_records=np.ascontiguousarray(seg_records.transpose(2, 1, 0)),
        mins_lane=mins_lane, cont_lane=cont_lane,
        sc_codes_seg=np.ascontiguousarray(sc_seg.transpose(1, 2, 0)),
        fwd9=fwd9, rev9=rev9, is_first=is_first, seg_m=seg_m,
        nl_out=_round_up(nl, 512))   # static D2H lane-slice quantum
    return arrays, metas


def use_fused_decode() -> bool:
    """True when the fused Pallas decode path is active (accelerator
    backend + not disabled); decides the pack form."""
    import os

    import jax
    if os.environ.get("FOLDCOMP_TPU_FUSED", "1") == "0":
        return False
    if os.environ.get("FOLDCOMP_TPU_NERF", "assoc") != "assoc":
        return False
    if os.environ.get("FOLDCOMP_TPU_COMPACT", "1") == "0":
        return False
    return jax.default_backend() != "cpu"


def seg_sort_key(f):
    """Decode-batch sort key: (segment-width bucket, residue count).

    The reference's anchor spacing (_setAnchor, foldcomp.cpp:745-761)
    floors the interval, so the LAST segment absorbs the remainder and
    can be up to 2*interval-1 (47) records wide while every other
    segment is ~25 — and the batch window width is the max over all
    lanes. Sorting by length alone mixes 24-wide and 48-wide proteins
    in one batch, padding every lane to 48 (measured 2.0x lane-residue
    overhead on an AFDB-like corpus); grouping by width bucket first
    recovers ~23% mixed-corpus decode throughput (87 -> 107M res/s,
    bench_device_decode_mixed)."""
    a = np.asarray(f.anchor_indices)
    w = int((a[1:] - a[:-1]).max()) + 1 if len(a) > 1 else f.n_residue
    return ((w + 7) // 8 * 8, f.n_residue)


def use_fused_encode() -> str:
    """Fused Pallas encode mode: "" (off — XLA core), "compiled"
    (accelerator backend), or "interpret" (forced via
    FOLDCOMP_TPU_FUSED_ENC=interpret — CPU parity testing).

    Mirrors use_fused_decode: active by default on an accelerator when
    the compact integer wire is on (the fused prologue is defined on the
    int millicoordinate form only)."""
    import os

    import jax
    mode = os.environ.get("FOLDCOMP_TPU_FUSED_ENC", "1")
    if mode == "0":
        return ""
    if os.environ.get("FOLDCOMP_TPU_COMPACT", "1") == "0":
        return ""
    if mode == "interpret":
        return "interpret"
    return "compiled" if jax.default_backend() != "cpu" else ""


def split_lanes_classes(arrays, metas, seg_bucket: int = 8,
                        max_classes: int = 4, min_save: float = 0.15):
    """Width-classed re-layout of the ragged-lane arrays.

    The reference's floored anchor interval hands each protein ONE tail
    segment up to 2x wider than its others (_setAnchor,
    foldcomp.cpp:745-761); in a single rectangular lane array that tail
    drags every normal-width lane of the batch to the widest SEG —
    measured 1.7x lane-residue padding on an AFDB-like corpus even
    with width-bucket batching. Here lanes are permuted into width
    CLASSES (each a contiguous range, its own SEG); the re-seed
    coupling becomes an explicit prev-lane index
    (kernels/pallas_decode.decode_seg_fused_classes), and the host
    stitch indices are rewritten to FLAT row numbers over the
    concatenated class outputs (lane_of = row, rec_of = 0, so
    _gather_a14's lane_of*segw+rec_of works verbatim with segw=1).
    Per-lane math is identical — coordinates are bit-equal to the
    single-class path.

    Returns (class_arrays, new_metas) or None when classing buys less
    than min_save of the padded lane-residues (single width class,
    near-uniform corpus, tiny batch)."""
    import dataclasses

    seg_m = np.asarray(arrays["seg_m"])
    real = [m for m in metas if m.n_residue]
    if not real:
        return None
    nl = max(int(np.max(m.lane_of)) for m in real) + 1
    w = seg_m[:nl]
    segpad = int(arrays["seg_records"].shape[1])
    bucket = seg_bucket
    while True:
        cw = np.minimum((w + bucket - 1) // bucket * bucket, segpad)
        widths = np.unique(cw)
        if len(widths) <= max_classes:
            break
        bucket *= 2
    if len(widths) < 2:
        return None
    padded_single = segpad * _round_up(nl, LANE_PAD)

    def _lane_pad(c):
        return _round_up(c, 512) if c <= 512 else _round_up(c, LANE_PAD)

    padded_cls = sum(
        int(v) * _lane_pad(int((cw == v).sum())) for v in widths)
    if padded_cls > (1.0 - min_save) * padded_single:
        return None

    recs = np.asarray(arrays["seg_records"])
    scs = np.asarray(arrays["sc_codes_seg"])
    mins = np.asarray(arrays["mins_lane"])
    cont = np.asarray(arrays["cont_lane"])
    fwd = np.asarray(arrays["fwd9"])
    rev = np.asarray(arrays["rev9"])
    isf = np.asarray(arrays["is_first"])

    cls_of = np.searchsorted(widths, cw)
    order = np.argsort(cls_of, kind="stable")
    newpos = np.empty(nl, np.int64)
    cls = dict(recs=[], mins=[], cont=[], sct=[], fwd=[], rev=[],
               isf=[], segm=[])
    bases, rowbase, nl_outs, segws = [], [], [], []
    base = rows = 0
    for ci, v in enumerate(widths):
        idx = order[cls_of[order] == ci]
        n_c = len(idx)
        # small classes run a half-width lane group (g=4, 512-lane
        # quantum — decode_seg_fused_classes derives g from the padded
        # shape) so the per-class grid rounding stops costing up to
        # 1023 pad lanes each
        nlp_c = _round_up(n_c, 512) if n_c <= 512 \
            else _round_up(n_c, LANE_PAD)
        segw = int(v)
        r8 = np.zeros((8, segw, nlp_c), np.uint8)
        r8[:, :, :n_c] = recs[:, :segw][:, :, idx]
        sc = np.zeros((segw, 11, nlp_c), np.uint8)
        sc[:, :, :n_c] = scs[:segw][:, :, idx]
        mi = np.zeros((nlp_c, 6), F32)
        mi[:n_c] = mins[idx]
        co = np.zeros((nlp_c, 6), F32)
        co[:n_c] = cont[idx]
        f9 = np.zeros((9, nlp_c), F32)
        f9[:, :n_c] = fwd[:, idx]
        r9 = np.zeros((9, nlp_c), F32)
        r9[:, :n_c] = rev[:, idx]
        fi = np.ones(nlp_c, isf.dtype)
        fi[:n_c] = isf[idx]
        sm = np.ones(nlp_c, I32)
        sm[:n_c] = seg_m[idx]
        newpos[idx] = base + np.arange(n_c)
        nl_out_c = min(_round_up(n_c, 512), nlp_c)
        for k, a in (("recs", r8), ("mins", mi), ("cont", co),
                     ("sct", sc), ("fwd", f9), ("rev", r9),
                     ("isf", fi), ("segm", sm)):
            cls[k].append(a)
        bases.append(base)
        rowbase.append(rows)
        nl_outs.append(nl_out_c)
        segws.append(segw)
        base += nlp_c
        rows += nl_out_c * segw

    prev = np.arange(base, dtype=np.int32)
    orig = np.arange(nl)
    has_prev = (~isf[:nl].astype(bool)) & (orig > 0)
    prev[newpos[has_prev]] = newpos[orig[has_prev] - 1]

    base_a = np.asarray(bases)
    rowb_a = np.asarray(rowbase)
    segw_a = np.asarray(segws)
    new_metas = []
    for m in metas:
        li = np.asarray(m.lane_of)
        c = cls_of[li]
        row = rowb_a[c] + (newpos[li] - base_a[c]) * segw_a[c] \
            + np.asarray(m.rec_of)
        new_metas.append(dataclasses.replace(
            m, lane_of=row, rec_of=np.zeros_like(row)))
    class_arrays = dict(
        classes={k: tuple(v) for k, v in cls.items()},
        prev_idx=prev, nl_outs=tuple(int(x) for x in nl_outs))
    return class_arrays, new_metas


def use_wclass() -> str:
    """Width-classed decode mode: "1" always, "0" never, "auto"
    (default) only for big batches where the savings gate holds.

    Every class composition is its own jit signature (3 Pallas kernels
    x classes to compile on first touch), so small streamed windows
    would compile-storm through a remote-compile tunnel; auto requires
    >= _WCLASS_MIN_LANES real lanes so the one-time compiles amortize
    and the padding win (measured +19% on an AFDB-like corpus,
    PROFILE.md) is worth taking by default."""
    import os
    v = os.environ.get("FOLDCOMP_TPU_WCLASS", "auto")
    return v if v in ("0", "1") else "auto"


_WCLASS_MIN_LANES = 4096
_WCLASS_MIN_SAVE = 0.2


# below ~this D2H rate the full-atom wire (96 B/res) bounds the e2e
# wall and the host side-chain pass (~0.5 us/res) is cheaper than the
# saved transfer; above it the full wire is effectively free
_BB_WIRE_MAX_MBS = 200.0
_BB_WIRE_MIN_MBS = 5.0


def use_bb_wire() -> bool:
    """bb-only D2H wire: the device ships blended N/CA/C rows
    (~36 B/residue vs 96 for full-atom rows) and the host places O +
    side chains with the native C codec (fcz_place_sc_from_bb — the
    reference float op order, so the side chains land at least as
    close to the exact decoder as the device f32 kernel's).

    FOLDCOMP_TPU_WIRE=bb forces it, =full pins the full wire; unset =
    AUTO from the measured link probe: engage for links in the
    [5, 200) MB/s band where the full-atom wire bounds the e2e wall
    (measured: +10% wall, -37% host CPU on this ~10-40 MB/s tunnel).
    Needs the native library."""
    import os

    from ..native import get_lib
    env = os.environ.get("FOLDCOMP_TPU_WIRE")
    if env == "bb":
        return get_lib() is not None
    if env:                      # "full" or anything else pins full
        return False
    try:
        from ..cli import _probe_info
        result, mbs = _probe_info()
    except Exception:  # noqa: BLE001
        return False
    return result in ("ok", "slow") \
        and _BB_WIRE_MIN_MBS <= mbs < _BB_WIRE_MAX_MBS \
        and get_lib() is not None


def pack_decode_batch_auto(fczs):
    """Backend-matched pack: ragged lanes for the fused decode, the
    [B, S] grid for the XLA cores.

    Falls back to the XLA path when any segment is wider than 96 records
    (a user-raised --break past ~88): the fused backbone kernel's VMEM
    scratch scales with 3*SEG and overflows the 16 MB scoped budget past
    ~96. A/B at --break 80 (seg width 72, round 5): fused compiles,
    holds the 5 mA parity gate, and runs 2x the XLA grid core — the
    fallback only covers the extreme tail of the --break range."""
    if use_fused_decode():
        got = pack_decode_batch_lanes(fczs, max_seg=96)
        if got is not None:
            if use_bb_wire():
                import dataclasses
                arrays, metas = got
                metas = [dataclasses.replace(
                    m, sc_codes=np.asarray(f.sc_codes, np.uint8))
                    for m, f in zip(metas, fczs)]
                return dict(arrays, bb_wire=True), metas
            mode = use_wclass()
            if mode != "0":
                nl_est = sum(f.n_anchor - 1 for f in fczs)
                if mode == "1" or nl_est >= _WCLASS_MIN_LANES:
                    split = split_lanes_classes(
                        *got, min_save=(0.15 if mode == "1"
                                        else _WCLASS_MIN_SAVE))
                    if split is not None:
                        return split
            return got
    return pack_decode_batch_seg(fczs)


def _seg_decode_arrays(arrays, refine_iters=2):
    if "classes" in arrays:       # width-classed ragged lanes
        from ..kernels import aot
        from ..kernels.pallas_decode import decode_seg_fused_classes
        c = arrays["classes"]
        nl_outs = arrays["nl_outs"]
        call = aot.try_classes_call(c, arrays["prev_idx"], refine_iters,
                                    nl_outs)
        if call is not None:
            return call(c["recs"], c["mins"], c["cont"], c["sct"],
                        c["fwd"], c["rev"], c["isf"], c["segm"],
                        arrays["prev_idx"])
        out = decode_seg_fused_classes(
            c["recs"], c["mins"], c["cont"], c["sct"], c["fwd"],
            c["rev"], c["isf"], c["segm"], arrays["prev_idx"],
            refine_iters=refine_iters, nl_outs=nl_outs)
        aot.save_classes_aot(c, arrays["prev_idx"], refine_iters,
                             nl_outs)
        return out
    if "fwd9" in arrays:          # ragged-lane pack -> fused Pallas path
        from ..kernels import aot
        from ..kernels.pallas_decode import decode_seg_fused
        nl_out = arrays.get("nl_out")
        nl_out = int(nl_out) if nl_out is not None else None
        if arrays.get("bb_wire"):
            call = aot.try_bbdec_call(arrays, refine_iters, nl_out)
            if call is not None:
                got = call(*aot._decode_args(arrays))
                # trust only the expected (off, ca) pytree — a stale
                # artifact from an older wire format must not be
                # silently iterated into garbage
                if isinstance(got, (tuple, list)) and len(got) == 2:
                    return ("bb",) + tuple(got)
            out = decode_seg_fused(
                arrays["seg_records"], arrays["mins_lane"],
                arrays["cont_lane"], arrays["sc_codes_seg"],
                arrays["fwd9"], arrays["rev9"], arrays["is_first"],
                arrays["seg_m"], refine_iters=refine_iters,
                nl_out=nl_out, wire="bb")
            aot.save_bbdec_aot(arrays, refine_iters, nl_out)
            return ("bb",) + tuple(out)
        # AOT artifact for this exact signature: skip the ~1.5 s jit
        # trace on fresh processes (kernels/aot.py)
        call = aot.try_decode_call(arrays, refine_iters, nl_out)
        if call is not None:
            return call(*aot._decode_args(arrays))
        out = decode_seg_fused(
            arrays["seg_records"], arrays["mins_lane"],
            arrays["cont_lane"], arrays["sc_codes_seg"], arrays["fwd9"],
            arrays["rev9"], arrays["is_first"], arrays["seg_m"],
            refine_iters=refine_iters, nl_out=nl_out)
        # best-effort background export so the NEXT fresh process can
        # skip the trace too
        aot.save_decode_aot(arrays, refine_iters, nl_out)
        return out
    from ..kernels.decode import decode_seg_batch_core
    return decode_seg_batch_core(
        arrays["seg_records"], arrays["mins_lane"], arrays["cont_lane"],
        arrays["sc_codes_seg"], arrays["anchor_xyz"], arrays["seg_m"],
        refine_iters=refine_iters, res_index=arrays.get("res_index"))


def _outs_to_host(outs):
    """Device decode output -> host arrays (full or compact form)."""
    global DEVICE_WARMED
    if isinstance(outs, tuple) and outs and isinstance(outs[0], str) \
            and outs[0] == "bb":
        res = ("bb", np.asarray(outs[1]), np.asarray(outs[2]))
        DEVICE_WARMED = True
        return res
    if isinstance(outs, tuple) and outs and isinstance(outs[0], tuple):
        # width-classed: concatenate per-class rows into ONE flat row
        # array [rows, 1, 42|3]; the stitch indices are flat rows
        # (split_lanes_classes), so _gather_a14 works with segw == 1
        off = np.concatenate(
            [np.asarray(o).reshape(-1, 42) for o, _ in outs])[:, None]
        ca = np.concatenate(
            [np.asarray(c).reshape(-1, 3) for _, c in outs])[:, None]
        res = (off, ca)
        DEVICE_WARMED = True
        return res
    if isinstance(outs, tuple):
        off, ca = outs
        res = (np.asarray(off), np.asarray(ca))
    else:
        res = np.asarray(outs)
    DEVICE_WARMED = True
    return res


def _gather_a14(outs_np, m):
    """Per-protein [n, 14, 3] atoms from the decode output.

    Residue-space outputs (device-stitched, [R, ...]) slice contiguously
    at m.res_base; segment-space outputs ([N, SEG, ...]) stitch via the
    host residue fancy-index."""
    sl = slice(m.res_base, m.res_base + m.n_residue)
    if isinstance(outs_np, tuple) and isinstance(outs_np[0], str) \
            and outs_np[0] == "bb":
        # bb-only wire: N/C i16 offsets from the f32 CA at a 0.1 mA
        # quantum (finer than the full wire's — frame errors amplify
        # ~5x through the host side-chain placement); dequantize, then
        # O + side chains placed by the native C codec
        from ..native import place_sc_from_bb_native
        _, off, ca = outs_np
        segw = off.shape[1]
        idx = m.lane_of * segw + m.rec_of
        o = off.reshape(-1, 6)[idx].astype(F32) * np.float32(0.0001)
        c = ca.reshape(-1, 3)[idx]
        bb = np.empty((len(idx), 3, 3), np.float32)
        bb[:, 0] = c + o[:, :3]
        bb[:, 1] = c
        bb[:, 2] = c + o[:, 3:]
        out = place_sc_from_bb_native(bb, m.res_code, m.sc_codes,
                                      m.first_residue)
        if out is None:
            raise RuntimeError("bb wire requires the native library")
        return out
    if isinstance(outs_np, tuple):
        off, ca = outs_np
        if off.ndim == 3 and off.shape[2] == 42:
            # ragged-lane rows [NL, SEG, 42] (fused Pallas wire): one
            # contiguous 84 B row per residue; [42] is (k, c)-major so
            # the reshape lands directly on [14, 3]
            segw = off.shape[1]
            idx = m.lane_of * segw + m.rec_of
            rows = off.reshape(-1, 42)[idx].astype(F32)
            crow = ca.reshape(-1, 3)[idx]
            return np.ascontiguousarray(
                crow[:, None, :]
                + rows.reshape(-1, MAX_ATOM, 3) * np.float32(0.001))
        if off.ndim == 3:            # residue space, PLANAR: [3, 14, R]
            # reconstruct + transpose to [n, 14, 3] in one materializing
            # pass (the kernel keeps R in the TPU lane dimension; see
            # kernels/decode.py res_index+compact)
            a = ca[:, None, sl] + off[:, :, sl].astype(F32) \
                * np.float32(0.001)
            return np.ascontiguousarray(np.transpose(a, (2, 1, 0)))
        o = off[m.lane_of, m.rec_of].astype(F32)
        c = ca[m.lane_of, m.rec_of]
        return np.ascontiguousarray(c[:, None, :] + o * np.float32(0.001))
    if outs_np.ndim == 3:            # residue space, full f32
        return np.ascontiguousarray(outs_np[sl])
    return np.ascontiguousarray(outs_np[m.lane_of, m.rec_of])


def _assemble_protein(a14, meta, use_alt_order: bool = False):
    """[n, 14, 3] atoms + SegDecodeMeta -> AtomArray."""
    n = meta.n_residue
    codes = meta.res_code
    names, rnames, chains, ridx, coords, temps = [], [], [], [], [], []
    first_three = three_letter_from_one(meta.first_residue)
    for r in range(n):
        code = int(codes[r])
        rname = first_three if r == 0 else (
            THREE_LETTER[code] if code < len(THREE_LETTER) else "UNK")
        if code < NUM_AA:
            cnt = int(N_ATOMS[code])
            order = list(range(cnt))
            if use_alt_order:
                order = [int(x) for x in ALT_PERM[code, :cnt]]
            names.extend(ATOM_NAMES[code][k] for k in order)
            coords.extend(a14[r, k] for k in order)
        else:
            cnt = 3
            names.extend(("N", "CA", "C"))
            coords.extend(a14[r, k] for k in range(3))
        rnames.extend([rname] * cnt)
        chains.extend([meta.chain] * cnt)
        ridx.extend([meta.idx_residue + r] * cnt)
        temps.extend([meta.temp[r]] * cnt)
    if meta.has_oxt:
        names.append("OXT")
        rnames.append(three_letter_from_one(meta.last_residue))
        chains.append(meta.chain)
        # reference quirk: OXT residue_index = header.nResidue
        # (foldcomp.cpp:962-965)
        ridx.append(n)
        coords.append(meta.oxt_coords)
        temps.append(meta.temp[n - 1])
    n_total = len(names)
    return AtomArray(
        names, rnames, chains,
        np.arange(meta.idx_atom, meta.idx_atom + n_total, dtype=I32),
        np.asarray(ridx, I32), np.asarray(coords, F32),
        np.ones(n_total, F32), np.asarray(temps, F32), meta.title)


def unpack_decode_result(atom14, res_code, temp, metas,
                         use_alt_order: bool = False):
    """Device outputs -> List[AtomArray] (decoder.decode-compatible)."""
    atom14 = np.asarray(atom14)
    res_code = np.asarray(res_code)
    temp = np.asarray(temp)
    out = []
    for i, meta in enumerate(metas):
        n = meta.n_residue
        codes = res_code[i, :n]
        names, rnames, chains, ridx, coords, temps = [], [], [], [], [], []
        first_three = three_letter_from_one(meta.first_residue)
        for r in range(n):
            code = int(codes[r])
            rname = first_three if r == 0 else (
                THREE_LETTER[code] if code < len(THREE_LETTER) else "UNK")
            if code < NUM_AA:
                cnt = int(N_ATOMS[code])
                order = list(range(cnt))
                if use_alt_order:
                    order = [int(x) for x in ALT_PERM[code, :cnt]]
                names.extend(ATOM_NAMES[code][k] for k in order)
                coords.extend(atom14[i, r, k] for k in order)
            else:
                cnt = 3
                names.extend(("N", "CA", "C"))
                coords.extend(atom14[i, r, k] for k in range(3))
            rnames.extend([rname] * cnt)
            chains.extend([meta.chain] * cnt)
            ridx.extend([meta.idx_residue + r] * cnt)
            temps.extend([temp[i, r]] * cnt)
        if meta.has_oxt:
            names.append("OXT")
            rnames.append(three_letter_from_one(meta.last_residue))
            chains.append(meta.chain)
            # reference quirk: OXT residue_index = header.nResidue
            # (foldcomp.cpp:962-965)
            ridx.append(n)
            coords.append(meta.oxt_coords)
            temps.append(temp[i, n - 1])
        n_total = len(names)
        out.append(AtomArray(
            names, rnames, chains,
            np.arange(meta.idx_atom, meta.idx_atom + n_total, dtype=I32),
            np.asarray(ridx, I32), np.asarray(coords, F32),
            np.ones(n_total, F32), np.asarray(temps, F32), meta.title))
    return out


def decode_fcz_batch(fczs, refine_iters: int = 2, use_alt_order: bool = False):
    """Parse payloads through the batched device decoder (segment-space
    core; the residue re-index happens on host)."""
    arrays, metas = pack_decode_batch_auto(fczs)
    outs = _outs_to_host(_seg_decode_arrays(arrays, refine_iters))
    return [_assemble_protein(_gather_a14(outs, m), m, use_alt_order)
            for m in metas]


def decode_fcz_to_pdb_batch(fczs, refine_iters: int = 2,
                            use_alt_order: bool = False):
    """Parse payloads -> device decode -> PDB text, one string per protein.

    When the native formatter is available the atom14 tensors go straight to
    text (no per-atom Python); otherwise falls back through AtomArray.
    """
    arrays, metas = pack_decode_batch_auto(fczs)
    outs = _outs_to_host(_seg_decode_arrays(arrays, refine_iters))

    try:
        from ..native import format_atom14_native, get_lib
        have_native = get_lib() is not None
    except Exception:
        have_native = False

    out = []
    for m in metas:
        a14 = _gather_a14(outs, m)
        if have_native:
            out.append(format_atom14_native(
                a14, m.temp, m.res_code, m.n_residue, m.idx_residue,
                m.idx_atom, m.chain, m.first_residue, m.last_residue,
                m.has_oxt, m.oxt_coords, use_alt_order, m.title))
        else:
            from ..io.pdb import format_pdb
            atoms = _assemble_protein(a14, m, use_alt_order)
            out.append(format_pdb(atoms, m.title))
    return out


def decode_fcz_stream(payload_iter, batch_size: int = 128,
                      refine_iters: int = 2, use_alt_order: bool = False,
                      prefetch: int = 2, bucket_window: int = 4):
    """Pipelined streaming decode: yields (payload, pdb_text) in input order.

    Three overlapped stages — host pack (worker thread), device decode
    (async dispatch), and native text formatting (main thread) — so the
    accelerator never waits on the host between batches.

    Length bucketing: payloads are collected into windows of
    `bucket_window` batches and sorted by residue count inside each window
    before batching, so one long chain no longer pads an entire batch of
    short ones to its length (SURVEY.md §7 ragged-batch plan). Because
    windows are contiguous in arrival order, results can still be yielded
    in exact input order from a reorder buffer bounded by one window.
    `bucket_window=0` disables sorting (arrival-order batches).
    """
    import os as _os
    import queue
    import threading
    from concurrent.futures import ThreadPoolExecutor

    n_workers = max(2, (_os.cpu_count() or 4) - 1)
    pool = ThreadPoolExecutor(n_workers)
    q_packed = queue.Queue(maxsize=prefetch)
    window_len = batch_size * max(bucket_window, 1)

    def emit_window(window, base):
        order = range(len(window)) if bucket_window == 0 else \
            sorted(range(len(window)),
                   key=lambda i: seg_sort_key(window[i]))
        for i0 in range(0, len(window), batch_size):
            sel = list(order)[i0:i0 + batch_size]
            batch = [window[j] for j in sel]
            idxs = [base + j for j in sel]
            if len(batch) < batch_size:
                # pad the partial tail batch to the full batch size by
                # replicating the last payload (results dropped): the
                # batch dim is not jit-static, so a ragged tail would
                # compile a FRESH program per distinct remainder — minutes
                # on a remote-compile TPU service for one stray batch
                pad = batch_size - len(batch)
                batch = batch + [batch[-1]] * pad
                idxs = idxs + [None] * pad
            # pack on the worker pool: the producer thread alone packs at
            # ~3 Mres/s while a fast-link device decodes 20M+ — the
            # bounded q_packed still applies backpressure on the futures
            q_packed.put((idxs, batch,
                          pool.submit(pack_decode_batch_auto, batch)))

    def producer():
        window = []
        base = 0
        for f in payload_iter:
            window.append(f)
            if len(window) >= window_len:
                emit_window(window, base)
                base += len(window)
                window = []
        if window:
            emit_window(window, base)
        q_packed.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    resbuf = {}          # global index -> (payload, text)
    next_out = 0
    pending = None       # (idxs, fczs, metas, host-transfer future)
    # dedicated transfer thread: D2H of batch k overlaps the formatting
    # and writing of earlier batches (the link serializes transfers
    # anyway, so one thread is the right width)
    xfer = ThreadPoolExecutor(1)

    def drain(pend):
        nonlocal next_out
        idxs, fczs, metas, fut = pend
        n_real = sum(1 for gi in idxs if gi is not None)
        for gi, (f, text) in zip(idxs, _format_batch(fczs[:n_real],
                                                     metas[:n_real],
                                                     fut.result(),
                                                     use_alt_order,
                                                     pool=pool)):
            resbuf[gi] = (f, text)
        while next_out in resbuf:
            yield resbuf.pop(next_out)
            next_out += 1

    while True:
        item = q_packed.get()
        if item is None:
            break
        idxs, fczs, packed = item
        arrays, metas = packed.result()
        outs = _seg_decode_arrays(arrays, refine_iters)
        fut = xfer.submit(_outs_to_host, outs)
        # format the PREVIOUS batch while this one runs on device
        if pending is not None:
            yield from drain(pending)
        pending = (idxs, fczs, metas, fut)
    if pending is not None:
        yield from drain(pending)
    assert not resbuf, "reorder buffer not drained"
    t.join()
    pool.shutdown()
    xfer.shutdown()


def _format_batch(fczs, metas, outs, use_alt_order, pool=None):
    outs_np = _outs_to_host(outs)
    try:
        from ..native import format_atom14_native, get_lib
        have_native = get_lib() is not None
    except Exception:
        have_native = False
    if have_native:
        def fmt(m):
            a14 = _gather_a14(outs_np, m)
            return format_atom14_native(
                a14, m.temp, m.res_code, m.n_residue, m.idx_residue,
                m.idx_atom, m.chain, m.first_residue, m.last_residue,
                m.has_oxt, m.oxt_coords, use_alt_order, m.title)

        if pool is not None:
            # the native formatter releases the GIL: fan the batch out
            for f, text in zip(fczs, pool.map(fmt, metas, chunksize=8)):
                yield f, text
        else:
            for f, m in zip(fczs, metas):
                yield f, fmt(m)
    else:
        from ..io.pdb import format_pdb
        for f, m in zip(fczs, metas):
            atoms = _assemble_protein(_gather_a14(outs_np, m), m,
                                      use_alt_order)
            yield f, format_pdb(atoms, m.title)


# ---------------------------------------------------------------------------
# Encode batching
# ---------------------------------------------------------------------------

# FixedAngleDiscretizer(255) factor, computed in f32 like discretizer.h:89
_SC_DISC_F = np.float32(np.float32(255.0) / np.float32(360.0))


def _host_cos(inner, denom2):
    """cos_t = (float)(inner / sqrt((double)(s1*s2))) — the reference's
    double-promoted division (torsion_angle.cpp:63, float3d.h:36-44)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        return (inner.astype(np.float64)
                / np.sqrt(denom2.astype(np.float64))).astype(F32)


def _host_dihedral(inner, denom2, det):
    """Finish a dihedral from f32 parts with the reference's f64 acos and
    NaN guard (torsion_angle.cpp:64-96)."""
    cos_t = _host_cos(inner, denom2)
    with np.errstate(invalid="ignore"):
        ang = (np.arccos(cos_t.astype(np.float64))
               * (180.0 / np.pi)).astype(F32)
    nanm = np.isnan(ang)
    ang = np.where(nanm, np.where(cos_t < 0, F32(180.0), F32(0.0)), ang)
    return np.where(det < 0, -ang, ang).astype(F32)


def _host_bond(inner, denom2):
    """float3d::angle tail: f64 acos, NO NaN guard (NaN propagates)."""
    cos_t = _host_cos(inner, denom2)
    with np.errstate(invalid="ignore"):
        return (np.arccos(cos_t.astype(np.float64))
                * (180.0 / np.pi)).astype(F32)


def _host_quant_round(v, mask, nbin):
    """Reference Discretizer fit + rounding discretize over axis 0.

    v [K, B] f32; disc_f/cont_f in f32 (discretizer.cpp:36-41), the +0.5
    added in double before truncation (discretizer.cpp:49)."""
    vmin = np.where(mask, v, np.float32(np.inf)).min(axis=0).astype(F32)
    vmax = np.where(mask, v, np.float32(-np.inf)).max(axis=0).astype(F32)
    rng = (vmax - vmin).astype(F32)
    with np.errstate(divide="ignore", invalid="ignore"):
        disc_f = (np.float32(nbin) / rng).astype(F32)
        cont_f = (rng / np.float32(nbin)).astype(F32)
        t = ((v - vmin[None, :]) * disc_f[None, :]).astype(F32) \
            .astype(np.float64) + 0.5
    # NaN: rng=0 constant-stream parity (discretizer.cpp UB cast -> 0 on
    # x86, see exact.Discretizer.discretize). inf: only on MASKED padded
    # positions (v outside [vmin, vmax] can't happen for real lanes);
    # zero them so the u32 cast is warning-clean — masked codes are never
    # read downstream (VERDICT r3 #8)
    t = np.where(~np.isfinite(t) | (t < 0), 0.0, t)
    return t.astype(np.uint32), vmin, cont_f


def _np_dihedral_parts(px, py, pz):
    """Backbone dihedral parts in numpy f32, one op per rounding step —
    bit-identical to the locally built C (no fma contraction; see
    encode_sc_q_core's docstring for why this cannot run under XLA).
    px/py/pz: [3L, B]; returns (inner, denom2, det) each [3L-3, B]."""
    d_x = px[1:] - px[:-1]
    d_y = py[1:] - py[:-1]
    d_z = pz[1:] - pz[:-1]
    d1x, d1y, d1z = d_x[:-2], d_y[:-2], d_z[:-2]
    d2x, d2y, d2z = d_x[1:-1], d_y[1:-1], d_z[1:-1]
    d3x, d3y, d3z = d_x[2:], d_y[2:], d_z[2:]
    u1x = d1y * d2z - d2y * d1z
    u1y = d1z * d2x - d2z * d1x
    u1z = d1x * d2y - d2x * d1y
    u2x = d2y * d3z - d3y * d2z
    u2y = d2z * d3x - d3z * d2x
    u2z = d2x * d3y - d3x * d2y
    inner = (u1x * u2x) + (u1y * u2y) + (u1z * u2z)
    s1 = u1x * u1x + u1y * u1y + u1z * u1z
    s2 = u2x * u2x + u2y * u2y + u2z * u2z
    pbx = u2y * d2z - d2y * u2z
    pby = u2z * d2x - d2z * u2x
    pbz = u2x * d2y - d2x * u2y
    det = (u1x * pbx) + (u1y * pby) + (u1z * pbz)
    return inner, s1 * s2, det


def _np_bond_parts(px, py, pz):
    """Bond-angle parts in numpy f32 (float3d.h:36-44 rounding order).
    px/py/pz: [3L, B]; returns (inner, s1*s2) each [3L-2, B]."""
    ax, ay, az = px[:-2], py[:-2], pz[:-2]
    bx, by, bz = px[1:-1], py[1:-1], pz[1:-1]
    cx, cy, cz = px[2:], py[2:], pz[2:]
    d1x, d1y, d1z = ax - bx, ay - by, az - bz
    d2x, d2y, d2z = cx - bx, cy - by, cz - bz
    inner = (d1x * d2x) + (d1y * d2y) + (d1z * d2z)
    s1 = d1x * d1x + d1y * d1y + d1z * d1z
    s2 = d2x * d2x + d2y * d2y + d2z * d2z
    return inner, s1 * s2


def _exact_sc_t(p0, p1, p2, p3):
    """Exact host recompute of flagged side-chain values: f32 dihedral
    parts with C op ordering + f64 acos tail, scaled to the 255-bin
    truncation domain. p0..p3: [M, 3] f32."""
    d1x, d1y, d1z = p1[:, 0] - p0[:, 0], p1[:, 1] - p0[:, 1], \
        p1[:, 2] - p0[:, 2]
    d2x, d2y, d2z = p2[:, 0] - p1[:, 0], p2[:, 1] - p1[:, 1], \
        p2[:, 2] - p1[:, 2]
    d3x, d3y, d3z = p3[:, 0] - p2[:, 0], p3[:, 1] - p2[:, 1], \
        p3[:, 2] - p2[:, 2]
    u1x = d1y * d2z - d2y * d1z
    u1y = d1z * d2x - d2z * d1x
    u1z = d1x * d2y - d2x * d1y
    u2x = d2y * d3z - d3y * d2z
    u2y = d2z * d3x - d3z * d2x
    u2z = d2x * d3y - d3x * d2y
    inner = (u1x * u2x) + (u1y * u2y) + (u1z * u2z)
    s1 = u1x * u1x + u1y * u1y + u1z * u1z
    s2 = u2x * u2x + u2y * u2y + u2z * u2z
    pbx = u2y * d2z - d2y * u2z
    pby = u2z * d2x - d2z * u2x
    pbz = u2x * d2y - d2x * u2y
    det = (u1x * pbx) + (u1y * pby) + (u1z * pbz)
    ang = _host_dihedral(inner, s1 * s2, det)
    return ((ang + np.float32(180.0)) * _SC_DISC_F).astype(F32)


# header stream order (foldcomp.cpp:508-519): bit s of the device flag /
# candidate bitmaps <-> stream s here. Dihedral streams use 4-atom windows
# starting at flat backbone row 3*i + off; bond streams 3-atom windows.
_STREAMS = (
    ("d", 2, 2 ** 12 - 1),   # phi_i   = tors[3i+2]
    ("d", 0, 2 ** 12 - 1),   # psi_i   = tors[3i]
    ("d", 1, 2 ** 11 - 1),   # omega_i = tors[3i+1]
    ("b", 3, 2 ** 8 - 1),    # n_ca_c_i = angs[3i+3]
    ("b", 1, 2 ** 8 - 1),    # ca_c_n_i = angs[3i+1]
    ("b", 2, 2 ** 8 - 1),    # c_n_ca_i = angs[3i+2]
)


def _exact_stream_values(bb, bs, ls, ss):
    """Exact (reference-bit) stream values for selected rows.

    bb f32 [B, L, 3, 3]; bs/ls/ss: selected (protein, residue, stream)
    triples. Gathers the 3- or 4-atom windows and finishes with the C op
    ordering + f64 acos — identical results to the full-stream numpy path
    (_np_dihedral_parts/_np_bond_parts + _host_dihedral/_host_bond)."""
    out = np.zeros(len(bs), F32)
    flat = bb.reshape(bb.shape[0], -1, 3)            # [B, 3L, 3]
    kinds = np.array([0 if _STREAMS[s][0] == "d" else 1
                      for s in range(6)])[ss]
    offs = np.array([_STREAMS[s][1] for s in range(6)])[ss]
    start = 3 * ls + offs
    for kind in (0, 1):
        m = kinds == kind
        if not m.any():
            continue
        sb, st = bs[m], start[m]
        p = [flat[sb, st + j] for j in range(4 if kind == 0 else 3)]
        if kind == 0:
            inner, denom2, det = _np_dihedral_parts_rows(*p)
            out[m] = _host_dihedral(inner, denom2, det)
        else:
            inner, denom2 = _np_bond_parts_rows(*p)
            out[m] = _host_bond(inner, denom2)
    return out


def _np_dihedral_parts_rows(p0, p1, p2, p3):
    """_np_dihedral_parts for gathered [M, 3] windows (same op order)."""
    d1 = (p1 - p0).T
    d2 = (p2 - p1).T
    d3 = (p3 - p2).T
    u1x = d1[1] * d2[2] - d2[1] * d1[2]
    u1y = d1[2] * d2[0] - d2[2] * d1[0]
    u1z = d1[0] * d2[1] - d2[0] * d1[1]
    u2x = d2[1] * d3[2] - d3[1] * d2[2]
    u2y = d2[2] * d3[0] - d3[2] * d2[0]
    u2z = d2[0] * d3[1] - d3[0] * d2[1]
    inner = (u1x * u2x) + (u1y * u2y) + (u1z * u2z)
    s1 = u1x * u1x + u1y * u1y + u1z * u1z
    s2 = u2x * u2x + u2y * u2y + u2z * u2z
    pbx = u2y * d2[2] - d2[1] * u2z
    pby = u2z * d2[0] - d2[2] * u2x
    pbz = u2x * d2[1] - d2[0] * u2y
    det = (u1x * pbx) + (u1y * pby) + (u1z * pbz)
    return inner, s1 * s2, det


def _np_bond_parts_rows(a, b, c):
    """_np_bond_parts for gathered [M, 3] windows (same op order)."""
    d1 = (a - b).T
    d2 = (c - b).T
    inner = (d1[0] * d2[0]) + (d1[1] * d2[1]) + (d1[2] * d2[2])
    s1 = d1[0] * d1[0] + d1[1] * d1[1] + d1[2] * d1[2]
    s2 = d2[0] * d2[0] + d2[1] * d2[1] + d2[2] * d2[2]
    return inner, s1 * s2


def _host_quant_one(v, vmin, disc_f):
    """Single-value reference discretize (discretizer.cpp:43-53)."""
    t = ((v - vmin) * disc_f).astype(F32).astype(np.float64) + 0.5
    t = np.where(np.isnan(t) | (t < 0), 0.0, t)
    return t.astype(np.uint32)


def finish_encode_device(parts, atom14, res_code, tf_ca, res_mask):
    """Sparse host finishing for the full-device parity encode.

    The device produced every record/sc/tf bin plus rescue metadata
    (kernels/encode.py encode_parity_core). Host work is O(B + flagged):

    1. exact quantizer extremes: recompute the device-flagged min/max
       candidate rows with reference-bit math, scatter-min/max into
       per-(protein, stream) vmin/vmax, derive disc_f/cont_f (the header
       floats must be exact, so they are ALWAYS host-derived);
    2. rescue flagged bins: exact value + exact params -> exact code,
       patched into the device records (unpack/patch/repack of only the
       affected rows);
    3. side-chain rescue + tempFactors exactly as finish_encode_host
       (tf inputs are exact f32s, so its min/max need no candidates).

    Proteins with n_res < 4 route through the full-host path — the
    degenerate-stream semantics (empty masks, inf ranges) are not worth
    replicating on device."""
    atom14 = np.asarray(atom14, F32)
    bb = atom14[:, :, :3]
    res_code = np.asarray(res_code)
    tf_ca = np.asarray(tf_ca, F32)
    res_mask = np.asarray(res_mask, bool)
    b, l = res_code.shape
    n_res = res_mask.sum(axis=1).astype(np.int64)

    small = n_res < 4
    records = np.asarray(parts["records"], np.uint8).copy()
    bb_flags = np.asarray(parts["bb_flags"])
    cand_bits = np.asarray(parts["cand_bits"])

    # 1. exact extremes from the candidate sets
    vmin = np.full((b, 6), np.inf, F32)
    vmax = np.full((b, 6), -np.inf, F32)
    cm = ((cand_bits[:, :, None] >> np.arange(6)) & 1) > 0     # [B, L, 6]
    cx = ((cand_bits[:, :, None] >> (np.arange(6) + 8)) & 1) > 0
    anym = cm | cx
    if anym.any():
        bs, ls, ss = np.nonzero(anym)
        vals = _exact_stream_values(bb, bs, ls, ss)
        sel_min = cm[bs, ls, ss]
        np.minimum.at(vmin, (bs[sel_min], ss[sel_min]), vals[sel_min])
        sel_max = cx[bs, ls, ss]
        np.maximum.at(vmax, (bs[sel_max], ss[sel_max]), vals[sel_max])
    nbins = np.array([s[2] for s in _STREAMS], F32)
    with np.errstate(divide="ignore", invalid="ignore"):
        rng = (vmax - vmin).astype(F32)
        disc_f = (nbins[None, :] / rng).astype(F32)
        cont_f = (rng / nbins[None, :]).astype(F32)

    # 2. rescue flagged bins into the records
    fl = ((bb_flags[:, :, None] >> np.arange(6)) & 1) > 0      # [B, L, 6]
    # only rows the serializer emits matter (i < n_res - 1)
    fl &= (np.arange(l)[None, :, None] < (n_res[:, None, None] - 1))
    fl &= ~small[:, None, None]
    if fl.any():
        from .fcz import pack_records as _pack_np
        from .fcz import unpack_records as _unpack_np
        bs, ls, ss = np.nonzero(fl)
        vals = _exact_stream_values(bb, bs, ls, ss)
        q_new = _host_quant_one(vals, vmin[bs, ss], disc_f[bs, ss])
        rows = np.unique(bs * l + ls)
        rb, rl = rows // l, rows % l
        # unpack order == stream-index order shifted by the residue field
        fields = list(_unpack_np(records[rb, rl]))
        pos = np.searchsorted(rows, bs * l + ls)
        for s in range(6):
            m = ss == s
            if m.any():
                fields[1 + s][pos[m]] = q_new[m]
        records[rb, rl] = _pack_np(*fields)

    # 3. side-chain rescue + tempFactors (same as finish_encode_host)
    sc_q = _rescue_sc(parts, atom14, res_code, res_mask)
    tf_q, tf_min, tf_cont = _host_quant_round(tf_ca.T, res_mask.T,
                                              2 ** 8 - 1)
    tf_q = np.where(res_mask, tf_q.T, 0).astype(np.uint8)

    out = dict(records=records, sc_q=sc_q, tf_q=tf_q, mins=vmin,
               cont_fs=cont_f, tf_min=tf_min, tf_cont=tf_cont)

    if small.any():
        idx = np.nonzero(small)[0]
        sub = finish_encode_host(
            dict(sc_q=sc_q[idx], sc_flag_bits=np.zeros((len(idx), l),
                                                       np.uint16)),
            atom14[idx], res_code[idx], tf_ca[idx], res_mask[idx])
        out["records"][idx] = sub["records"]
        out["mins"][idx] = sub["mins"]
        out["cont_fs"][idx] = sub["cont_fs"]
    return out


def _rescue_sc(parts, atom14, res_code, res_mask):
    """Flagged side-chain code rescue (shared with finish_encode_host)."""
    q = np.asarray(parts["sc_q"], np.uint8).copy()   # [B, L, 11]
    fb = np.asarray(parts["sc_flag_bits"])           # u16 [B, L]
    flagged = ((fb[:, :, None] >> np.arange(11)) & 1) > 0
    counts = np.where(res_code < NUM_AA, N_SC_TORSION[res_code], 0)
    emitted = (np.arange(q.shape[2])[None, None, :]
               < counts[:, :, None]) & res_mask[:, :, None]
    flagged &= emitted
    if flagged.any():
        from ..core.aatable import PRED_IDX
        bs, ls, ks = np.nonzero(flagged)
        codes = np.clip(res_code[bs, ls], 0, 23)
        preds = np.asarray(PRED_IDX)[codes, ks + 3]
        p0 = atom14[bs, ls, preds[:, 0]]
        p1 = atom14[bs, ls, preds[:, 1]]
        p2 = atom14[bs, ls, preds[:, 2]]
        p3 = atom14[bs, ls, ks + 3]
        t_new = _exact_sc_t(p0, p1, p2, p3)
        t_new = np.where(np.isnan(t_new) | (t_new < 0),
                         np.float32(0.0), t_new)
        q[bs, ls, ks] = t_new.astype(np.uint32).astype(np.uint8)
    return q


def finish_encode_host(sc_parts, atom14, res_code, tf_ca, res_mask):
    """Host half of the bit-parity batched encode.

    Computes the 6 backbone streams entirely in numpy f32 + the
    reference's f64-promoted acos (bit-identical to the exact path), and
    finishes the device-computed side-chain parts the same way. Returns
    the same dict encode_batch_core produces:
    records/sc_q/tf_q/mins/cont_fs/tf_min/tf_cont.
    """
    from .fcz import pack_records as pack_records_np

    atom14 = np.asarray(atom14, F32)
    bb = atom14[:, :, :3]
    res_code = np.asarray(res_code)
    tf_ca = np.asarray(tf_ca, F32)
    res_mask = np.asarray(res_mask, bool)
    b, l = res_code.shape
    n_res = res_mask.sum(axis=1).astype(np.int64)

    flat = np.transpose(bb.reshape(b, 3 * l, 3), (1, 2, 0))  # [3L, 3, B]
    fx, fy, fz = flat[:, 0], flat[:, 1], flat[:, 2]
    t_inner, t_denom2, t_det = _np_dihedral_parts(fx, fy, fz)
    a_inner, a_denom2 = _np_bond_parts(fx, fy, fz)

    tors = _host_dihedral(t_inner, t_denom2, t_det)        # [3L-3, B]
    psi, omega, phi = tors[0::3], tors[1::3], tors[2::3]
    angs = _host_bond(a_inner, a_denom2)
    ca_c_n, c_n_ca, n_ca_c = angs[1::3], angs[2::3], angs[3::3]

    i = np.arange(l - 1, dtype=np.int64)[:, None]
    amask = i < (n_res[None, :] - 1)                       # [L-1, B]

    def q6(v, nbin):
        return _host_quant_round(v, amask[:v.shape[0]], nbin)

    phi_q, phi_min, phi_cf = q6(phi, 2 ** 12 - 1)
    psi_q, psi_min, psi_cf = q6(psi, 2 ** 12 - 1)
    om_q, om_min, om_cf = q6(omega, 2 ** 11 - 1)
    ncac_q, ncac_min, ncac_cf = q6(n_ca_c, 2 ** 8 - 1)
    cacn_q, cacn_min, cacn_cf = q6(ca_c_n, 2 ** 8 - 1)
    cnca_q, cnca_min, cnca_cf = q6(c_n_ca, 2 ** 8 - 1)

    amask_l = np.arange(l)[None, :] < (n_res[:, None] - 1)  # [B, L]

    def to_bl(q):
        out = np.zeros((b, l), np.uint32)
        out[:, :q.shape[0]] = q.T
        return np.where(amask_l, out, 0)

    residue = np.where(res_mask, res_code, 0).astype(np.uint32)
    records = pack_records_np(
        residue.reshape(-1), to_bl(phi_q).reshape(-1),
        to_bl(psi_q).reshape(-1), to_bl(om_q).reshape(-1),
        to_bl(ncac_q).reshape(-1), to_bl(cacn_q).reshape(-1),
        to_bl(cnca_q).reshape(-1)).reshape(b, l, 8)

    # Side chains: the device quantized them (fixed [-180,180] 255-bin
    # truncating quantizer, foldcomp.cpp:532-538) and flagged every value
    # within ulp-tolerance of a truncation boundary plus all NaN-guard
    # outputs (kernels/encode.py encode_sc_q_core). Unflagged bins cannot
    # differ from the exact path; flagged ones (~1e-3 of values) are
    # recomputed in _rescue_sc with the exact f32 parts + f64 acos.
    sc_q = _rescue_sc(sc_parts, atom14, res_code, res_mask)

    # tempFactors: per-protein rounding quantizer (foldcomp.cpp:543-550)
    tf_q, tf_min, tf_cont = _host_quant_round(tf_ca.T, res_mask.T,
                                              2 ** 8 - 1)
    tf_q = np.where(res_mask, tf_q.T, 0).astype(np.uint8)

    mins = np.stack([phi_min, psi_min, om_min, ncac_min, cacn_min,
                     cnca_min], axis=-1)
    cont_fs = np.stack([phi_cf, psi_cf, om_cf, ncac_cf, cacn_cf, cnca_cf],
                       axis=-1)
    return dict(records=records, sc_q=sc_q, tf_q=tf_q, mins=mins,
                cont_fs=cont_fs, tf_min=tf_min, tf_cont=tf_cont)

def _slot_lut():
    """uint64 key table: (code << 32) | name4-as-u32 -> atom14 slot."""
    from ..core.aatable import NAME_TO_SLOT

    keys, slots = [], []
    for code in range(NUM_AA):
        for name, slot in NAME_TO_SLOT[code].items():
            field = name.ljust(4) if len(name) == 4 else " " + name.ljust(3)
            k = (np.uint64(code) << np.uint64(32)) | np.uint64(
                int.from_bytes(field.encode(), "little"))
            keys.append(k)
            slots.append(slot)
    keys = np.asarray(keys, np.uint64)
    order = np.argsort(keys)
    return keys[order], np.asarray(slots, np.int32)[order]


_SLOT_KEYS = None
_SLOT_VALS = None


def atoms_to_tensors_vec(name4: np.ndarray, res3: np.ndarray,
                         residue_index: np.ndarray, coords: np.ndarray,
                         temp: np.ndarray):
    """Vectorized fragment -> dense per-residue tensors.

    name4: uint8 [N, 4] raw PDB name columns; res3: uint8 [N, 3];
    residue_index/coords/temp as parsed. Returns (atom14 [L,14,3],
    res_code [L], tf_ca [L], groups_start [L]). First-occurrence-wins slot
    assignment (findFirstAtomCoords parity) via reversed scatter.
    """
    global _SLOT_KEYS, _SLOT_VALS
    if _SLOT_KEYS is None:
        _SLOT_KEYS, _SLOT_VALS = _slot_lut()
    from ..core.codes import int_from_three_letter

    n = len(residue_index)
    # residue groups: boundaries where residue_index changes; the final
    # atom always joins the current group (splitAtomByResidue parity)
    change = np.empty(n, bool)
    change[0] = True
    if n > 1:
        change[1:] = residue_index[1:] != residue_index[:-1]
        change[n - 1] = False
        change[0] = True
    gstart = np.flatnonzero(change)
    n_res = len(gstart)
    group_of = np.cumsum(change) - 1          # [N] residue ordinal per atom

    # residue codes from the group-start residue names
    res_code = np.asarray(
        [int_from_three_letter(bytes(res3[i]).decode("latin1").strip())
         for i in gstart], np.int32)

    # atom slot lookup: key = (code << 32) | name4 bytes
    name_u32 = name4.view(np.uint32).reshape(-1).astype(np.uint64)
    code_per_atom = res_code[group_of].astype(np.uint64)
    keys = (code_per_atom << np.uint64(32)) | name_u32
    pos = np.searchsorted(_SLOT_KEYS, keys)
    pos = np.clip(pos, 0, len(_SLOT_KEYS) - 1)
    valid = _SLOT_KEYS[pos] == keys
    slot = np.where(valid, _SLOT_VALS[pos], -1)

    atom14 = np.zeros((n_res, 14, 3), F32)
    # reversed order => the FIRST occurrence ends up winning
    rev = np.arange(n - 1, -1, -1)
    vr = rev[valid[rev]]
    atom14[group_of[vr], slot[vr]] = coords[vr]

    tf_ca = np.zeros(n_res, F32)
    is_ca = valid & (slot == 1)
    cr = rev[is_ca[rev]]
    tf_ca[group_of[cr]] = temp[cr]
    return atom14, res_code, tf_ca, gstart


def fragment_to_tensors(atoms: AtomArray):
    """One continuous single-chain fragment -> dense per-residue tensors.

    Returns (atom14 [L,14,3] f32, res_code [L] i32, tf_ca [L] f32, meta dict).
    Missing atoms are zeroed (findFirstAtomCoords parity,
    sidechain.cpp:140-147); atoms land in reference-table slots.
    """
    from ..core.aatable import NAME_TO_SLOT
    from ..core.codes import int_from_three_letter, one_letter_from_three
    from .encoder import EncodeError, residue_name_vector, split_by_residue

    groups = split_by_residue(atoms)
    rnames = residue_name_vector(atoms)
    n = len(groups)
    if n < 2:
        raise EncodeError("fragment must contain at least 2 residues")
    atom14 = np.zeros((n, 14, 3), F32)
    res_code = np.zeros(n, I32)
    tf_ca = np.zeros(n, F32)
    for r, ((start, end), rname) in enumerate(zip(groups, rnames)):
        code = int_from_three_letter(rname)
        res_code[r] = code
        slot_of = NAME_TO_SLOT[code] if code < NUM_AA else \
            {"N": 0, "CA": 1, "C": 2}
        seen = set()
        for i in range(start, end):
            nm = atoms.atom_name[i]
            if nm in seen:
                continue
            seen.add(nm)
            if nm == "CA":
                tf_ca[r] = atoms.temp_factor[i]
            slot = slot_of.get(nm)
            if slot is not None:
                atom14[r, slot] = atoms.coords[i]
    meta = dict(
        n_atom=len(atoms),
        idx_residue=int(atoms.residue_index[0]),
        idx_atom=int(atoms.atom_index[0]),
        chain=atoms.chain[0][:1] if atoms.chain[0] else "\x00",
        first_residue=one_letter_from_three(atoms.residue_name[0]),
        last_residue=one_letter_from_three(atoms.residue_name[-1]),
        title=atoms.title,
        has_oxt=atoms.atom_name[-1] == "OXT",
        oxt_coords=(atoms.coords[-1].astype(F32)
                    if atoms.atom_name[-1] == "OXT" else np.zeros(3, F32)),
    )
    return atom14, res_code, tf_ca, meta


def _anchor_indices(n_res: int, threshold: int):
    """_setAnchor parity (foldcomp.cpp:745-761)."""
    n_inner = n_res // threshold
    n_all = n_inner + 2
    interval = n_res // (n_all - 1)
    return np.asarray([i * interval for i in range(n_all - 1)] + [n_res - 1],
                      I32)


def encode_pdb_device(data: bytes, anchor_threshold: int = 25,
                      title: str | None = None, fallback_title: str = ""):
    """PDB buffer -> fragments ready for the device encoder, all host work
    vectorized over raw parse arrays (no per-atom Python).

    Returns (frag_tensors, frag_meta) where frag_tensors is a list of
    (atom14, res_code, tf_ca) and frag_meta mirrors the native encoder's
    fragment dicts (chain/frag ordinals for output naming), or None when
    the native parser is unavailable.
    """
    from ..core.codes import one_letter_from_three
    from ..native import _parse_raw, get_lib

    lib = get_lib()
    if lib is None:
        return None
    raw = _parse_raw(lib, data)
    n = raw["n"]
    if n == 0:
        return [], []
    name4 = np.frombuffer(raw["name4"].raw[:n * 4], np.uint8) \
        .reshape(n, 4).copy()
    res3 = np.frombuffer(raw["res3"].raw[:n * 3], np.uint8) \
        .reshape(n, 3).copy()
    chain = np.frombuffer(raw["chain"].raw[:n], np.uint8).copy()
    ridx = raw["residue_index"][:n]
    aidx = raw["atom_index"][:n]
    coords = raw["coords"][:n]
    temp = raw["temp"][:n]
    if title is None:
        title = raw["title"] or fallback_title

    # removeAlternativePosition: drop consecutive duplicate atom names
    keep = np.ones(n, bool)
    if n > 1:
        keep[1:] = (name4[1:] != name4[:-1]).any(axis=1)
    sel = np.flatnonzero(keep)
    name4, res3, chain = name4[sel], res3[sel], chain[sel]
    ridx, aidx, coords, temp = ridx[sel], aidx[sel], coords[sel], temp[sel]
    n = len(sel)

    is_n_atom = (name4 == np.frombuffer(b" N  ", np.uint8)).all(axis=1)

    # chain fragmentation (identify_chains semantics: fragments may skip a
    # leading non-N run of a new chain)
    chains = []
    start = 0
    i = 1
    while i < n:
        if chain[i] != chain[i - 1]:
            if is_n_atom[i]:
                chains.append((start, i))
                start = i
            else:
                nxt = np.flatnonzero(is_n_atom[i:])
                if len(nxt):
                    chains.append((start, i))
                    start = i + int(nxt[0])
                    i = start
        i += 1
    chains.append((start, n))

    frag_tensors, frag_meta = [], []
    for c_ord, (c0, c1) in enumerate(chains):
        n_pos = np.flatnonzero(is_n_atom[c0:c1]) + c0
        if len(n_pos) == 0:
            frags = [(c0, c1)]
        else:
            gaps = np.flatnonzero(np.diff(ridx[n_pos]) > 1) + 1
            starts = [int(n_pos[0])] + [int(n_pos[g]) for g in gaps]
            frags = [(s, e) for s, e in
                     zip(starts, starts[1:] + [c1])]
        for f_ord, (f0, f1) in enumerate(frags):
            atom14, res_code, tf_ca, _ = atoms_to_tensors_vec(
                name4[f0:f1], res3[f0:f1], ridx[f0:f1], coords[f0:f1],
                temp[f0:f1])
            if len(res_code) < 2:
                frag_meta.append(dict(error="fragment must contain at "
                                      "least 2 residues", chain_ord=c_ord,
                                      frag_ord=f_ord,
                                      n_frags_in_chain=len(frags),
                                      n_chains=len(chains)))
                frag_tensors.append(None)
                continue
            first3 = bytes(res3[f0]).decode("latin1").strip()
            last3 = bytes(res3[f1 - 1]).decode("latin1").strip()
            frag_meta.append(dict(
                error=None,
                n_atom=f1 - f0,
                idx_residue=int(ridx[f0]), idx_atom=int(aidx[f0]),
                chain=chr(chain[f0]),
                first_residue=one_letter_from_three(first3),
                last_residue=one_letter_from_three(last3),
                title=title,
                has_oxt=bytes(name4[f1 - 1]) == b" OXT",
                oxt_coords=(coords[f1 - 1].astype(F32)
                            if bytes(name4[f1 - 1]) == b" OXT"
                            else np.zeros(3, F32)),
                chain_ord=c_ord, frag_ord=f_ord,
                n_frags_in_chain=len(frags), n_chains=len(chains)))
            frag_tensors.append((atom14, res_code, tf_ca))
    return frag_tensors, frag_meta


class _ScratchPool:
    """Recycled numpy buffers for the encode pack path.

    First-touch page faults on this VM cost ~40 ms per fresh 35 MB
    buffer; recycling keeps the pack at warm-memory speed. Buffers
    handed to jax.device_put stay owned by the submit handle and return
    to the pool in encode_finish, after the kernel outputs exist (which
    guarantees the H2D transfer has consumed them)."""

    _MAX_PER_KEY = 2      # submit/finish pipelining needs at most 2
    _MAX_KEYS = 16        # distinct (shape, dtype) classes kept alive

    def __init__(self):
        self._free = {}

    def take(self, shape, dtype):
        lst = self._free.get((shape, np.dtype(dtype).str))
        return lst.pop() if lst else np.empty(shape, dtype)

    def give(self, *arrays):
        for a in arrays:
            if a is None:
                continue
            key = (a.shape, a.dtype.str)
            lst = self._free.setdefault(key, [])
            if len(lst) < self._MAX_PER_KEY:
                lst.append(a)
            if len(self._free) > self._MAX_KEYS:
                # many distinct batch shapes streamed through: drop the
                # lot rather than hold every shape class forever
                self._free = {key: lst}


_POOL = _ScratchPool()


def _compact_coord_batch(atom14):
    """f32 [B, L, 14, 3] -> (base i32, delta i16, present u16) or None.

    Millicoordinate form for the wire (see encode_sc_q_core_compact):
    valid only when every coordinate is the f32 of an integer number of
    milli-angstroms below 2^24 (3-decimal PDB/CIF coords always are) and
    every atom sits within int16 range of its residue's first present
    atom. The rounding runs in f32 (exact recovery holds to ~8000 A,
    the PDB format's own coordinate range) and is then VERIFIED by exact
    reconstruction against the correctly rounded division the device
    replays; returns None when any element fails, and the caller falls
    back to the f32 transfer. All large intermediates run in-place on
    pooled scratch; the returned delta buffer belongs to the submit
    handle and is recycled by encode_finish."""
    shape = atom14.shape
    s = _POOL.take(shape, np.float32)
    np.multiply(atom14, np.float32(1000.0), out=s)
    np.rint(s, out=s)
    smax, smin = s.max(), s.min()
    if not (smax < 2 ** 24 and smin > -(2 ** 24)):   # False on NaN too
        _POOL.give(s)
        return None
    xi = _POOL.take(shape, np.int32)
    np.copyto(xi, s, casting="unsafe")
    np.copyto(s, xi, casting="unsafe")               # s = f32(xi), exact
    np.divide(s, np.float32(1000.0), out=s)
    if not np.array_equal(s, atom14):
        _POOL.give(s, xi)
        return None
    present = xi.any(axis=3)                         # [B, L, 14]
    first = np.argmax(present, axis=2)               # 0 if none present
    base = np.ascontiguousarray(np.take_along_axis(
        xi, first[:, :, None, None].repeat(3, 3), axis=2)[:, :, 0])
    np.subtract(xi, base[:, :, None, :], out=xi)
    np.multiply(xi, present[..., None], out=xi)      # absent slots -> 0
    if not (-(2 ** 15) < xi.min() and xi.max() < 2 ** 15):
        _POOL.give(s, xi)
        return None
    delta = _POOL.take(shape, np.int16)
    np.copyto(delta, xi, casting="unsafe")
    bits = (present << np.arange(14)[None, None, :]).sum(
        axis=2).astype(np.uint16)
    _POOL.give(s, xi)
    return base, delta, bits


def _pack_encode_wire_native(live, atom14):
    """One-pass C fill of the padded atom14 batch AND the plane-major
    compact wire (native/fccodec.c fcz_pack_encode_wire): baseT i32
    [3, bp, l], deltaT i16 [42, bp, l], present u16 [bp, l], protein-
    padded to the fused kernel's sublane block — the layout
    encode_parity_fused_planar consumes with zero transposes on either
    side. Bit-identical valid/invalid decision to _compact_coord_batch
    (same IEEE f32 op order in C).

    Returns (baseT, deltaT, present) on success, the string "f32" when
    the batch fell out of the compact integer form (atom14 is still
    fully filled — callers go straight to the f32 core without a second
    fill pass), or None when the native library is unavailable/disabled
    (callers run the numpy fill + compact pass)."""
    import ctypes
    import os

    from ..kernels.pallas_encode import fused_pb
    from ..native import get_lib
    if os.environ.get("FOLDCOMP_TPU_PLANAR_WIRE", "1") == "0":
        return None
    lib = get_lib()
    if lib is None:
        return None
    b, l = atom14.shape[0], atom14.shape[1]
    ptrs = (ctypes.c_void_p * b)()
    ms = np.empty(b, np.int32)
    keep = []
    for k, (_, (a14, _rc, _tf)) in enumerate(live):
        a = np.ascontiguousarray(a14, np.float32)
        keep.append(a)
        ptrs[k] = a.ctypes.data
        ms[k] = a.shape[0]
    pb = fused_pb(l)
    bp = -(-b // pb) * pb
    baseT = _POOL.take((3, bp, l), np.int32)
    deltaT = _POOL.take((42, bp, l), np.int16)
    present = _POOL.take((bp, l), np.uint16)
    # the C pass releases the GIL; chunk the batch across a few threads
    # when it is big enough to amortize the pool (the pack bursts are
    # short — same total CPU work, shorter wall)
    nt = int(os.environ.get("FOLDCOMP_TPU_PACK_THREADS", "0")) or \
        (min(4, os.cpu_count() or 1) if b >= 256 else 1)
    nt = max(1, min(nt, b))
    if nt == 1:
        got = lib.fcz_pack_encode_wire(b, ptrs, ms, bp, l, atom14,
                                       baseT, deltaT, present)
        gots = [got]
    else:
        from concurrent.futures import ThreadPoolExecutor
        bounds = [(b * t // nt, b * (t + 1) // nt) for t in range(nt)]

        def run(t):
            k0, k1 = bounds[t]
            sub = (ctypes.c_void_p * (k1 - k0))(*ptrs[k0:k1])
            return lib.fcz_pack_encode_wire_range(
                k0, k1 - k0, sub, ms[k0:k1], bp, l, atom14,
                baseT, deltaT, present, b if t == nt - 1 else -1)
        with ThreadPoolExecutor(nt) as ex:
            gots = list(ex.map(run, range(nt)))
    if all(g == 1 for g in gots):
        return baseT, deltaT, present
    _POOL.give(baseT, deltaT, present)
    return "f32" if all(g >= 0 for g in gots) else None


def encode_submit(frag_tensors, frag_meta, anchor_threshold: int = 25,
                  l_bucket: int = 32):
    """Stage 1 of the batched device encode: pad, ship, dispatch.

    Pads the live fragments into one batch, transfers the coordinates
    (compact integer millicoordinate form when exact — see
    _compact_coord_batch — else f32) and dispatches the side-chain
    quantization kernel WITHOUT blocking. Returns an opaque handle for
    encode_finish; callers may submit the next batch before finishing
    the previous one so host finishing overlaps device transfers."""
    import os

    from ..kernels.encode import (encode_parity_core,
                                  encode_parity_core_compact,
                                  encode_sc_q_core,
                                  encode_sc_q_core_compact)

    live = [(i, t) for i, t in enumerate(frag_tensors) if t is not None]
    if not live:
        return dict(n=len(frag_tensors), live=[])
    b = len(live)
    l_pad = _round_up(max(t[0].shape[0] for _, t in live), l_bucket)
    atom14 = _POOL.take((b, l_pad, 14, 3), F32)
    res_code = np.zeros((b, l_pad), I32)
    tf_ca = np.zeros((b, l_pad), F32)
    res_mask = np.zeros((b, l_pad), bool)
    n_res = np.zeros(b, I32)
    for k, (_, (a14, rc, tf)) in enumerate(live):
        m = a14.shape[0]
        res_code[k, :m] = rc
        tf_ca[k, :m] = tf
        res_mask[k, :m] = True
        n_res[k] = m
    # full-device parity encode (backbone records + side chains + rescue
    # metadata) unless FOLDCOMP_TPU_ENC=host keeps the backbone streams
    # on host (round-2 behavior, kept for A/B)
    device_bb = os.environ.get("FOLDCOMP_TPU_ENC", "device") != "host"
    fused = use_fused_encode() if device_bb else ""
    # the fused path's wire rides plane-major straight from the native
    # one-pass pack when available (fills atom14 too)
    wire = None
    if fused:
        from ..kernels.pallas_encode import MAX_L_FUSED
        if l_pad <= MAX_L_FUSED:
            wire = _pack_encode_wire_native(live, atom14)
    if wire is None:
        atom14.fill(0)
        for k, (_, (a14, _rc, _tf)) in enumerate(live):
            atom14[k, :a14.shape[0]] = a14
    wire_bufs = ()
    delta_buf = None
    if isinstance(wire, tuple):
        from ..kernels.pallas_encode import encode_parity_fused_planar
        baseT, deltaT, present = wire
        bp = present.shape[0]
        code_p = res_code if bp == b else \
            np.pad(res_code, ((0, bp - b), (0, 0)))
        nres_p = n_res if bp == b else np.pad(n_res, (0, bp - b))
        parts = encode_parity_fused_planar(
            baseT, deltaT, present, code_p, nres_p, n_out=b,
            interpret=(fused == "interpret"))
        wire_bufs = wire
    elif device_bb:
        # wire == "f32": the C pack proved the batch non-compact, skip
        # the numpy compact pass entirely
        compact = None if wire == "f32" else _compact_coord_batch(atom14)
        if compact is not None:
            parts = None
            if fused:
                from ..kernels.pallas_encode import \
                    encode_parity_fused_compact
                # None when the padded length exceeds the fused kernel's
                # VMEM budget (MAX_L_FUSED) -> XLA core below
                parts = encode_parity_fused_compact(
                    *compact, res_code, n_res,
                    interpret=(fused == "interpret"))
            if parts is None:
                parts = encode_parity_core_compact(*compact, res_code,
                                                   n_res)
            delta_buf = compact[1]
        else:
            parts = encode_parity_core(atom14, res_code, n_res)
    else:
        compact = _compact_coord_batch(atom14)
        if compact is not None:
            sc_q, flag_bits = encode_sc_q_core_compact(*compact, res_code)
            parts = dict(sc_q=sc_q, sc_flag_bits=flag_bits)
            delta_buf = compact[1]
        else:
            sc_q, flag_bits = encode_sc_q_core(atom14, res_code)
            parts = dict(sc_q=sc_q, sc_flag_bits=flag_bits)
    # copy frag_meta: callers may clear/reuse their list while the
    # handle is in flight (the live tensors are captured pairwise above)
    return dict(n=len(frag_tensors), live=live, frag_meta=list(frag_meta),
                anchor_threshold=anchor_threshold, atom14=atom14,
                res_code=res_code, tf_ca=tf_ca, res_mask=res_mask,
                parts=parts, device_bb=device_bb, delta_buf=delta_buf,
                wire_bufs=wire_bufs)


def encode_finish(handle):
    """Stage 2 of the batched device encode: block, finish, assemble."""
    results = [None] * handle["n"]
    live = handle["live"]
    if not live:
        return results
    frag_meta = handle["frag_meta"]
    anchor_threshold = handle["anchor_threshold"]
    atom14, res_code = handle["atom14"], handle["res_code"]
    global DEVICE_WARMED
    parts = {k: np.asarray(v) for k, v in handle["parts"].items()}
    DEVICE_WARMED = True
    finish = finish_encode_device if handle["device_bb"] \
        else finish_encode_host
    out = finish(parts, atom14, res_code, handle["tf_ca"],
                 handle["res_mask"])
    # the device outputs are materialized, so the H2D transfer consumed
    # the pooled input buffers: recycle them for the next submit (pop so
    # a double-finish cannot hand the same buffer out twice)
    _POOL.give(handle.pop("atom14"), handle.pop("delta_buf", None),
               *handle.pop("wire_bufs", ()))
    # side-chain stream compaction for the whole batch in one masked
    # fancy-index: sc_q is [B, L, 11] row-major, so selecting slot j of
    # residue r where j < n_sc_torsion(residue r) preserves the per-entry
    # (residue, slot) stream order the serializer needs
    slot_idx = np.arange(out["sc_q"].shape[2])
    for k, (i, (a14, rc, tf)) in enumerate(live):
        meta = frag_meta[i]
        nres = a14.shape[0]
        anchors = _anchor_indices(nres, anchor_threshold)
        if len(anchors) > 255:
            # nAnchor is a uint8 header field; see encoder.encode
            continue
        counts = np.where(rc < NUM_AA, N_SC_TORSION[rc], 0)
        sc_stream = out["sc_q"][k, :nres][slot_idx[None, :] <
                                          counts[:, None]]
        results[i] = FczData(
            n_residue=nres, n_atom=meta["n_atom"],
            idx_residue=meta["idx_residue"], idx_atom=meta["idx_atom"],
            n_anchor=len(anchors), chain=meta["chain"],
            n_sc_torsion=len(sc_stream),
            first_residue=meta["first_residue"],
            last_residue=meta["last_residue"], title=meta["title"],
            mins=out["mins"][k], cont_fs=out["cont_fs"][k],
            anchor_indices=anchors,
            anchor_coords=a14[anchors, :3].astype(F32),
            has_oxt=meta["has_oxt"], oxt_coords=meta["oxt_coords"],
            records=out["records"][k, :nres],
            sc_codes=sc_stream.astype(np.uint8),
            tf_min=np.float32(out["tf_min"][k]),
            tf_cont=np.float32(out["tf_cont"][k]),
            tf_codes=out["tf_q"][k, :nres].astype(np.uint8))
    return results


def encode_tensor_batch(frag_tensors, frag_meta, anchor_threshold: int = 25,
                        l_bucket: int = 32):
    """Device-encode prepared fragment tensors -> List[FczData | None].

    Device quantizes the side chains and flags near-boundary values
    (encode_sc_q_core); the host computes the backbone streams, rescues
    flagged side-chain codes, and finishes with the reference's
    f64-promoted acos + quantization (finish_encode_host) so the records
    are bit-parity with the exact encoder. Synchronous form of
    encode_submit + encode_finish."""
    return encode_finish(encode_submit(frag_tensors, frag_meta,
                                       anchor_threshold, l_bucket))


def encode_fragment_batch(fragments, anchor_threshold: int = 25,
                          l_bucket: int = 32):
    """Batched (device) encode of AtomArray fragments -> List[FczData].

    Same device/host split as encode_tensor_batch: bit-parity records.
    Entries whose anchor count exceeds the uint8 header field come back
    as None (the exact encoder raises on those too)."""
    tensors = [fragment_to_tensors(a) for a in fragments]
    return encode_tensor_batch([(a14, rc, tf) for a14, rc, tf, _ in tensors],
                               [m for _, _, _, m in tensors],
                               anchor_threshold, l_bucket)
