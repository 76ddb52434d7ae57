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

from ..core.aatable import ALT_PERM, ATOM_NAMES, N_ATOMS, N_SC_TORSION
from ..core.codes import (NUM_AA, THREE_LETTER, three_letter_from_one)
from ..io.structure import AtomArray
from .fcz import FczData, unpack_records

F32 = np.float32
I32 = np.int32


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
    """Convenience: parse payloads through the batched device decoder."""
    from ..kernels.decode import decode_batch_core
    arrays, metas, seg_pad = pack_decode_batch(fczs)
    atom14, res_code, temp = decode_batch_core(
        arrays["records"], arrays["mins"], arrays["cont_fs"],
        arrays["sc_codes"], arrays["tf_codes"], arrays["tf_min"],
        arrays["tf_cont"], arrays["anchor_xyz"], arrays["seg_start"],
        arrays["seg_m"], seg_width=seg_pad, refine_iters=refine_iters)
    return unpack_decode_result(atom14, res_code, temp, metas,
                                use_alt_order=use_alt_order)


def decode_fcz_to_pdb_batch(fczs, refine_iters: int = 2,
                            use_alt_order: bool = False):
    """Parse payloads -> device decode -> PDB text, one string per protein.

    When the native formatter is available the atom14 tensors go straight to
    text (no per-atom Python); otherwise falls back through AtomArray.
    """
    from ..kernels.decode import decode_batch_core
    arrays, metas, seg_pad = pack_decode_batch(fczs)
    atom14, res_code, temp = decode_batch_core(
        arrays["records"], arrays["mins"], arrays["cont_fs"],
        arrays["sc_codes"], arrays["tf_codes"], arrays["tf_min"],
        arrays["tf_cont"], arrays["anchor_xyz"], arrays["seg_start"],
        arrays["seg_m"], seg_width=seg_pad, refine_iters=refine_iters)

    try:
        from ..native import format_atom14_native, get_lib
        have_native = get_lib() is not None
    except Exception:
        have_native = False

    if have_native:
        atom14 = np.asarray(atom14)
        res_code = np.asarray(res_code)
        temp = np.asarray(temp)
        out = []
        for i, m in enumerate(metas):
            n = m.n_residue
            out.append(format_atom14_native(
                atom14[i, :n], temp[i, :n], res_code[i, :n], n,
                m.idx_residue, m.idx_atom, m.chain, m.first_residue,
                m.last_residue, m.has_oxt, m.oxt_coords, use_alt_order,
                m.title))
        return out

    from ..io.pdb import format_pdb
    decoded = unpack_decode_result(atom14, res_code, temp, metas,
                                   use_alt_order=use_alt_order)
    return [format_pdb(a, f.title) for a, f in zip(decoded, fczs)]


def decode_fcz_stream(payload_iter, batch_size: int = 128,
                      refine_iters: int = 2, use_alt_order: bool = False,
                      prefetch: int = 2):
    """Pipelined streaming decode: yields (payload, pdb_text) in order.

    Three overlapped stages — host pack (worker thread), device decode
    (async dispatch), and native text formatting (main thread) — so the
    accelerator never waits on the host between batches. `payload_iter`
    yields FczData objects; results come back in input order.
    """
    import os as _os
    import queue
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from ..kernels.decode import decode_batch_core

    n_workers = max(2, (_os.cpu_count() or 4) - 1)
    pool = ThreadPoolExecutor(n_workers)
    q_packed = queue.Queue(maxsize=prefetch)

    def producer():
        batch = []
        for f in payload_iter:
            batch.append(f)
            if len(batch) >= batch_size:
                q_packed.put((batch, pack_decode_batch(batch)))
                batch = []
        if batch:
            q_packed.put((batch, pack_decode_batch(batch)))
        q_packed.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    pending = None  # (fczs, metas, device outputs) awaiting formatting
    while True:
        item = q_packed.get()
        if item is None:
            break
        fczs, (arrays, metas, seg_pad) = item
        outs = decode_batch_core(
            arrays["records"], arrays["mins"], arrays["cont_fs"],
            arrays["sc_codes"], arrays["tf_codes"], arrays["tf_min"],
            arrays["tf_cont"], arrays["anchor_xyz"], arrays["seg_start"],
            arrays["seg_m"], seg_width=seg_pad, refine_iters=refine_iters)
        # format the PREVIOUS batch while this one runs on device
        if pending is not None:
            yield from _format_batch(*pending, use_alt_order, pool=pool)
        pending = (fczs, metas, outs)
    if pending is not None:
        yield from _format_batch(*pending, use_alt_order, pool=pool)
    t.join()
    pool.shutdown()


def _format_batch(fczs, metas, outs, use_alt_order, pool=None):
    atom14, res_code, temp = (np.asarray(o) for o in outs)
    try:
        from ..native import format_atom14_native, get_lib
        have_native = get_lib() is not None
    except Exception:
        have_native = False
    if have_native:
        def fmt(arg):
            i, m = arg
            n = m.n_residue
            return format_atom14_native(
                atom14[i, :n], temp[i, :n], res_code[i, :n], n,
                m.idx_residue, m.idx_atom, m.chain, m.first_residue,
                m.last_residue, m.has_oxt, m.oxt_coords, use_alt_order,
                m.title)

        if pool is not None:
            # the native formatter releases the GIL: fan the batch out
            for f, text in zip(fczs, pool.map(fmt, enumerate(metas),
                                              chunksize=8)):
                yield f, text
        else:
            for i, (f, m) in enumerate(zip(fczs, metas)):
                yield f, fmt((i, m))
    else:
        from ..io.pdb import format_pdb
        decoded = unpack_decode_result(atom14, res_code, temp, metas,
                                       use_alt_order=use_alt_order)
        for f, atoms in zip(fczs, decoded):
            yield f, format_pdb(atoms, f.title)


# ---------------------------------------------------------------------------
# Encode batching
# ---------------------------------------------------------------------------

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
                oxt_coords=coords[f1 - 1].astype(F32),
                chain_ord=c_ord, frag_ord=f_ord,
                n_frags_in_chain=len(frags), n_chains=len(chains)))
            frag_tensors.append((atom14, res_code, tf_ca))
    return frag_tensors, frag_meta


def encode_tensor_batch(frag_tensors, frag_meta, anchor_threshold: int = 25,
                        l_bucket: int = 32):
    """Device-encode prepared fragment tensors -> List[FczData | None]."""
    from ..kernels.encode import encode_batch_core

    live = [(i, t) for i, t in enumerate(frag_tensors) if t is not None]
    results = [None] * len(frag_tensors)
    if not live:
        return results
    b = len(live)
    l_pad = _round_up(max(t[0].shape[0] for _, t in live), l_bucket)
    atom14 = np.zeros((b, l_pad, 14, 3), F32)
    res_code = np.zeros((b, l_pad), I32)
    tf_ca = np.zeros((b, l_pad), F32)
    res_mask = np.zeros((b, l_pad), bool)
    for k, (_, (a14, rc, tf)) in enumerate(live):
        m = a14.shape[0]
        atom14[k, :m] = a14
        res_code[k, :m] = rc
        tf_ca[k, :m] = tf
        res_mask[k, :m] = True
    out = encode_batch_core(atom14[:, :, :3], atom14, res_code, tf_ca,
                            res_mask)
    out = {key: np.asarray(v) for key, v in out.items()}
    for k, (i, (a14, rc, tf)) in enumerate(live):
        meta = frag_meta[i]
        nres = a14.shape[0]
        anchors = _anchor_indices(nres, anchor_threshold)
        counts = np.where(rc < NUM_AA, N_SC_TORSION[rc], 0)
        sc_stream = np.concatenate(
            [out["sc_q"][k, r, :counts[r]] for r in range(nres)]) \
            if counts.sum() else np.zeros(0, np.uint8)
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


def encode_fragment_batch(fragments, anchor_threshold: int = 25,
                          l_bucket: int = 32):
    """Batched (device) encode of AtomArray fragments -> List[FczData]."""
    from ..kernels.encode import encode_batch_core

    tensors = [fragment_to_tensors(a) for a in fragments]
    b = len(tensors)
    l_pad = _round_up(max(t[0].shape[0] for t in tensors), l_bucket)
    atom14 = np.zeros((b, l_pad, 14, 3), F32)
    res_code = np.zeros((b, l_pad), I32)
    tf_ca = np.zeros((b, l_pad), F32)
    res_mask = np.zeros((b, l_pad), bool)
    for i, (a14, rc, tf, _) in enumerate(tensors):
        n = a14.shape[0]
        atom14[i, :n] = a14
        res_code[i, :n] = rc
        tf_ca[i, :n] = tf
        res_mask[i, :n] = True

    out = encode_batch_core(atom14[:, :, :3], atom14, res_code, tf_ca,
                            res_mask)
    out = {k: np.asarray(v) for k, v in out.items()}

    fczs = []
    for i, (a14, rc, tf, meta) in enumerate(tensors):
        n = a14.shape[0]
        anchors = _anchor_indices(n, anchor_threshold)
        # side-chain stream compaction (table order per residue)
        counts = np.where(rc < NUM_AA, N_SC_TORSION[rc], 0)
        sc_stream = np.concatenate(
            [out["sc_q"][i, r, :counts[r]] for r in range(n)]) \
            if counts.sum() else np.zeros(0, np.uint8)
        fczs.append(FczData(
            n_residue=n, n_atom=meta["n_atom"],
            idx_residue=meta["idx_residue"], idx_atom=meta["idx_atom"],
            n_anchor=len(anchors), chain=meta["chain"],
            n_sc_torsion=len(sc_stream),
            first_residue=meta["first_residue"],
            last_residue=meta["last_residue"], title=meta["title"],
            mins=out["mins"][i], cont_fs=out["cont_fs"][i],
            anchor_indices=anchors,
            anchor_coords=a14[anchors, :3].astype(F32),
            has_oxt=meta["has_oxt"], oxt_coords=meta["oxt_coords"],
            records=out["records"][i, :n],
            sc_codes=sc_stream.astype(np.uint8),
            tf_min=np.float32(out["tf_min"][i]),
            tf_cont=np.float32(out["tf_cont"][i]),
            tf_codes=out["tf_q"][i, :n].astype(np.uint8)))
    return fczs
