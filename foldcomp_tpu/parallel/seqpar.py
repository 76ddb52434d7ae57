"""Sequence-parallel backbone feature extraction (halo-exchange SP).

The codec's per-protein work normally fits one chip, but extraction of
backbone internal coordinates is a sliding-window computation over the
atom sequence (4-atom dihedral windows, 3-atom angle windows), which for
very long chains (titin ~35k residues -> 105k atoms) or fused
many-protein streams can be sharded across devices along the SEQUENCE
axis: each shard computes the windows that start in its slice and fetches
a 3-atom halo from its right neighbor with one `jax.lax.ppermute` over the
ICI ring — the sequence-parallel analog of the reference's anchor
segmentation (SURVEY.md section 2, SP row).

Used by __graft_entry__.dryrun_multichip's 2-D (data x seq) mesh step and
testable on a virtual CPU mesh.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..kernels.geometry import bond_angle_c, dihedral_c

F32 = jnp.float32


def _halo_right(x, axis_name: str, n: int = 3):
    """First n rows of the RIGHT neighbor's shard (wraps at the end; the
    wrapped values feed windows that are masked off by the caller)."""
    size = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    del idx
    perm = [(int((i + 1) % size), int(i)) for i in range(int(size))]
    return jax.lax.ppermute(x[:n], axis_name, perm)


def sharded_backbone_features(mesh: Mesh, flat_x, flat_y, flat_z,
                              axis_name: str = "seq"):
    """Dihedrals + bond angles of a [T]-atom backbone sharded over `seq`.

    flat_*: f32 [T] coordinate components, T divisible by the mesh axis
    size. Returns (torsions [T], angles [T]) where entry i is the window
    starting/centered at atom i (the final 3 / first+last entries are
    zero-masked, matching the unsharded stream lengths T-3 and T-2).
    """
    def shard_fn(x, y, z):
        hx = _halo_right(x, axis_name)
        hy = _halo_right(y, axis_name)
        hz = _halo_right(z, axis_name)
        ex = jnp.concatenate([x, hx])
        ey = jnp.concatenate([y, hy])
        ez = jnp.concatenate([z, hz])
        k = x.shape[0]
        tors = dihedral_c(ex[:k], ey[:k], ez[:k],
                          ex[1:k + 1], ey[1:k + 1], ez[1:k + 1],
                          ex[2:k + 2], ey[2:k + 2], ez[2:k + 2],
                          ex[3:k + 3], ey[3:k + 3], ez[3:k + 3])
        angs = bond_angle_c(ex[:k], ey[:k], ez[:k],
                            ex[1:k + 1], ey[1:k + 1], ez[1:k + 1],
                            ex[2:k + 2], ey[2:k + 2], ez[2:k + 2])
        return tors, angs

    mapped = jax.shard_map(shard_fn, mesh=mesh,
                           in_specs=(P(axis_name),) * 3,
                           out_specs=(P(axis_name), P(axis_name)))
    tors, angs = jax.jit(mapped)(flat_x, flat_y, flat_z)
    t = flat_x.shape[0]
    i = jnp.arange(t)
    tors = jnp.where(i < t - 3, tors, 0.0)
    angs = jnp.where(i < t - 2, angs, 0.0)
    return tors, angs


def _halo_right_1(x, axis_name: str):
    """First row of the RIGHT neighbor's shard (wraps; callers mask)."""
    size = jax.lax.psum(1, axis_name)
    perm = [(int((i + 1) % size), int(i)) for i in range(int(size))]
    return jax.lax.ppermute(x[:1], axis_name, perm)


def sharded_encode_features(mesh: Mesh, atom14, res_code, tf_ca,
                            n_res: int, axis_name: str = "seq"):
    """Full FCZ quantization for ONE long chain sharded over `seq`.

    The sequence-parallel twin of kernels/encode.encode_batch_core for
    B=1: every shard extracts the torsion/angle windows that start in its
    residue slice (3-atom halo from the right neighbor over the ICI
    ring), the per-protein quantizer ranges are reduced with
    lax.pmin/pmax collectives, and each shard quantizes + bit-packs its
    own records — nothing materializes the whole chain on one device.
    Reference semantics: Foldcomp::preprocess + compress
    (foldcomp.cpp:450-606), restructured as SPMD over the residue axis.

    atom14:   f32 [L, 14, 3], L divisible by the mesh axis size
    res_code: i32 [L]; tf_ca: f32 [L]; n_res: real residues (<= L, the
              tail is padding)

    Returns the encode_batch_core dict shapes for one protein:
    records u8 [L, 8], sc_q u8 [L, 11], tf_q u8 [L], mins/cont_fs
    f32 [6] (phi,psi,omega,n_ca_c,ca_c_n,c_n_ca), tf_min/tf_cont f32.
    """
    from ..kernels.bitpack import pack_records
    from ..kernels.encode import _SC_DISC_F, _BIG, NBIN_BOND, NBIN_OMEGA, \
        NBIN_PHI_PSI, NBIN_TEMP
    from ..kernels.sidechain import MAX_ATOM, _PRED_IDX

    l = int(res_code.shape[0])

    def shard_fn(a14, codes, tf):
        ls = a14.shape[0]
        base = jax.lax.axis_index(axis_name) * ls
        idx = base + jnp.arange(ls, dtype=jnp.int32)           # global res

        # backbone windows with a 3-atom halo from the right neighbor
        flat = a14[:, :3].reshape(3 * ls, 3)
        fx, fy, fz = flat[:, 0], flat[:, 1], flat[:, 2]
        ex = jnp.concatenate([fx, _halo_right(fx, axis_name)])
        ey = jnp.concatenate([fy, _halo_right(fy, axis_name)])
        ez = jnp.concatenate([fz, _halo_right(fz, axis_name)])
        k = 3 * ls
        tors = dihedral_c(ex[:k], ey[:k], ez[:k],
                          ex[1:k + 1], ey[1:k + 1], ez[1:k + 1],
                          ex[2:k + 2], ey[2:k + 2], ez[2:k + 2],
                          ex[3:k + 3], ey[3:k + 3], ez[3:k + 3])
        angs = bond_angle_c(ex[:k], ey[:k], ez[:k],
                            ex[1:k + 1], ey[1:k + 1], ez[1:k + 1],
                            ex[2:k + 2], ey[2:k + 2], ez[2:k + 2])
        # stream order parity (foldcomp.cpp:484-505): window starting at
        # backbone atom 3i is psi(i); the angle classes land on
        # n_ca_c(i+1) / ca_c_n(i) / c_n_ca(i)
        psi, omega, phi = tors[0::3], tors[1::3], tors[2::3]   # [ls]
        ncac_cls, cacn, cnca = angs[0::3], angs[1::3], angs[2::3]

        mtor = idx < n_res - 1
        mncac = (idx >= 1) & (idx <= n_res - 1)

        def global_min_max(v, mask):
            vmin = jax.lax.pmin(jnp.min(jnp.where(mask, v, _BIG)),
                                axis_name)
            vmax = jax.lax.pmax(jnp.max(jnp.where(mask, v, -_BIG)),
                                axis_name)
            return vmin, vmax

        def quant(v, mask, nbin):
            vmin, vmax = global_min_max(v, mask)
            rng = vmax - vmin
            q = jnp.floor((v - vmin) * (nbin / rng) + F32(0.5)) \
                .astype(jnp.int32)
            return q, vmin, rng / nbin

        phi_q, phi_min, phi_cf = quant(phi, mtor, NBIN_PHI_PSI)
        psi_q, psi_min, psi_cf = quant(psi, mtor, NBIN_PHI_PSI)
        om_q, om_min, om_cf = quant(omega, mtor, NBIN_OMEGA)
        ncac_q, ncac_min, ncac_cf = quant(ncac_cls, mncac, NBIN_BOND)
        cacn_q, cacn_min, cacn_cf = quant(cacn, mtor, NBIN_BOND)
        cnca_q, cnca_min, cnca_cf = quant(cnca, mtor, NBIN_BOND)

        # record i stores n_ca_c(i+1): shift the class-0 stream left by
        # one across the shard boundary (1-element halo)
        ncac_rec = jnp.concatenate([ncac_q[1:],
                                    _halo_right_1(ncac_q, axis_name)])

        rec_mask = idx < n_res - 1          # last residue stores zeros
        res_ok = idx < n_res
        records = pack_records(
            jnp.where(res_ok, codes, 0),
            jnp.where(rec_mask, phi_q, 0), jnp.where(rec_mask, psi_q, 0),
            jnp.where(rec_mask, om_q, 0), jnp.where(rec_mask, ncac_rec, 0),
            jnp.where(rec_mask, cacn_q, 0), jnp.where(rec_mask, cnca_q, 0))

        # side chains are residue-local (atom14 slots): fixed [-180,180]
        # 255-bin truncating quantizer, select-chain predecessors
        sxa = a14[:, :, 0].T                                   # [14, ls]
        sya = a14[:, :, 1].T
        sza = a14[:, :, 2].T
        codes_c = jnp.clip(codes, 0, 23)
        preds = jnp.asarray(_PRED_IDX)[codes_c]                # [ls, 14, 3]

        def sel(arr, pidx, upto):
            acc = arr[0]
            for kk in range(1, upto):
                acc = jnp.where(pidx == kk, arr[kk], acc)
            return acc

        sc_rows = []
        for ka in range(3, MAX_ATOM):
            p0 = preds[:, ka, 0]
            p1 = preds[:, ka, 1]
            p2 = preds[:, ka, 2]
            ang = dihedral_c(
                sel(sxa, p0, ka), sel(sya, p0, ka), sel(sza, p0, ka),
                sel(sxa, p1, ka), sel(sya, p1, ka), sel(sza, p1, ka),
                sel(sxa, p2, ka), sel(sya, p2, ka), sel(sza, p2, ka),
                sxa[ka], sya[ka], sza[ka])
            sc_rows.append(ang)
        sc_ang = jnp.stack(sc_rows, axis=-1)                   # [ls, 11]
        sc_q = jnp.clip(((sc_ang + F32(180.0)) * _SC_DISC_F)
                        .astype(jnp.int32), 0, 255).astype(jnp.uint8)

        # tempFactor: per-protein rounding quantizer over the whole chain
        tf_q, tf_min, tf_cont = quant(tf, res_ok, NBIN_TEMP)
        tf_q = jnp.where(res_ok, tf_q, 0).astype(jnp.uint8)

        mins = jnp.stack([phi_min, psi_min, om_min, ncac_min, cacn_min,
                          cnca_min])
        cont_fs = jnp.stack([phi_cf, psi_cf, om_cf, ncac_cf, cacn_cf,
                             cnca_cf])
        return (records, sc_q, tf_q, mins, cont_fs,
                jnp.reshape(tf_min, (1,)), jnp.reshape(tf_cont, (1,)))

    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name), P(axis_name), P(), P(),
                   P(), P()))
    records, sc_q, tf_q, mins, cont_fs, tf_min, tf_cont = jax.jit(mapped)(
        atom14, res_code, tf_ca)
    assert records.shape == (l, 8)
    return dict(records=records, sc_q=sc_q, tf_q=tf_q, mins=mins,
                cont_fs=cont_fs, tf_min=tf_min[0], tf_cont=tf_cont[0])


def encode_long_chain(atoms, mesh: Mesh, axis_name: str = "seq",
                      anchor_threshold: int = 25):
    """AtomArray fragment -> FCZ bytes via the sequence-parallel encoder.

    The device work (feature extraction, quantizer reduction, record
    packing) is sharded over `mesh`'s `axis_name`; the host supplies the
    exact-f32 anchor coordinates and serializes the stream
    (codec/fcz.serialize). Output parity: matches the single-device
    batched encoder (kernels/encode.encode_batch_core) and decodes
    within the reference codec's reconstruction error.
    """
    from ..codec.batch import _anchor_indices, fragment_to_tensors
    from ..codec.fcz import FczData, serialize
    from ..core.aatable import N_SC_TORSION, NUM_AA

    a14, rc, tf, meta = fragment_to_tensors(atoms)
    n = a14.shape[0]
    n_dev = mesh.shape[axis_name]
    l = -(-n // n_dev) * n_dev
    a14p = np.zeros((l, 14, 3), np.float32)
    rcp = np.zeros(l, np.int32)
    tfp = np.zeros(l, np.float32)
    a14p[:n], rcp[:n], tfp[:n] = a14, rc, tf
    out = sharded_encode_features(mesh, a14p, rcp, tfp, n,
                                  axis_name=axis_name)
    records = np.asarray(out["records"])[:n]
    sc_q = np.asarray(out["sc_q"])[:n]
    tf_q = np.asarray(out["tf_q"])[:n]
    anchors = _anchor_indices(n, anchor_threshold)
    counts = np.where(rc < NUM_AA, N_SC_TORSION[rc], 0)
    sc_stream = sc_q[np.arange(sc_q.shape[1])[None, :] < counts[:, None]]
    fcz = FczData(
        n_residue=n, n_atom=meta["n_atom"],
        idx_residue=meta["idx_residue"], idx_atom=meta["idx_atom"],
        n_anchor=len(anchors), chain=meta["chain"],
        n_sc_torsion=len(sc_stream),
        first_residue=meta["first_residue"],
        last_residue=meta["last_residue"], title=meta["title"],
        mins=np.asarray(out["mins"]), cont_fs=np.asarray(out["cont_fs"]),
        anchor_indices=anchors,
        anchor_coords=a14[anchors, :3].astype(np.float32),
        has_oxt=meta["has_oxt"], oxt_coords=meta["oxt_coords"],
        records=records, sc_codes=sc_stream.astype(np.uint8),
        tf_min=np.float32(out["tf_min"]),
        tf_cont=np.float32(out["tf_cont"]),
        tf_codes=tf_q.astype(np.uint8))
    return serialize(fcz)


def reference_backbone_features(flat_x, flat_y, flat_z):
    """Unsharded twin of sharded_backbone_features for validation."""
    t = flat_x.shape[0]
    tors = dihedral_c(flat_x[:-3], flat_y[:-3], flat_z[:-3],
                      flat_x[1:-2], flat_y[1:-2], flat_z[1:-2],
                      flat_x[2:-1], flat_y[2:-1], flat_z[2:-1],
                      flat_x[3:], flat_y[3:], flat_z[3:])
    angs = bond_angle_c(flat_x[:-2], flat_y[:-2], flat_z[:-2],
                        flat_x[1:-1], flat_y[1:-1], flat_z[1:-1],
                        flat_x[2:], flat_y[2:], flat_z[2:])
    return (jnp.pad(tors, (0, 3)), jnp.pad(angs, (0, 2)))
