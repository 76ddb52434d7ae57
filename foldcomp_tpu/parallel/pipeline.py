"""Multi-chip data-parallel codec pipeline (jax.sharding + shard_map).

The reference's only parallelism is one OpenMP thread per protein on a
single node (input_processor.h:85-101). The TPU-native equivalent shards
padded protein batches over a device mesh: per-protein encode/decode needs
zero cross-device communication, so data parallelism rides a 1-D mesh and
collectives appear only for global statistics/validation reductions
(`psum`), exactly as laid out in SURVEY.md section 2.

`make_roundtrip_step` builds the full device-side pipeline step — encode,
device-computed anchor segmentation, decode, global quality stats — sharded
over the mesh's 'data' axis. This is also the multi-chip dry-run target.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels.decode import decode_batch_core
from ..kernels.encode import encode_batch_core

F32 = jnp.float32
I32 = jnp.int32


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def device_segments(n_res, l: int, s_max: int, threshold: int):
    """Anchor segmentation computed on device (_setAnchor parity,
    foldcomp.cpp:745-761).

    n_res: i32 [B]; returns (anchor_idx [B, s_max+1], seg_start [B, s_max],
    seg_m [B, s_max]) with padded segments pushed past the stitch window.
    """
    n_inner = n_res // threshold
    n_all = n_inner + 2                       # [B]
    interval = n_res // (n_all - 1)
    s = jnp.arange(s_max + 1, dtype=I32)[None, :]       # [1, S+1]
    is_inner = s < (n_all[:, None] - 1)
    anchor_idx = jnp.where(is_inner, s * interval[:, None], n_res[:, None] - 1)
    seg_start = anchor_idx[:, :-1]
    n_seg = n_all - 1
    seg_valid = jnp.arange(s_max, dtype=I32)[None, :] < n_seg[:, None]
    nxt = jnp.minimum(anchor_idx[:, 1:] + 1, n_res[:, None] - 1)
    is_final = jnp.arange(s_max, dtype=I32)[None, :] == (n_seg[:, None] - 1)
    seg_m = jnp.where(is_final, n_res[:, None] - seg_start, nxt - seg_start)
    seg_m = jnp.where(seg_valid, jnp.maximum(seg_m, 1), 1)
    seg_start = jnp.where(seg_valid, seg_start, l + s_max + 2)
    return anchor_idx, seg_start, seg_m


def roundtrip_core(atom14, res_code, tf_ca, res_mask, *, s_max: int,
                   seg_width: int, threshold: int = 25,
                   refine_iters: int = 2):
    """Full single-shard pipeline step: encode -> decode -> quality stats.

    Returns (records u8 [B,L,8], atom14_dec f32 [B,L,14,3],
             sum_sq_err f32 [], n_atoms f32 []).
    """
    bb = atom14[:, :, :3]
    enc = encode_batch_core(bb, atom14, res_code, tf_ca, res_mask)

    n_res = jnp.sum(res_mask.astype(I32), axis=-1)
    l = res_code.shape[1]
    anchor_idx, seg_start, seg_m = device_segments(n_res, l, s_max, threshold)
    anchor_xyz = jnp.take_along_axis(
        bb, jnp.clip(anchor_idx, 0, l - 1)[..., None, None], axis=1)

    atom14_dec, _, _ = decode_batch_core(
        enc["records"], enc["mins"], enc["cont_fs"], enc["sc_q"],
        enc["tf_q"], enc["tf_min"], enc["tf_cont"], anchor_xyz,
        seg_start, seg_m, seg_width=seg_width, refine_iters=refine_iters)

    from ..kernels.sidechain import atom_mask
    amask = atom_mask(res_code) & res_mask[..., None]
    err = jnp.where(amask[..., None], atom14_dec - atom14, 0.0)
    sum_sq = jnp.sum(err.astype(F32) ** 2)
    n_atoms = jnp.sum(amask).astype(F32)
    return enc["records"], atom14_dec, sum_sq, n_atoms


def make_roundtrip_step(mesh: Mesh, *, s_max: int, seg_width: int,
                        threshold: int = 25, refine_iters: int = 2,
                        axis_name: str = "data"):
    """Jitted data-parallel roundtrip step over the mesh.

    Batch axis is sharded across `axis_name`; the only collective is the
    final `psum` merging per-shard quality statistics into the global
    all-atom RMSD — the TPU-native analog of the reference's golden RMSD
    gate running across the entire sharded corpus.
    """
    core = partial(roundtrip_core, s_max=s_max, seg_width=seg_width,
                   threshold=threshold, refine_iters=refine_iters)

    def shard_fn(atom14, res_code, tf_ca, res_mask):
        records, atom14_dec, sum_sq, n_atoms = core(
            atom14, res_code, tf_ca, res_mask)
        g_sum = jax.lax.psum(sum_sq, axis_name)
        g_n = jax.lax.psum(n_atoms, axis_name)
        global_rmsd = jnp.sqrt(g_sum / jnp.maximum(g_n, 1.0))
        return records, atom14_dec, global_rmsd

    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name), P()))
    return jax.jit(mapped)


def shard_batch(mesh: Mesh, arrays, axis_name: str = "data"):
    """Device-put host arrays with the batch axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return tuple(jax.device_put(a, sharding) for a in arrays)
