"""Quantify length bucketing in the streaming decoder on a mixed corpus.

Synthesizes an AFDB-like length mix (100..1200 residues, lognormal-ish),
encodes each once, then times decode_fcz_stream with bucket_window=0
(arrival order) vs 4 (sorted windows). Also reports the lane padding
waste ((lanes*seg_pad - real records) / total) each mode produces.
"""
import random
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np

from test_property_roundtrip import synthesize
from foldcomp_tpu.codec.encoder import encode
from foldcomp_tpu.codec.batch import pack_decode_batch_seg, decode_fcz_stream


def corpus(n_entries=1024, seed=0):
    rng = random.Random(seed)
    lens = [min(1200, max(60, int(rng.lognormvariate(5.9, 0.5))))
            for _ in range(n_entries)]
    uniq = {}
    fczs = []
    for L in lens:
        Lq = (L // 40) * 40 + 40       # 30 distinct lengths -> 30 encodes
        if Lq not in uniq:
            uniq[Lq] = encode(synthesize(Lq, seed=Lq), title=f"s{Lq}")
        fczs.append(uniq[Lq])
    return fczs


def waste(fczs, batch_size, bucket_window):
    """Padding fraction the batcher produces under each policy."""
    order = list(range(len(fczs)))
    total_pad = total_real = 0
    win = batch_size * max(bucket_window, 1)
    for w0 in range(0, len(fczs), win):
        window = order[w0:w0 + win]
        if bucket_window:
            window.sort(key=lambda i: fczs[i].n_residue)
        for b0 in range(0, len(window), batch_size):
            batch = [fczs[i] for i in window[b0:b0 + batch_size]]
            if len(batch) < batch_size:
                batch += [batch[-1]] * (batch_size - len(batch))
            arrays, metas = pack_decode_batch_seg(batch)
            lanes, seg_pad = arrays["seg_records"].shape[:2]
            real = sum(m.n_residue for m in metas)
            total_pad += lanes * seg_pad - real
            total_real += real
    return total_pad / (total_pad + total_real)


def timed(fczs, bucket_window, batch_size=128):
    t0 = time.perf_counter()
    n = 0
    for f, text in decode_fcz_stream(iter(fczs), batch_size=batch_size,
                                     bucket_window=bucket_window):
        n += f.n_residue
    return n / (time.perf_counter() - t0)


if __name__ == "__main__":
    fczs = corpus()
    print(f"corpus: {len(fczs)} entries, "
          f"{sum(f.n_residue for f in fczs)} residues, "
          f"lens {min(f.n_residue for f in fczs)}-"
          f"{max(f.n_residue for f in fczs)}")
    for bw in (0, 4):
        print(f"bucket_window={bw}: pad waste "
              f"{waste(fczs, 128, bw)*100:.1f}%")
    for rnd in range(2):
        for bw in (0, 4):
            r = timed(fczs, bw)
            print(f"round{rnd} bucket_window={bw}: {r/1e6:.2f} Mres/s")
