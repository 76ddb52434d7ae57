"""Hybrid CPU+device work-stealing scheduler (parallel/hybrid.py).

Runs on the CPU jax backend: the "device stream" is the same batched
segment-space pipeline the TPU runs, and the CPU workers are real
subprocesses, so the whole claim/steal/merge machinery is exercised
end to end.
"""
import struct

import pytest

from conftest import require_fixture

from foldcomp_tpu.io.db import DatabaseReader
from foldcomp_tpu.parallel.hybrid import ChunkController, run_hybrid_db


def _mk_guard(tmp_path, monkeypatch, n_chunks=100, chunk_entries=64,
              batch_size=512, completed=lambda: 0, warmup_env=None):
    from foldcomp_tpu.codec import batch as _batch
    from foldcomp_tpu.parallel.hybrid import EndgameGuard
    # earlier tests in this process may have completed device batches;
    # guard tests model a FRESH process
    monkeypatch.setattr(_batch, "DEVICE_WARMED", False)
    if warmup_env is None:
        monkeypatch.delenv("FOLDCOMP_TPU_WARMUP_EST", raising=False)
        # point the persisted-estimate file somewhere empty
        monkeypatch.setenv("FOLDCOMP_TPU_JAX_CACHE",
                           str(tmp_path / "cache"))
    else:
        monkeypatch.setenv("FOLDCOMP_TPU_WARMUP_EST", warmup_env)
    ctrl = ChunkController.create(str(tmp_path / "g_ctrl"), n_chunks)
    g = EndgameGuard(ctrl, chunk_entries, batch_size, completed)
    return ctrl, g


def test_guard_small_job_cold_stop(tmp_path, monkeypatch):
    """Cold device + CPUs that will finish before the device warm-up:
    the guard STOPs without the device claiming anything (the round-3
    regression: a 2.3 s job lost 10x to a cold-claimed backlog)."""
    ctrl, g = _mk_guard(tmp_path, monkeypatch, n_chunks=100,
                        warmup_env="5.0")
    # simulate: 0.3 s in, CPUs have drained 30 chunks (rate 100/s ->
    # remaining 0.7 s < 5 s warm-up horizon)
    for _ in range(30):
        ctrl.take_front()
    t0 = g.t0
    g._time = lambda: t0 + 0.3
    assert g.next_action() == g.STOP
    assert g.claimed_entries == 0


def test_guard_large_job_cold_claims(tmp_path, monkeypatch):
    """Cold device + a job big enough to outlast the warm-up: claim."""
    ctrl, g = _mk_guard(tmp_path, monkeypatch, n_chunks=10000,
                        warmup_env="5.0")
    for _ in range(3):
        ctrl.take_front()     # CPUs: 10 chunks/s -> ~1000 s remaining
    t0 = g.t0
    g._time = lambda: t0 + 0.3
    assert g.next_action() == g.CLAIM


def test_guard_grace_then_solo(tmp_path, monkeypatch):
    """No CPU progress: WAIT inside the grace beat, CLAIM after it
    (device-only job must still run)."""
    ctrl, g = _mk_guard(tmp_path, monkeypatch, warmup_env="5.0")
    t0 = g.t0
    g._time = lambda: t0 + 0.1
    assert g.next_action() == g.WAIT
    g._time = lambda: t0 + 0.5
    assert g.next_action() == g.CLAIM


def test_guard_backlog_aware_endgame(tmp_path, monkeypatch):
    """Warm device with a deep backlog: STOP when backlog drain time
    exceeds the CPUs' remaining time, even though one chunk alone would
    fit (the old rule ignored the backlog)."""
    done = {"n": 0}
    ctrl, g = _mk_guard(tmp_path, monkeypatch, n_chunks=1000,
                        chunk_entries=64, batch_size=512,
                        completed=lambda: done["n"], warmup_env="5.0")
    t0 = g.t0
    # device completed 200 entries in 10 s (20/s), claimed 1200 ->
    # backlog 1000 entries = 50 s of drain; CPUs at 80 chunks/10s = 8/s
    # with 920 chunks left = 115 s remaining > drain -> still CLAIM
    g.note_claim(1200)
    done["n"] = 200
    for _ in range(80):
        ctrl.take_front()
    g._time = lambda: t0 + 10.0
    assert g.next_action() == g.CLAIM
    # CPUs nearly done (10 chunks left = 1.25 s) << 50 s drain -> STOP
    for _ in range(910):
        ctrl.take_front()
    assert g.next_action() == g.STOP


def test_guard_eager_mode_claims_cold(tmp_path, monkeypatch):
    """FOLDCOMP_TPU_WARMUP_EST=0 (the suite default) claims cold even on
    tiny jobs, keeping the device path exercised."""
    ctrl, g = _mk_guard(tmp_path, monkeypatch, n_chunks=4,
                        warmup_env="0")
    for _ in range(2):
        ctrl.take_front()
    t0 = g.t0
    g._time = lambda: t0 + 0.3
    assert g.next_action() == g.CLAIM


def test_guard_in_process_warm_overrides_cold_estimate(tmp_path,
                                                       monkeypatch):
    """A device pipeline that has already completed a batch in this
    process gets a ~0.5 s horizon regardless of the persisted cold
    estimate, and finalize() must NOT overwrite the cold estimate with
    the warm measurement."""
    import json

    from foldcomp_tpu.codec import batch as _batch
    from foldcomp_tpu.parallel.hybrid import EndgameGuard

    monkeypatch.delenv("FOLDCOMP_TPU_WARMUP_EST", raising=False)
    cache = tmp_path / "cache"
    cache.mkdir()
    (cache / "device_warmup.json").write_text(
        json.dumps({"warmup_s": 9.0}))
    monkeypatch.setenv("FOLDCOMP_TPU_JAX_CACHE", str(cache))
    monkeypatch.setattr(_batch, "DEVICE_WARMED", True)
    ctrl = ChunkController.create(str(tmp_path / "w_ctrl"), 100)
    g = EndgameGuard(ctrl, 64, 512, lambda: 64)
    assert g.warmup_est == 0.5
    t0 = g.t0
    g._time = lambda: t0 + 0.1
    g.next_action()
    g.finalize()     # must not clobber the 9.0 cold estimate
    assert json.loads(
        (cache / "device_warmup.json").read_text())["warmup_s"] == 9.0


def test_guard_persists_measured_warmup(tmp_path, monkeypatch):
    """finalize() writes the measured time-to-first-completion; a new
    guard loads it as its cold horizon."""
    done = {"n": 0}
    ctrl, g = _mk_guard(tmp_path, monkeypatch,
                        completed=lambda: done["n"])
    assert g.warmup_est == 5.0          # default, nothing persisted yet
    t0 = g.t0
    done["n"] = 512
    g._time = lambda: t0 + 2.5
    g.next_action()
    g.finalize()
    from foldcomp_tpu.parallel.hybrid import EndgameGuard
    g2 = EndgameGuard(ctrl, 64, 512, lambda: 0)
    assert abs(g2.warmup_est - 2.5) < 0.2


def test_chunk_controller_two_pointer(tmp_path):
    p = str(tmp_path / "ctrl")
    ctrl = ChunkController.create(p, 5)
    assert ctrl.take_front() == 0
    assert ctrl.take_back() == 4
    assert ctrl.take_back() == 3
    assert ctrl.take_front() == 1
    assert ctrl.take_front() == 2
    assert ctrl.take_front() is None
    assert ctrl.take_back() is None
    # file reflects the drained state
    with open(p, "rb") as fh:
        lo, hi = struct.unpack("<qq", fh.read(16))
    assert lo >= hi


def test_chunk_controller_many_processes(tmp_path):
    """Concurrent claims from worker processes never duplicate or drop."""
    import subprocess
    import sys

    p = str(tmp_path / "ctrl")
    ChunkController.create(p, 200)
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from foldcomp_tpu.parallel.hybrid import ChunkController\n"
        "ctrl = ChunkController(%r)\n"
        "import random\n"
        "got = []\n"
        "while True:\n"
        "    c = ctrl.take_front() if random.random() < 0.5 else "
        "ctrl.take_back()\n"
        "    if c is None: break\n"
        "    got.append(c)\n"
        "print(' '.join(map(str, got)))\n"
    )
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [subprocess.run(
        [sys.executable, "-c", code % (repo, p)],
        capture_output=True, text=True, check=True) for _ in range(1)]
    # plus claims from this process interleaved via threads
    from concurrent.futures import ThreadPoolExecutor
    ctrl = ChunkController(p)
    with ThreadPoolExecutor(4) as ex:
        local = [c for c in ex.map(
            lambda i: ctrl.take_front() if i % 2 else ctrl.take_back(),
            range(400)) if c is not None]
    claimed = local + [int(x) for pr in procs for x in pr.stdout.split()]
    assert sorted(claimed) == list(range(200))


@pytest.mark.parametrize("use_device", [True, False])
def test_hybrid_decompress_matches_direct(tmp_path, ref_test_dir,
                                          use_device):
    """Hybrid output (2 native workers + device stream) contains every
    entry; native-worker entries are byte-exact, device entries hold the
    coordinate gate vs the exact decode."""
    require_fixture("example_db.dbtype")
    db = str(ref_test_dir / "example_db")
    out = str(tmp_path / "merged")
    rc = run_hybrid_db("decompress", db, out, n_native=2, chunk_entries=3,
                       batch_size=8, use_device=use_device)
    assert rc == 0

    import numpy as np

    from foldcomp_tpu.codec import fcz
    from foldcomp_tpu.codec.decoder import decode
    from foldcomp_tpu.io.pdb import format_pdb, parse_pdb

    ref = DatabaseReader(db, use_lookup=True)
    got = DatabaseReader(out, use_lookup=True)
    assert len(got) == len(ref) == 24
    for pos in range(len(ref)):
        key = ref.get_key(pos)
        f = fcz.parse(bytes(ref.get_data(pos)).rstrip(b"\x00"))
        want = format_pdb(decode(f), f.title).encode()
        text = bytes(got.get_data(got.pos_of_key(key))).rstrip(b"\x00") \
            if hasattr(got, "pos_of_key") else None
        if text is None:
            # fall back: scan for the key
            text = next(bytes(got.get_data(p)).rstrip(b"\x00")
                        for p in range(len(got))
                        if got.get_key(p) == key)
        if text == want:
            continue  # native worker entry: byte-exact
        a = parse_pdb(want)
        b = parse_pdb(text)
        assert len(a) == len(b)
        # device entries: batched decode is quantization-identical, not
        # bit-identical, to the sequential exact decode; same gate as
        # test_db_quality_gate (RMSD < 2e-3 A) plus a per-atom bound
        d = a.coords - b.coords
        r = float(np.sqrt((d * d).sum(axis=1).mean()))
        assert r < 2e-3, r
        assert np.abs(d).max() < 5e-3
    ref.close()
    got.close()


def test_hybrid_cold_horizon_routes_small_job_native(tmp_path,
                                                     ref_test_dir,
                                                     monkeypatch):
    """With a warm-up estimate far above the job's native wall, the
    device stream must claim nothing: every output entry is byte-exact
    (device-decoded entries are quantization- but not byte-identical,
    so one non-exact entry would prove a device claim)."""
    require_fixture("example_db.dbtype")
    monkeypatch.setenv("FOLDCOMP_TPU_WARMUP_EST", "1e9")
    from foldcomp_tpu.codec import batch as _batch
    monkeypatch.setattr(_batch, "DEVICE_WARMED", False)

    db = str(ref_test_dir / "example_db")
    out = str(tmp_path / "merged")
    rc = run_hybrid_db("decompress", db, out, n_native=2, chunk_entries=3,
                       batch_size=8, use_device=True)
    assert rc == 0

    from foldcomp_tpu.codec import fcz
    from foldcomp_tpu.codec.decoder import decode
    from foldcomp_tpu.io.pdb import format_pdb

    ref = DatabaseReader(db, use_lookup=True)
    got = DatabaseReader(out, use_lookup=True)
    assert len(got) == len(ref) == 24
    texts = {got.get_key(p): bytes(got.get_data(p)).rstrip(b"\x00")
             for p in range(len(got))}
    for pos in range(len(ref)):
        key = ref.get_key(pos)
        f = fcz.parse(bytes(ref.get_data(pos)).rstrip(b"\x00"))
        want = format_pdb(decode(f), f.title).encode()
        assert texts[key] == want, f"device stream claimed entry {key}"
    ref.close()
    got.close()


def test_hybrid_compress_matches_native(tmp_path, ref_test_dir):
    """Hybrid compress output is byte-identical per key to the native
    sharded path (the device encode is bit-parity by construction)."""
    require_fixture("test.pdb")
    from foldcomp_tpu.io.db import DatabaseWriter
    from foldcomp_tpu.parallel.dist import compress_db_shard, merge_shard_dbs

    pdb_db = str(tmp_path / "pdbdb")
    w = DatabaseWriter(pdb_db)
    for i, name in enumerate(("test.pdb", "test_af.pdb")):
        data = (ref_test_dir / name).read_bytes()
        for rep in range(6):
            w.append(data + b"\x00", i * 6 + rep, f"{name}_{rep}")
    w.close()

    out_h = str(tmp_path / "hyb")
    rc = run_hybrid_db("compress", pdb_db, out_h, n_native=1,
                       chunk_entries=2, batch_size=4)
    assert rc == 0

    out_n = str(tmp_path / "nat")
    compress_db_shard(pdb_db, out_n, 0, 1, fast=False)
    merge_shard_dbs(out_n, 1)

    h = DatabaseReader(out_h, use_lookup=True)
    n = DatabaseReader(out_n, use_lookup=True)
    assert len(h) == len(n)
    nat = {}
    for p in range(len(n)):
        nat.setdefault(n.get_key(p), []).append(bytes(n.get_data(p)))
    for p in range(len(h)):
        blob = bytes(h.get_data(p))
        assert blob in nat[h.get_key(p)]
    h.close()
    n.close()


def test_hybrid_skips_corrupt_entries(tmp_path, ref_test_dir):
    """Corrupt/truncated FCZ entries are skipped per-entry (reference
    input_processor semantics), never aborting the batch; valid entries
    still come through on both the native and device sides."""
    require_fixture("example_db.dbtype")
    import numpy as np

    from foldcomp_tpu.io.db import DatabaseWriter

    src = DatabaseReader(str(ref_test_dir / "example_db"), use_lookup=True)
    db = str(tmp_path / "mixed_db")
    w = DatabaseWriter(db)
    n_good = 0
    for pos in range(len(src)):
        data = bytes(src.get_data(pos))
        key = src.get_key(pos)
        name = src.name_of_key(key) or str(key)
        if pos % 5 == 2:
            w.append(b"NOTFCZ" + data[:40], key, name)      # corrupt magic
        elif pos % 5 == 4:
            w.append(data[: len(data) // 3], key, name)     # truncated
        else:
            w.append(data, key, name)
            n_good += 1
    w.close()
    src.close()

    out = str(tmp_path / "outdb")
    rc = run_hybrid_db("decompress", db, out, n_native=1, chunk_entries=3,
                       batch_size=4)
    assert rc == 0
    got = DatabaseReader(out)
    assert len(got) == n_good
    for p in range(len(got)):
        text = bytes(got.get_data(p))
        assert text.startswith(b"ATOM") or b"\nATOM" in text[:2000]
    got.close()


@pytest.mark.parametrize("db_out", [False, True])
def test_sharded_extract_matches_single(tmp_path, ref_test_dir, db_out):
    """extract -t N on a db fans out over worker processes; merged text
    output is byte-identical to single-thread (contiguous shard ranges
    concatenated in order = entry order); db output equal per name."""
    require_fixture("example_db.dbtype")
    from foldcomp_tpu import cli

    db = str(ref_test_dir / "example_db")
    o1 = str(tmp_path / "one")
    o3 = str(tmp_path / "three")
    flags = ["-d"] if db_out else []
    assert cli.main(["extract", "--plddt", *flags, "-y", db, o1]) == 0
    assert cli.main(["extract", "--plddt", "-t", "3", *flags, "-y",
                     db, o3]) == 0
    if not db_out:
        assert open(o1, "rb").read() == open(o3, "rb").read()
        return
    a = DatabaseReader(o1, use_lookup=True)
    b = DatabaseReader(o3, use_lookup=True)
    assert len(a) == len(b) == 24
    bn = {b.name_of_key(b.get_key(p)): bytes(b.get_data(p))
          for p in range(len(b))}
    for p in range(len(a)):
        assert bytes(a.get_data(p)) == bn[a.name_of_key(a.get_key(p))]
    a.close()
    b.close()


def test_chunk_controller_no_double_claims_under_threads(tmp_path):
    """Concurrent claimers must partition the chunk space exactly.

    Regression: _claim wrote the updated pointers into a BUFFERED file
    and released the flock before the buffer flushed at close, so a
    concurrent claimer could read stale pointers and double-claim a
    chunk (hit in practice once thread workers landed)."""
    import threading

    from foldcomp_tpu.parallel.hybrid import ChunkController

    n_chunks = 2000
    ctrl = ChunkController.create(str(tmp_path / "ctrl"), n_chunks)
    got = [[] for _ in range(8)]

    def claimer(i):
        take = ctrl.take_front if i % 2 == 0 else ctrl.take_back
        while (c := take()) is not None:
            got[i].append(c)

    threads = [threading.Thread(target=claimer, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    allc = [c for g in got for c in g]
    assert len(allc) == n_chunks
    assert len(set(allc)) == n_chunks


def test_db_compress_multichain_entries_c_range(tmp_path):
    """A db holding multi-chain and single-chain PDB entries compresses
    identically through the C chunk loop (-t 1 / -t 2 threads) and the
    per-entry Python encoder."""
    import pathlib

    from foldcomp_tpu import cli
    from foldcomp_tpu.io.db import DatabaseReader, DatabaseWriter
    from foldcomp_tpu.native import encode_pdb_native

    multi = pathlib.Path("/root/reference/test/multichain.pdb")
    single = pathlib.Path("/root/reference/test/test.pdb")
    if not multi.exists() or not single.exists():
        pytest.skip("reference fixtures unavailable")
    payloads = [multi.read_bytes(), single.read_bytes()] * 4
    db = str(tmp_path / "pdb_db")
    w = DatabaseWriter(db)
    for i, p in enumerate(payloads):
        w.append(p + b"\x00", i, f"e{i}")
    w.close()

    outs = []
    for t in ("1", "2"):
        out = str(tmp_path / f"fcz_t{t}")
        assert cli.main(["compress", "--exact", "-t", t, "-y", "-d",
                         db, out]) == 0
        outs.append(out)
    readers = [DatabaseReader(o, use_lookup=True) for o in outs]
    # expected: per-entry python-driven native encode, all fragments
    expected = []
    for i, p in enumerate(payloads):
        for f in encode_pdb_native(p, 25, None, split=True,
                                   fallback_title=f"e{i}") or []:
            if not f["error"]:
                expected.append((i, f["blob"]))
    assert len(expected) > len(payloads), "multichain must yield extra frags"
    for r in readers:
        assert len(r) == len(expected)
        got = sorted((r.get_key(i), bytes(r.get_data(i)))
                     for i in range(len(r)))
        want = sorted((k, b) for k, b in expected)
        assert got == want
    for r in readers:
        r.close()


def test_db_decompress_corrupted_entries_skip(tmp_path):
    """Corrupted FCZ entries are skipped by the C chunk loop exactly like
    the per-entry exact path: the surviving entry set matches."""
    import pathlib

    from foldcomp_tpu import cli
    from foldcomp_tpu.codec import fcz as fcz_mod
    from foldcomp_tpu.codec.decoder import decode as decode_exact
    from foldcomp_tpu.io.db import DatabaseWriter
    from foldcomp_tpu.io.pdb import parse_pdb
    from foldcomp_tpu.io.structure import (
        identify_chains, identify_discontinuous_fragments,
        remove_alternative_positions)
    from foldcomp_tpu.codec.encoder import encode

    src = pathlib.Path("/root/reference/test/test.pdb")
    if not src.exists():
        pytest.skip("reference fixture unavailable")
    atoms = remove_alternative_positions(parse_pdb(src.read_bytes()))
    (cs, ce), = identify_chains(atoms)
    (fs, fe), = identify_discontinuous_fragments(atoms, cs, ce)
    blob = fcz_mod.serialize(encode(atoms.slice(fs, fe)))

    corruptions = {
        1: b"not an fcz stream",                  # bad magic
        3: blob[: len(blob) // 2],                # truncated
        5: b"",                                   # empty
        7: blob[:40] + b"\xff" * 8 + blob[48:],   # mangled header floats
    }
    db = str(tmp_path / "db")
    w = DatabaseWriter(db)
    for i in range(10):
        w.append(corruptions.get(i, blob) + b"\x00", i, f"e{i}")
    w.close()

    out = str(tmp_path / "out")
    assert cli.main(["decompress", "--exact", "-t", "1", "-y", "-d",
                     db, out]) == 0
    got = DatabaseReader(out, use_lookup=True)
    surviving = sorted(got.get_key(i) for i in range(len(got)))
    # python-side expectation: entries whose payload parses + decodes
    expect = []
    for i in range(10):
        payload = corruptions.get(i, blob)
        try:
            decode_exact(fcz_mod.parse(payload))
            expect.append(i)
        except Exception:
            pass
    assert surviving == expect, (surviving, expect)
    got.close()


def test_db_roundtrip_synthetic_lengths_c_loops(tmp_path):
    """pdb-db -> compress -t2 -> decompress -t2 through the C chunk
    loops on synthetic proteins of varied lengths; every entry holds the
    all-atom quantization gate vs its source."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_property_roundtrip import synthesize

    from foldcomp_tpu import cli
    from foldcomp_tpu.core.exact import rmsd
    from foldcomp_tpu.io.db import DatabaseWriter
    from foldcomp_tpu.io.pdb import format_pdb, parse_pdb

    lengths = [24, 61, 150, 333, 702]
    srcs = {}
    db = str(tmp_path / "pdb_db")
    w = DatabaseWriter(db)
    for i, L in enumerate(lengths * 3):
        atoms = synthesize(L, seed=L + i)
        srcs[i] = atoms
        w.append(format_pdb(atoms, f"s{i}").encode() + b"\x00", i, f"e{i}")
    w.close()

    fdb = str(tmp_path / "fcz_db")
    pdb_out = str(tmp_path / "pdb_out")
    assert cli.main(["compress", "--exact", "-t", "2", "-y", "-d",
                     db, fdb]) == 0
    assert cli.main(["decompress", "--exact", "-t", "2", "-y", "-d",
                     fdb, pdb_out]) == 0
    got = DatabaseReader(pdb_out, use_lookup=True)
    assert len(got) == len(srcs)
    for i in range(len(got)):
        key = got.get_key(i)
        dec = parse_pdb(bytes(got.get_data(i)).rstrip(b"\x00"))
        src = srcs[key]
        n = min(len(dec), len(src))
        r = rmsd(src.coords[:n], dec.coords[:n])
        assert r < 0.2, (key, r)   # quantization-level reconstruction
    got.close()


def test_hybrid_short_job_wall_not_slower(tmp_path):
    """MEASURED pathology regression (VERDICT r4 #3): on a short job the
    hybrid default must not lose to cpu-only — the endgame guard's whole
    point is that the device stream never extends the wall. SCALING_r04
    caught trials where a cold device claim stretched a ~2 s job ~10x;
    the guard (cold horizon + backlog-aware endgame) must keep the
    device out of jobs this small.

    Both configs run in fresh subprocesses with the production env
    (persisted warm-up estimate active, link probe forced 'ok' so the
    hybrid genuinely considers the device), best-of-3 against VM noise.
    Gate 0.90: the target is ~1.0; anything near the historic 0.139
    pathology fails loudly."""
    import os
    import pathlib
    import subprocess
    import sys
    import time

    from foldcomp_tpu.parallel.scaling import build_synthetic_db

    db = str(tmp_path / "syn_db")
    build_synthetic_db(db, 384, mixed=True)
    repo = pathlib.Path(__file__).resolve().parent.parent

    def wall(args, extra_env):
        env = dict(os.environ, PYTHONPATH=str(repo), **extra_env)
        env.pop("FOLDCOMP_TPU_WARMUP_EST", None)   # production guard
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = subprocess.run(
                [sys.executable, "-m", "foldcomp_tpu", "decompress",
                 *args, "-y", "-d", db, str(tmp_path / "out")],
                env=env, capture_output=True)
            assert r.returncode == 0, r.stderr[-1000:]
            best = min(best, time.perf_counter() - t0)
        return best

    cpu_only = wall(["--exact", "-t", "2"], {})
    hybrid = wall(["-t", "2"], {"FOLDCOMP_TPU_LINK": "ok"})
    assert hybrid <= cpu_only / 0.90 + 0.3, \
        f"hybrid {hybrid:.2f}s vs cpu_only {cpu_only:.2f}s"
