"""Multi-host distribution (kaarme_tpu/parallel/multihost.py).

Two layers:
- pure-host span/halo logic: the union of per-host window multisets
  must equal the single-host multiset exactly (the cross-host analogue
  of the reference's k-1 chunk back-seek, include/text_reader.h:206-213);
- a real 2-process x 4-CPU-device run through jax.distributed + gloo
  collectives: counts a shared FASTA, exchanges distinct records
  across processes, writes disjoint partitions, and the merged parts
  must equal the golden oracle.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from kaarme_tpu.parallel.multihost import (  # noqa: E402
    HostSpanReader, host_span_codes, merge_parts)
from kaarme_tpu.utils import codec  # noqa: E402


def _random_fasta(tmp_path, seed=0, n_reads=300, read_len=90, glen=4000,
                  wrap=33):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, size=glen).astype(np.uint8)
    lut = np.frombuffer(b"ACGT", np.uint8)
    path = tmp_path / "mh.fasta"
    with open(path, "wb") as f:
        for i in range(n_reads):
            start = int(rng.integers(0, glen - read_len))
            read = bytearray(lut[genome[start:start + read_len]].tobytes())
            if i % 17 == 0:
                read[int(rng.integers(0, read_len))] = ord("N")
            f.write(b">read%d some description\n" % i)
            # wrapped lines so spans start mid-record and mid-line
            for j in range(0, len(read), wrap):
                f.write(bytes(read[j:j + wrap]) + b"\n")
    return str(path)


def _counts_sum(dicts):
    out = {}
    for d in dicts:
        for kk, v in d.items():
            out[kk] = out.get(kk, 0) + v
    return out


import contextlib  # noqa: E402
import tempfile  # noqa: E402


@contextlib.contextmanager
def _two_proc_lock():
    """Serialize the 2-process coordination tests across xdist workers:
    two concurrent pairs (8 JAX processes on a 4-core box) starve the
    distributed shutdown barrier into DEADLINE_EXCEEDED flakes."""
    import fcntl

    path = os.path.join(tempfile.gettempdir(), "kaarme_mh_2proc.lock")
    with open(path, "w") as f:
        fcntl.flock(f, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(f, fcntl.LOCK_UN)



def _spawn_two(worker, env):
    """Run the 2-process worker pair; retry ONCE when the only failure
    is a coordination-service barrier timeout (oversubscribed CI box:
    compile skew between the pair starves the init/shutdown barriers).
    Real assertion/output failures propagate immediately."""
    for attempt in (0, 1):
        with _two_proc_lock():
            procs = [subprocess.Popen([sys.executable, worker, str(pid)],
                                      env=env, stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE)
                     for pid in range(2)]
            outs = [p.communicate(timeout=600) for p in procs]
        if all(p.returncode == 0 for p in procs):
            return outs
        blurb = b"".join(se for _, se in outs)
        flake = (b"Barrier timed out" in blurb
                 or b"DEADLINE_EXCEEDED" in blurb
                 or b"Shutdown barrier" in blurb)
        if not flake or attempt:
            for p, (so, se) in zip(procs, outs):
                assert p.returncode == 0, \
                    so.decode()[-500:] + "\n" + se.decode()[-3000:]
    return outs


@pytest.mark.parametrize("num_hosts", [2, 3, 5])
@pytest.mark.parametrize("k", [7, 31])
def test_host_span_union_is_exact(tmp_path, num_hosts, k):
    path = _random_fasta(tmp_path, seed=num_hosts * 100 + k)
    full = codec.golden_count(
        codec.encode_fasta(open(path, "rb").read())[0], k)
    parts = []
    for h in range(num_hosts):
        codes = host_span_codes(path, h, num_hosts, k)
        parts.append(codec.golden_count(codes, k) if codes.size else {})
    assert _counts_sum(parts) == full


def test_host_span_plain_and_tiny_spans(tmp_path):
    # plain one-read-per-line input; more hosts than lines covers
    # empty-span hosts and spans starting on newline bytes
    path = str(tmp_path / "p.txt")
    with open(path, "wb") as f:
        f.write(b"ACGTACGTGGATTTACGT\nACGTNACGTT\nTTTTTTTTTTTT\n")
    k = 5
    full = codec.golden_count(
        codec.encode_plain(open(path, "rb").read()), k)
    for H in (2, 4, 8):
        parts = [codec.golden_count(host_span_codes(path, h, H, k), k)
                 for h in range(H)]
        assert _counts_sum(parts) == full, H


def test_host_span_rejects_gzip(tmp_path):
    import gzip

    gz = str(tmp_path / "x.fasta.gz")
    with gzip.open(gz, "wb") as f:
        f.write(b">r\nACGT\n")
    with pytest.raises(ValueError):
        HostSpanReader(gz, 0, 2, 5)


def _random_fastq(tmp_path, seed=1, n_reads=240, read_len=80):
    rng = np.random.default_rng(seed)
    lut = np.frombuffer(b"ACGT", np.uint8)
    path = str(tmp_path / "mh.fastq")
    with open(path, "wb") as f:
        for i in range(n_reads):
            read = lut[rng.integers(0, 4, size=read_len)].tobytes()
            # quality lines that start with '@' and '+' stress the
            # record-start detector
            q = bytes([int(rng.integers(33, 74)) for _ in range(read_len)])
            q = (b"@" if i % 3 == 0 else b"+" if i % 3 == 1 else q[:1]) + q[1:]
            f.write(b"@read%d desc\n" % i + read + b"\n+\n" + q + b"\n")
    return path


@pytest.mark.parametrize("num_hosts", [2, 3, 5])
def test_host_span_fastq_union_is_exact(tmp_path, num_hosts):
    """Record-aligned FASTQ ownership: per-host unions match the
    single-host multiset exactly, '@'/'+'-leading qualities included."""
    path = _random_fastq(tmp_path, seed=num_hosts)
    k = 31
    full = codec.golden_count(
        codec.encode_fastq(open(path, "rb").read())[0], k)
    parts = []
    for h in range(num_hosts):
        codes = host_span_codes(path, h, num_hosts, k)
        parts.append(codec.golden_count(codes, k) if codes.size else {})
    assert _counts_sum(parts) == full


@pytest.mark.parametrize("gz", [False, True])
def test_presplit_round_robin(tmp_path, gz):
    from kaarme_tpu.parallel.multihost import presplit

    path = _random_fastq(tmp_path, seed=7)
    if gz:
        import gzip
        import shutil

        gzp = path + ".gz"
        with open(path, "rb") as fi, gzip.open(gzp, "wb") as fo:
            shutil.copyfileobj(fi, fo)
        src = gzp
    else:
        src = path
    k = 31
    full = codec.golden_count(
        codec.encode_fastq(open(path, "rb").read())[0], k)
    parts = presplit(src, 3, str(tmp_path / "pp"), block_records=16)
    got = []
    for p in parts:
        codes, _ = codec.encode_fastq(open(p, "rb").read())
        got.append(codec.golden_count(codes, k))
    assert _counts_sum(got) == full


def test_merge_parts_streaming(tmp_path):
    out = str(tmp_path / "m.out")
    data = [[b"AAAC 3\n", b"CCGT 1\n"], [b"ACGT 2\n"], []]
    for h, lines in enumerate(data):
        with open(f"{out}.part{h}", "wb") as f:
            f.writelines(lines)
    n = merge_parts(out, 3)
    assert n == 3
    assert open(out, "rb").read() == b"AAAC 3\nACGT 2\nCCGT 1\n"


_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, %(repo)r)
sys.argv = ["mh", %(fasta)r, "31",
            "--coordinator", "localhost:%(port)d",
            "--num-processes", "2", "--process-id", sys.argv[1],
            "--platform", "cpu", "-a", "1",
            "--batch-log2", "12", "-s", "60000", "-o", %(out)r]
from kaarme_tpu.parallel.multihost import main
sys.exit(main())
"""


@pytest.mark.slow
def test_two_process_end_to_end(tmp_path):
    """2 jax processes x 4 CPU devices: global mesh, gloo collectives,
    cross-process all_to_all exchange, disjoint output partitions."""
    path = _random_fasta(tmp_path, seed=7, n_reads=400)
    out = str(tmp_path / "mh.counts")
    worker = str(tmp_path / "worker.py")
    # pick a free coordinator port: a hardcoded one bind-collides with
    # concurrent suite runs (or a lingering worker) on the same machine
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    with open(worker, "w") as f:
        f.write(_WORKER % {"repo": REPO, "fasta": path, "out": out,
                           "port": port})
    env = dict(os.environ)
    _spawn_two(worker, env)

    total = merge_parts(out, 2)
    got = {}
    for line in open(out):
        kk, v = line.split()
        assert kk not in got          # partitions are disjoint
        got[kk] = int(v)
    assert total == len(got)
    golden = codec.golden_count(
        codec.encode_fasta(open(path, "rb").read())[0], 31)
    assert got == golden


_WORKER_CKPT = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, %(repo)r)
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from kaarme_tpu.parallel import multihost as mh
pid = int(sys.argv[1])
mh.init_distributed("localhost:%(port)d", 2, pid)
from kaarme_tpu.parallel.sharded_sort import ShardedSortConfig
mesh = mh.global_mesh("cpu")
def cfg():
    return ShardedSortConfig(k=31, min_abundance=1, batch_windows=1 << 12,
                             rows=1 << 6, prefix_cap=1 << 13)
def log(msg):
    print(f"[pid {pid}] {msg}", flush=True)
c = mh.MultiHostSortCounter(cfg(), mesh)
codes = mh.host_span_codes(%(fasta)r, pid, 2, 31)
# split at a separator so no window spans the two halves
seps = np.flatnonzero(codes >= 4)
cut = int(seps[len(seps) // 2]) + 1
log("count half 1")
c.count_codes(codes[:cut])
log("save")
c.save(%(ckpt)r)
log("load")
c2 = mh.multihost_load(%(ckpt)r, cfg(), mesh)
assert c2.stats["windows_processed"] > 0
log("count half 2")
c2.count_codes(codes[cut:])
log("write")
c2.write_output_part(%(out)r)
log("done")
"""


@pytest.mark.slow
def test_two_process_checkpoint_resume(tmp_path):
    """Multi-host save/load: each process snapshots its shards to a
    part file mid-run; fresh counters restore round-robin and finish.
    Merged output must equal the golden oracle exactly."""
    path = _random_fasta(tmp_path, seed=13, n_reads=300)
    out = str(tmp_path / "ck.counts")
    ckpt = str(tmp_path / "ck.npz")
    worker = str(tmp_path / "worker_ck.py")
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    with open(worker, "w") as f:
        f.write(_WORKER_CKPT % {"repo": REPO, "fasta": path, "out": out,
                                "port": port, "ckpt": ckpt})
    env = dict(os.environ)
    _spawn_two(worker, env)
    merge_parts(out, 2)
    got = {}
    for line in open(out):
        kk, v = line.split()
        assert kk not in got
        got[kk] = int(v)
    golden = codec.golden_count(
        codec.encode_fasta(open(path, "rb").read())[0], 31)
    assert got == golden
