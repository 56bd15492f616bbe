"""TRUE multi-process distributed run (SURVEY.md §4: "multi-host logic
testable with jax.distributed multi-process-on-one-machine").

The other distributed tests share one process with 8 virtual devices; this
one spawns TWO separate processes (4 devices each) connected by
``jax.distributed.initialize`` — real cross-process collectives (Gloo on
CPU; the identical XLA program rides ICI/DCN on a pod) — and asserts in
``_mp_child.py`` that the sharded run matches the unsharded reference, the
per-process checkpoint shards reassemble bit-exactly, and the host-0
NetCDF gather writes only on process 0.
"""

import os
import socket
import subprocess
import sys

_CHILD = os.path.join(os.path.dirname(__file__), "_mp_child.py")
_REPO = os.path.join(os.path.dirname(__file__), "..", "..")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dcn_run(tmp_path):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, _CHILD, str(i), "2", str(port), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=_REPO) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=360)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert f"CHILD{i} OK" in out, f"proc {i} missing marker:\n{out[-2000:]}"
