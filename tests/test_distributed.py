"""Two-process `jax.distributed` bring-up over localhost (VERDICT r4 #6).

`parallel/mesh.py:32-82` (initialize_distributed / make_multihost_mesh)
implements the multi-host wiring the 4-host BASELINE target depends on;
until this test it had zero coverage.  Two CPU processes with 2 virtual
devices each form a (data=2, map=2) mesh: the coordinator channel is the
DCN stand-in, the within-process device pairs are the ICI domain.  Each
worker checks mesh layout, a global psum, and that one sharded local-BA
step matches the single-process result bit-for-tolerance (the psum claim
of parallel/ba.py across real process boundaries).
"""

import os
import socket
import subprocess
import sys

import pytest

# share the "spmd" loadgroup with test_parallel.py: the worker subprocesses
# here run their own in-process collectives and must not overlap another
# xdist worker's mesh rendezvous on a 2-core host (see test_parallel.py)
pytestmark = pytest.mark.xdist_group("spmd")

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_mesh_psum_and_sharded_ba():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, coord, "2", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out: "
                    + "; ".join(f"rc={o[0]}" for o in outs))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:{out}\nstderr:{err}"
        assert out.splitlines()[-1].startswith("OK "), out
    # both processes agree on the replicated chi2
    chis = {o[1].splitlines()[-1].split()[1] for o in outs}
    assert len(chis) == 1, chis
