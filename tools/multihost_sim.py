"""Multi-host (N processes x M devices) codec round-trip simulation.

Launches N real OS processes, each a JAX "host" with M virtual CPU
devices, connected through jax.distributed (local coordinator) — the
JAX-documented multi-process topology, so per-host preflight, host-level
batch ownership, local-mesh device dispatch, and ordered cross-host
reassembly all run for real; only the transport under the collectives is
local.  See brotli_tpu/parallel/multihost.py.

Usage:
  python tools/multihost_sim.py                 # parent: spawn + report
  python tools/multihost_sim.py --worker I N M  # internal

Prints one JSON line: roundtrip_ok, processes, devices_per_process,
streams, and per-process wall seconds.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

PORT = int(os.environ.get("MULTIHOST_SIM_PORT", "0")) or 12973
CHUNK = 512


def worker(pid: int, nproc: int, ndev: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from brotli_tpu.parallel.multihost import (
        decode_multihost,
        encode_multihost,
        init_multihost,
    )

    init_multihost(f"localhost:{PORT}", pid, nproc, local_devices=ndev)
    data = open(
        "/root/reference/test/fixtures/vectors/alice29.txt", "rb"
    ).read()[: 4 * nproc * ndev * CHUNK]

    t0 = time.time()
    # encode: host backend (piece ownership + ordered gather are the
    # multi-host subject; device encode itself is dryrun-validated)
    streams = encode_multihost(
        data, chunk_size=CHUNK, piece_streams=2 * ndev, backend="host",
    )
    # decode: the real v2 device kernels on each host's local mesh
    got = decode_multihost(streams, interpret=True, group_size=ndev)
    dt = time.time() - t0
    ok = b"".join(got) == data
    print(json.dumps({
        "process": pid, "roundtrip_ok": bool(ok),
        "streams": len(streams), "wall_s": round(dt, 1),
    }), flush=True)
    if not ok:
        raise SystemExit(1)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return
    nproc, ndev = 2, 4
    # pick a free port for the coordinator (avoids collisions on reruns)
    import socket

    with socket.socket() as sk:
        sk.bind(("localhost", 0))
        port = sk.getsockname()[1]
    env = dict(os.environ, MULTIHOST_SIM_PORT=str(port))
    env.pop("XLA_FLAGS", None)   # workers set their own device count
    t0 = time.time()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--worker", str(i), str(nproc), str(ndev)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        )
        for i in range(nproc)
    ]
    outs = [p.communicate(timeout=900) for p in procs]
    ok = all(p.returncode == 0 for p in procs)
    lines = []
    for (so, se), p in zip(outs, procs):
        for ln in so.decode().splitlines():
            if ln.startswith("{"):
                lines.append(json.loads(ln))
        if p.returncode != 0:
            sys.stderr.write(se.decode()[-2000:])
    print(json.dumps({
        "multihost_sim": "ok" if ok else "FAILED",
        "processes": nproc, "devices_per_process": ndev,
        "global_devices": nproc * ndev,
        "wall_s": round(time.time() - t0, 1),
        "workers": lines,
    }))
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
