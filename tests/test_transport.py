"""Socket-transport hardening: shutdown handshake + reconnect-on-drop.

Round-2 VERDICT Weak #3 observed an interpreter segfault with the fatal
thread in the daemon recv loop during suite teardown — the recv threads
had no shutdown handshake. These tests exercise the handshake (close
joins the recv threads), teardown under load, and the client's
reconnect-on-drop path (the reference relies on roscpp reconnects)."""

import threading
import time

from multi_orbslam3_tpu.collab.transport import (SocketTransportClient,
                                                 SocketTransportServer)


def _wait(fn, timeout=3.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        r = fn()
        if r:
            return r
        time.sleep(0.01)
    return fn()


def test_close_joins_recv_threads():
    srv = SocketTransportServer()
    cli = SocketTransportClient(agent=0, host="127.0.0.1", port=srv.port)
    cli.send_up(0, b"x" * 1000)
    assert _wait(lambda: srv.poll_up(0))
    cli.close()
    srv.close()
    assert not cli._thread.is_alive()
    assert not srv._accept_thread.is_alive()
    for t in srv._threads:
        assert not t.is_alive()
    # idempotent
    cli.close()
    srv.close()


def test_close_under_load():
    """Tear down while a sender thread is still pumping frames — the recv
    threads must exit without raising into the interpreter."""
    srv = SocketTransportServer()
    cli = SocketTransportClient(agent=1, host="127.0.0.1", port=srv.port)
    stop = threading.Event()

    def pump():
        i = 0
        while not stop.is_set() and i < 10000:
            try:
                cli.send_up(1, b"payload" * 50)
            except Exception:
                return
            i += 1

    t = threading.Thread(target=pump)
    t.start()
    _wait(lambda: srv.poll_up(1))
    srv.close()           # server goes first, mid-stream
    stop.set()
    t.join(timeout=5.0)
    cli.close()
    assert not cli._thread.is_alive()


def test_client_reconnects_after_server_restart():
    srv = SocketTransportServer()
    port = srv.port
    cli = SocketTransportClient(agent=2, host="127.0.0.1", port=port)
    cli.send_up(2, b"first")
    assert _wait(lambda: srv.poll_up(2)) == [b"first"]
    srv.close()
    time.sleep(0.1)
    # restart the server on the SAME port; the client reconnects and the
    # next uplink goes through
    srv2 = SocketTransportServer(port=port)
    got = []
    for _ in range(40):
        cli.send_up(2, b"second")
        got = _wait(lambda: srv2.poll_up(2), timeout=0.25)
        if got:
            break
    assert b"second" in got
    # downlink works over the re-registered connection
    srv2.send_down(2, b"reply")
    assert _wait(lambda: cli.poll_down(2)) == [b"reply"]
    cli.close()
    srv2.close()
