"""Injectable transports for the client<->server delta streams.

The reference touches ROS only through mPubMap/mSubMap
(src/Communicator.cc:110-153) — the injectability SURVEY.md §4 calls out
as the test seam. Same here: systems talk to a Transport interface;
tests and single-host runs use in-process queues; a TCP length-prefixed
socket transport covers true multi-process deployments (the gRPC/DCN
slot). Payloads are opaque bytes (MapDelta.to_bytes)."""

from __future__ import annotations

import collections
import socket
import struct
import threading
from typing import Dict, List, Optional


class Transport:
    """Bidirectional channel endpoints keyed by (agent_id, direction)."""

    def send_up(self, agent: int, payload: bytes) -> None:      # client -> server
        raise NotImplementedError

    def send_down(self, agent: int, payload: bytes) -> None:    # server -> client
        raise NotImplementedError

    def poll_up(self, agent: int) -> List[bytes]:               # server side
        raise NotImplementedError

    def poll_down(self, agent: int) -> List[bytes]:             # client side
        raise NotImplementedError


class InProcessTransport(Transport):
    """Queue-pair transport for tests and single-process multi-agent runs."""

    def __init__(self):
        self._up: Dict[int, collections.deque] = collections.defaultdict(
            collections.deque)
        self._down: Dict[int, collections.deque] = collections.defaultdict(
            collections.deque)
        self._lock = threading.Lock()
        self.bytes_up = 0
        self.bytes_down = 0

    def send_up(self, agent: int, payload: bytes) -> None:
        with self._lock:
            self._up[agent].append(payload)
            self.bytes_up += len(payload)

    def send_down(self, agent: int, payload: bytes) -> None:
        with self._lock:
            self._down[agent].append(payload)
            self.bytes_down += len(payload)

    def _drain(self, q) -> List[bytes]:
        out = []
        with self._lock:
            while q:
                out.append(q.popleft())
        return out

    def poll_up(self, agent: int) -> List[bytes]:
        return self._drain(self._up[agent])

    def poll_down(self, agent: int) -> List[bytes]:
        return self._drain(self._down[agent])


# ---------------------------------------------------------------------------
# Length-prefixed TCP transport (multi-process deployments).
# Frame: uint32 agent | uint8 direction (0 up, 1 down) | uint32 len | bytes.
# ---------------------------------------------------------------------------

_HDR = struct.Struct(">IBI")


class SocketTransportServer(Transport):
    """Server-side endpoint: accepts one connection per client process."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(16)
        self.port = self._srv.getsockname()[1]
        self._conns: Dict[int, socket.socket] = {}
        self._inbox: Dict[int, collections.deque] = collections.defaultdict(
            collections.deque)
        self._lock = threading.Lock()
        self._accept_thread = threading.Thread(target=self._accept_loop,
                                               daemon=True)
        self._accept_thread.start()

    def _accept_loop(self):
        while True:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._recv_loop, args=(conn,),
                             daemon=True).start()

    def _recv_loop(self, conn: socket.socket):
        try:
            while True:
                hdr = _recv_exact(conn, _HDR.size)
                if hdr is None:
                    return
                agent, direction, ln = _HDR.unpack(hdr)
                payload = _recv_exact(conn, ln)
                if payload is None:
                    return
                with self._lock:
                    self._conns[agent] = conn
                    self._inbox[agent].append(payload)
        except OSError:
            return

    def send_down(self, agent: int, payload: bytes) -> None:
        with self._lock:
            conn = self._conns.get(agent)
        if conn is not None:
            conn.sendall(_HDR.pack(agent, 1, len(payload)) + payload)

    def poll_up(self, agent: int) -> List[bytes]:
        out = []
        with self._lock:
            q = self._inbox[agent]
            while q:
                out.append(q.popleft())
        return out

    def send_up(self, agent: int, payload: bytes) -> None:
        raise RuntimeError("server endpoint cannot send_up")

    def poll_down(self, agent: int) -> List[bytes]:
        raise RuntimeError("server endpoint cannot poll_down")

    def close(self):
        self._srv.close()


class SocketTransportClient(Transport):
    """Client-side endpoint for one agent."""

    def __init__(self, agent: int, host: str, port: int):
        self.agent = agent
        self._sock = socket.create_connection((host, port))
        self._inbox: collections.deque = collections.deque()
        self._lock = threading.Lock()
        threading.Thread(target=self._recv_loop, daemon=True).start()

    def _recv_loop(self):
        try:
            while True:
                hdr = _recv_exact(self._sock, _HDR.size)
                if hdr is None:
                    return
                _, _, ln = _HDR.unpack(hdr)
                payload = _recv_exact(self._sock, ln)
                if payload is None:
                    return
                with self._lock:
                    self._inbox.append(payload)
        except OSError:
            return

    def send_up(self, agent: int, payload: bytes) -> None:
        self._sock.sendall(_HDR.pack(self.agent, 0, len(payload)) + payload)

    def poll_down(self, agent: int) -> List[bytes]:
        out = []
        with self._lock:
            while self._inbox:
                out.append(self._inbox.popleft())
        return out

    def send_down(self, agent: int, payload: bytes) -> None:
        raise RuntimeError("client endpoint cannot send_down")

    def poll_up(self, agent: int) -> List[bytes]:
        raise RuntimeError("client endpoint cannot poll_up")

    def close(self):
        self._sock.close()


def _recv_exact(conn: socket.socket, n: int) -> Optional[bytes]:
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf
