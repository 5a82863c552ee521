"""Server load-test harness: N bot clients spamming avatar movement.

Parity with stress_test/StressTest.cpp:59-120 — each bot does the real
handshake against a live server and streams avatar transform updates on a
walk pattern; the harness reports connect failures and message throughput.

Usage:  python tools/stress_test.py [--bots 32] [--seconds 10] [--port P]
        (no --port: spins up an in-process loopback server)
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from substrata_tpu.net import tls
from substrata_tpu.net.client import Client
from substrata_tpu.net.server import Server
from substrata_tpu.shared.avatar import Avatar


class BotThread(threading.Thread):
    """One bot: connect, create avatar, walk a circle at ~60 Hz updates
    (StressTest bot behaviour).  ``ws_port`` set -> connect through the
    webserver's WebSocket upgrade instead of raw TCP (loads the browser
    transport path, net/websocket.py)."""

    def __init__(self, host: str, port: int, bot_id: int, duration: float,
                 update_hz: float = 60.0, ws_port: int | None = None,
                 plaintext: bool = False):
        super().__init__(daemon=True)
        self.host, self.port = host, port
        self.bot_id = bot_id
        self.duration = duration
        self.update_hz = update_hz
        self.ws_port = ws_port
        self.plaintext = plaintext
        self.sent = 0
        self.error: str | None = None

    def _connect_ws(self) -> Client:
        import socket as _socket

        from substrata_tpu.net.websocket import (ClientWebSocketStream,
                                                 client_handshake)
        raw = _socket.create_connection((self.host, self.ws_port), timeout=10)
        client_handshake(raw, f"{self.host}:{self.ws_port}")
        return ClientWebSocketStream(raw)

    def run(self):
        try:
            if self.ws_port is not None:
                c = Client(self.host, self.port, sock=self._connect_ws())
            else:
                # Default = TLS with the dev cert (the server defaults to a
                # TLS listener; reference parity, ListenerThread.cpp).
                c = Client(self.host, self.port,
                           tls_context=None if self.plaintext else tls.DEV_TLS)
            c.start()
            c.send_avatar_created(Avatar(name=f"bot{self.bot_id}"))
            t0 = time.monotonic()
            r = 5.0 + (self.bot_id % 7)
            while time.monotonic() - t0 < self.duration:
                t = time.monotonic() - t0
                pos = [r * math.cos(t + self.bot_id), r * math.sin(t + self.bot_id), 1.67]
                c.send_avatar_transform(pos, [0.0, 0.0, t % (2 * math.pi)])
                self.sent += 1
                time.sleep(1.0 / self.update_hz)
            c.stop()
        except Exception as e:  # bots report, not crash, the harness
            self.error = f"{type(e).__name__}: {e}"


def run_stress_test(n_bots: int = 16, seconds: float = 5.0,
                    host: str = "127.0.0.1", port: int | None = None,
                    ws_frac: float = 0.0, plaintext: bool = False):
    """``ws_frac`` of the bots connect through the webserver's WebSocket
    upgrade (the browser transport); the rest use TCP+TLS (dev cert, the
    default game plane) — ``plaintext=True`` is the explicit opt-out."""
    own_server = None
    own_web = None
    ws_port = None
    if port is None:
        own_server = Server(port=0, udp_port=0,
                            tls_context=None if plaintext else tls.DEV_TLS)
        own_server.start()
        port = own_server.port
        if ws_frac > 0:
            from substrata_tpu.server_side.accounts import AccountStore
            from substrata_tpu.server_side.webserver import WebServer
            own_web = WebServer(AccountStore(),
                                worlds_state=own_server.worlds_state,
                                port=0, game_server=own_server)
            own_web.start()
            ws_port = own_web.port
    n_ws = int(round(n_bots * ws_frac)) if ws_port is not None else 0
    bots = [BotThread(host, port, i, seconds,
                      ws_port=(ws_port if i < n_ws else None),
                      plaintext=plaintext)
            for i in range(n_bots)]
    t0 = time.monotonic()
    for b in bots:
        b.start()
        time.sleep(0.01)  # stagger connects like real clients
    for b in bots:
        b.join(timeout=seconds + 10)
    wall = time.monotonic() - t0
    total_sent = sum(b.sent for b in bots)
    errors = [b.error for b in bots if b.error]
    stats = {
        "bots": n_bots,
        "websocket_bots": sum(1 for b in bots if b.ws_port is not None),
        "seconds": seconds,
        "messages_sent": total_sent,
        "msgs_per_sec": total_sent / wall,
        "errors": errors,
        "server_diagnostics": own_server.get_diagnostics() if own_server else "",
    }
    if own_web is not None:
        own_web.stop()
    if own_server is not None:
        own_server.stop()
    return stats


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--bots", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--ws-frac", type=float, default=0.0,
                    help="fraction of bots connecting over WebSocket")
    ap.add_argument("--plaintext", action="store_true",
                    help="explicit opt-out from the default TLS game plane")
    args = ap.parse_args()
    stats = run_stress_test(args.bots, args.seconds, args.host, args.port,
                            ws_frac=args.ws_frac, plaintext=args.plaintext)
    for k, v in stats.items():
        print(f"{k}: {v}")
