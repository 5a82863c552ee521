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

from substrata_tpu.net.client import Client
from substrata_tpu.net.server import Server
from substrata_tpu.shared.avatar import Avatar


class BotThread(threading.Thread):
    """One bot: connect, create avatar, walk a circle at ~60 Hz updates
    (StressTest bot behaviour)."""

    def __init__(self, host: str, port: int, bot_id: int, duration: float,
                 update_hz: float = 60.0):
        super().__init__(daemon=True)
        self.host, self.port = host, port
        self.bot_id = bot_id
        self.duration = duration
        self.update_hz = update_hz
        self.sent = 0
        self.error: str | None = None

    def run(self):
        try:
            c = Client(self.host, self.port)
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
                    host: str = "127.0.0.1", port: int | None = None):
    own_server = None
    if port is None:
        own_server = Server(port=0, udp_port=0)
        own_server.start()
        port = own_server.port
    bots = [BotThread(host, port, i, seconds) for i in range(n_bots)]
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
        "seconds": seconds,
        "messages_sent": total_sent,
        "msgs_per_sec": total_sent / wall,
        "errors": errors,
        "server_diagnostics": own_server.get_diagnostics() if own_server else "",
    }
    if own_server is not None:
        own_server.stop()
    return stats


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--bots", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=None)
    args = ap.parse_args()
    stats = run_stress_test(args.bots, args.seconds, args.host, args.port)
    for k, v in stats.items():
        print(f"{k}: {v}")
