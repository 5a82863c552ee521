"""End-to-end demo: the full networked tick (BASELINE config 5 slice).

Boots a server, two full clients (ClientApp), a chat bot, a voice link and
the web site in one process; client A spawns terrain-bound objects and a
drivable hovercar, drives it; client B replicates everything via snapshots;
a map tile and a world backup are written at the end.

Run: python tools/demo_networked_world.py   (CPU by default; add --tpu)

The game plane runs TLS by default (dev cert, reference ListenerThread.cpp
parity) — Server() and Client() defaults handle it.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(use_tpu: bool = False, ticks: int = 240):
    if not use_tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from substrata_tpu.client_app import ClientApp, PlayerInput
    from substrata_tpu.net.client import Client
    from substrata_tpu.net.server import Server
    from substrata_tpu.physics.state import SimConfig
    from substrata_tpu.server_side.accounts import AccountStore
    from substrata_tpu.server_side.webserver import WebServer
    from substrata_tpu.shared.world_object import DYNAMIC_FLAG, WorldObject
    from backup_bot import backup_once
    from chat_bot import ChatBot
    from screenshot_bot import screenshot_once

    print("== boot server + web ==")
    server = Server(port=0, udp_port=0, db_path="/tmp/demo_world.db")
    server.start()
    web = WebServer(AccountStore(), worlds_state=server.worlds_state, port=0)
    web.start()
    print(f"game port {server.port}, udp {server.udp_port}, web {web.port}")

    cfg = SimConfig(capacity=256, max_pairs=1024, grid_dim=32, cell_size=4.0,
                    solver_iters=6)
    ca = Client("127.0.0.1", server.port); ca.start()
    cb = Client("127.0.0.1", server.port); cb.start()
    app_a = ClientApp(client=ca, config=cfg, enable_audio=False)
    app_b = ClientApp(client=cb, config=cfg, enable_audio=False)
    bot = ChatBot("127.0.0.1", server.port, name="Gerald")

    print("== A builds the world ==")
    for i in range(12):
        app_a.create_object(WorldObject(
            flags=DYNAMIC_FLAG | 1, mass=30.0,
            pos=np.array([4 + (i % 4) * 1.5, (i // 4) * 1.5, 2.0 + i * 0.1])))
    car = app_a.create_object(WorldObject(
        flags=DYNAMIC_FLAG | 1, mass=500.0, pos=np.array([0.0, 3.0, 1.0]),
        script="<script><hover_car/></script>"))
    assert app_a.enter_vehicle(car.uid)
    ca.send_chat("alice", "hello everyone")

    print("== run the tick ==")
    dt = 1 / 60
    for t in range(ticks):
        app_a.timer_event(dt, PlayerInput(forward=1.0))
        app_b.timer_event(dt)
        bot.poll_once()
        time.sleep(0.001)

    print("A diagnostics:\n" + app_a.get_diagnostics())
    print(f"A drove the hovercar to y={car.pos[1]:.1f}")
    b_car = app_b.objects.get(car.uid)
    print(f"B sees {len(app_b.objects)} objects; car replica at "
          f"y={b_car.pos[1]:.1f}" if b_car else "B missing car!")
    print("chat log on A:", [m for m in app_a.log_messages if "chat" in m])
    print(f"server: {server.get_diagnostics()}")

    print("== backup + map tile ==")
    tile = screenshot_once("127.0.0.1", server.port, "/tmp/demo_tile.png",
                           center=(4, 2), tile_w=40, settle=0.5)
    backup = backup_once("127.0.0.1", server.port, "/tmp/demo_backups")
    print(f"map tile: {tile}\nbackup: {backup}")

    app_a.exit_vehicle()
    bot.stop(); ca.stop(); cb.stop(); web.stop(); server.stop()
    ok = b_car is not None and b_car.pos[1] > 3.5 and car.pos[1] > 3.5
    print("DEMO", "OK" if ok else "FAILED: car did not replicate/move")
    return 0 if ok else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--ticks", type=int, default=240)
    args = ap.parse_args()
    sys.exit(main(args.tpu, args.ticks))
