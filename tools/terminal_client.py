"""Interactive terminal frontend — the headless stand-in for the reference's
SDL/Qt clients (gui_client/SDLClient.cpp, gui_client/MainWindow.cpp): a real
frontend driving the full ClientApp tick (input -> player physics -> world
replication -> events), rendering the world as an ANSI top-down view instead
of GL.

Modes:
  offline (default)       embedded world: terrain + objects + a --lua
                          scripted object, no server needed
  --connect HOST PORT     connect as a protocol client to a running server
                          (net/client.py), replicating its world
  --ws                    with --connect: HOST PORT is a WEBSERVER; connect
                          through its WebSocket upgrade (browser transport)
  --demo-frames N         non-interactive: run N frames of scripted input
                          and print the final frame (used by tests/CI)

Keys: W/A/S/D move, SHIFT run, SPACE jump, F fly toggle, E use nearest
object, T touch nearest object, Q quit.
"""

from __future__ import annotations

import argparse
import math
import os
import select
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_app(connect=None, ws=False):
    from substrata_tpu.client_app import ClientApp
    from substrata_tpu.physics.state import SimConfig

    client = None
    if connect is not None:
        from substrata_tpu.net.client import Client
        host, port = connect
        if ws:
            import socket as _socket

            from substrata_tpu.net.websocket import (ClientWebSocketStream,
                                                     client_handshake)
            raw = _socket.create_connection((host, int(port)), timeout=10)
            client_handshake(raw, f"{host}:{port}")
            client = Client(host, int(port),
                            sock=ClientWebSocketStream(raw))
        else:
            client = Client(host, int(port))
        client.start()      # reader thread: without it nothing replicates
    cfg = SimConfig(capacity=2048, max_pairs=8192, grid_dim=64, cell_size=4.0)
    app = ClientApp(client=client, config=cfg, enable_audio=False)
    return app


def _populate_offline_world(app):
    """A small demo world: undulating terrain, boxes, spheres, one Lua
    scripted object that reacts to touch."""
    from substrata_tpu.shared.world_object import WorldObject

    xs = np.linspace(0, 2 * math.pi, 33)
    hgrid = (1.5 * np.sin(xs)[:, None] * np.cos(xs)[None, :]).astype(np.float32)
    # Through the terrain system so BOTH the renderer's height queries and
    # the physics heightfield see it.
    app.terrain.set_heightmap(hgrid, origin=[-64, -64], cell_w=4.0)

    rng = np.random.default_rng(3)
    uid = 100
    for i in range(24):
        ob = WorldObject(uid=uid)
        ob.pos = np.array([rng.uniform(-20, 20), rng.uniform(-20, 20), 3.0])
        ob.model_url = "cube.bmesh" if i % 3 else "sphere.bmesh"
        app.create_object(ob)
        uid += 1
    scripted = WorldObject(uid=uid, script="""--lua
count = 0
addEventListener("onUserTouchedObject", this_object.uid, function(av, ob)
  count = count + 1
  showMessageToUser("you touched the magic cube! (" .. count .. ")")
end)
""")
    scripted.pos = np.array([4.0, 4.0, 2.0])
    scripted.model_url = "cube.bmesh"
    app.create_object(scripted)
    return scripted.uid


# ---------------------------------------------------------------------------
# ANSI renderer
# ---------------------------------------------------------------------------

_GLYPHS = {"box": "#", "sphere": "o", "scripted": "!", "avatar": "@"}


def render_frame(app, width=72, height=30, view_w=48.0):
    """Top-down ANSI frame centred on the player."""
    eye = np.asarray(app.player.get_eye_position(), np.float64)
    cx, cy = float(eye[0]), float(eye[1])
    cell_x = view_w / width
    cell_y = view_w * 0.5 / height    # chars are ~2x tall

    # Terrain shading via the device height query.
    xs = cx + (np.arange(width) - width / 2) * cell_x
    ys = cy + (np.arange(height) - height / 2) * cell_y
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel()], 1).astype(np.float32)
    h = np.asarray(app.terrain.eval_terrain_heights(pts)).reshape(height, width)
    hmin, hmax = float(h.min()), float(h.max())
    span = max(hmax - hmin, 1e-6)
    shade = ((h - hmin) / span * 5).astype(int)  # 0..5 -> greyscale ramp

    grid = [[(" ", 232 + 2 * shade[r, c]) for c in range(width)]
            for r in range(height)]

    def plot(wx, wy, ch, fg):
        c = int((wx - cx) / cell_x + width / 2)
        r = int((wy - cy) / cell_y + height / 2)
        if 0 <= r < height and 0 <= c < width:
            bg = grid[r][c][1] if isinstance(grid[r][c][1], int) else 232
            grid[r][c] = (ch, fg)

    for ob in app.objects.values():
        p = np.asarray(ob.pos, np.float64)
        if getattr(ob, "script", ""):
            plot(p[0], p[1], "!", 213)
        elif "sphere" in (ob.model_url or ""):
            plot(p[0], p[1], "o", 117)
        else:
            plot(p[0], p[1], "#", 215)
    if app.world_state is not None:
        for av in app.world_state.avatars_snapshot().values():
            p = np.asarray(av.pos, np.float64)
            plot(p[0], p[1], "@", 46)
    plot(cx, cy, "P", 196)

    lines = []
    for r in range(height):
        row = []
        for ch, col in grid[r]:
            if ch == " ":
                row.append(f"\x1b[48;5;{col}m ")
            else:
                row.append(f"\x1b[48;5;236m\x1b[38;5;{col}m{ch}\x1b[39m")
        lines.append("".join(row) + "\x1b[0m")
    msgs = app.script_vm.messages_to_user[-2:]
    status = (f" pos=({eye[0]:6.1f},{eye[1]:6.1f},{eye[2]:5.1f}) "
              f"objects={len(app.objects)} "
              f"{'online' if app.client else 'offline'} ")
    lines.append("\x1b[7m" + status.ljust(width)[:width] + "\x1b[0m")
    for mtxt in msgs:
        lines.append(("> " + mtxt)[:width])
    return "\n".join(lines)


def _nearest_object_uid(app, max_dist=5.0):
    eye = np.asarray(app.player.get_eye_position(), np.float64)
    best, best_d = None, max_dist
    for uid, ob in app.objects.items():
        d = float(np.linalg.norm(np.asarray(ob.pos, np.float64)[:2] - eye[:2]))
        if d < best_d:
            best, best_d = uid, d
    return best


# ---------------------------------------------------------------------------
# Main loops
# ---------------------------------------------------------------------------

def run_demo(frames: int, out=sys.stdout):
    """Scripted non-interactive session: walk toward the scripted cube,
    touch it, and print the final frame (frontend smoke-path for tests)."""
    from substrata_tpu.client_app import PlayerInput

    app = _build_app()
    scripted_uid = _populate_offline_world(app)
    frame = ""
    for i in range(frames):
        inp = PlayerInput(forward=1.0 if i < frames // 2 else 0.0,
                          right=1.0 if i < frames // 2 else 0.0)
        app.timer_event(1 / 30, inp)
        if i == frames // 2:
            app.script_vm.fire_user_touched_object(scripted_uid, avatar_uid=1)
    frame = render_frame(app)
    out.write(frame + "\n")
    return app


def run_interactive(connect=None, ws=False):
    import termios
    import tty

    from substrata_tpu.client_app import PlayerInput

    app = _build_app(connect, ws=ws)
    if connect is None:
        _populate_offline_world(app)

    fd = sys.stdin.fileno()
    old = termios.tcgetattr(fd)
    tty.setcbreak(fd)
    fly = False
    try:
        sys.stdout.write("\x1b[2J")      # clear
        last = time.monotonic()
        while True:
            keys = set()
            while select.select([sys.stdin], [], [], 0)[0]:
                keys.add(sys.stdin.read(1))
            if "q" in keys or "Q" in keys:
                break
            inp = PlayerInput(
                forward=(1.0 if "w" in keys else 0.0) - (1.0 if "s" in keys else 0.0),
                right=(1.0 if "d" in keys else 0.0) - (1.0 if "a" in keys else 0.0),
                up=1.0 if " " in keys else 0.0,
                run="W" in keys or "D" in keys,
                jump=" " in keys,
            )
            if "f" in keys:
                fly = not fly
                app.player.fly_mode = fly
            if "e" in keys or "t" in keys:
                uid = _nearest_object_uid(app)
                if uid is not None:
                    if "e" in keys and app.client is not None:
                        import struct
                        from substrata_tpu.net import protocol as P
                        app.client.send_message(P.make_message(
                            P.USER_USED_OBJECT_MESSAGE, struct.pack("<Q", uid)))
                    app.script_vm.fire_user_touched_object(
                        uid, avatar_uid=getattr(app.client, "avatar_uid", 0) or 0)
            now = time.monotonic()
            dt = min(now - last, 0.1)
            last = now
            app.timer_event(dt if dt > 0 else 1 / 30, inp)
            sys.stdout.write("\x1b[H" + render_frame(app) + "\n")
            sys.stdout.flush()
            time.sleep(max(0.0, 1 / 30 - (time.monotonic() - now)))
    finally:
        termios.tcsetattr(fd, termios.TCSADRAIN, old)
        sys.stdout.write("\x1b[0m\n")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--connect", nargs=2, metavar=("HOST", "PORT"))
    ap.add_argument("--ws", action="store_true",
                    help="connect through a webserver WebSocket upgrade")
    ap.add_argument("--demo-frames", type=int, default=0)
    args = ap.parse_args()
    if args.demo_frames:
        run_demo(args.demo_frames)
    else:
        run_interactive(tuple(args.connect) if args.connect else None,
                        ws=args.ws)


if __name__ == "__main__":
    main()
