"""The terminal frontend (tools/terminal_client.py) — the SDL/Qt-client
stand-in — must drive the full ClientApp tick and render the world."""

import io
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


def test_demo_session_renders_world_and_fires_lua():
    import terminal_client

    out = io.StringIO()
    app = terminal_client.run_demo(frames=12, out=out)
    frame = re.sub(r"\x1b\[[0-9;]*m", "", out.getvalue())
    assert "P" in frame                       # player marker
    assert "!" in frame                       # the Lua-scripted object
    assert "#" in frame and "o" in frame      # boxes + spheres
    assert "magic cube" in frame              # Lua handler message in HUD
    assert len(app.objects) == 25
    # The player actually moved under input.
    import numpy as np
    eye = np.asarray(app.player.get_eye_position())
    assert np.linalg.norm(eye[:2]) > 0.3


def test_connect_mode_replicates_over_tcp_and_websocket():
    """--connect (and --ws) must actually replicate a live server's world:
    the reader thread was historically never started in this path."""
    import time

    import numpy as np

    from substrata_tpu.net.client import Client
    from substrata_tpu.net.server import Server
    from substrata_tpu.server_side.accounts import AccountStore
    from substrata_tpu.server_side.webserver import WebServer
    from substrata_tpu.shared.world_object import WorldObject
    import terminal_client as tc

    gs = Server(port=0, udp_port=0)
    gs.start()
    web = WebServer(AccountStore(), worlds_state=gs.worlds_state, port=0,
                    game_server=gs)
    web.start()
    feeder = Client("127.0.0.1", gs.port)
    feeder.start()
    feeder.send_create_object(WorldObject(
        model_url="cube.glb", flags=1, pos=np.array([3.0, 3.0, 0.5])))
    try:
        for connect, ws in ((("127.0.0.1", gs.port), False),
                            (("127.0.0.1", web.port), True)):
            app = tc._build_app(connect, ws=ws)
            # The first tick that loads a replicated object changes the
            # world's present-shape-type set, which recompiles the step
            # (~10 s on CPU; documented SimConfig behaviour) — so bound by
            # tick count, not a wall window one recompile can consume.
            for _ in range(100):
                app.timer_event(1 / 60)
                if len(app.objects) >= 1:
                    break
                time.sleep(0.02)   # pacing: a sleepless busy loop starves
                                   # the reader thread on single-core CI
            assert len(app.objects) >= 1, f"no replication (ws={ws})"
            app.client.stop()
    finally:
        feeder.stop()
        web.stop()
        gs.stop()
