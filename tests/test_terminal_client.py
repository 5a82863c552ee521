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
