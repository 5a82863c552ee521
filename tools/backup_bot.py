"""Backup bot: headless protocol client that connects to a live server,
pulls the full world state (objects + parcels), and writes a timestamped
backup archive.  Parity with backup_bot/ (a headless protocol client doing
periodic world backups).

Usage: python tools/backup_bot.py --host 127.0.0.1 --port 7600 --out backups/
"""

from __future__ import annotations

import argparse
import io
import os
import struct
import sys
import time
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from substrata_tpu.net.client import Client


def backup_once(host: str, port: int, out_dir: str, world: str = "",
                settle_time: float = 2.0) -> str:
    os.makedirs(out_dir, exist_ok=True)
    c = Client(host, port, world_name=world)
    c.start()
    # Wait for the initial object send to drain.
    t0 = time.time()
    last_count = -1
    while time.time() - t0 < settle_time:
        with c.world_state.lock:
            n = c.world_state.num_objects()
        if n == last_count and n > 0:
            break
        last_count = n
        time.sleep(0.2)
    stamp = time.strftime("%Y%m%d_%H%M%S")
    path = os.path.join(out_dir, f"world_backup_{stamp}.zip")
    with c.world_state.lock:
        objects = list(c.world_state.objects_snapshot().values())
        parcels = list(c.world_state.parcels_snapshot().values())
    c.stop()
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for ob in objects:
            z.writestr(f"objects/{ob.uid}.bin", ob.to_bytes())
        for p in parcels:
            z.writestr(f"parcels/{p.parcel_id}.bin", p.to_bytes())
        z.writestr("manifest.txt",
                   f"objects: {len(objects)}\nparcels: {len(parcels)}\n"
                   f"time: {stamp}\nworld: {world or '(main)'}\n")
    return path


def restore_into_server(path: str, host: str, port: int, world: str = ""):
    """Replay a backup into a (fresh) server via ObjectCreated messages."""
    from substrata_tpu.shared.world_object import WorldObject
    c = Client(host, port, world_name=world)
    c.start()
    n = 0
    with zipfile.ZipFile(path) as z:
        for name in z.namelist():
            if name.startswith("objects/"):
                ob = WorldObject.from_bytes(z.read(name))
                ob.uid = 0  # server re-allocates
                c.send_create_object(ob)
                n += 1
    time.sleep(0.5)
    c.stop()
    return n


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", default="backups")
    ap.add_argument("--world", default="")
    ap.add_argument("--restore", default=None, help="backup zip to replay")
    args = ap.parse_args()
    if args.restore:
        n = restore_into_server(args.restore, args.host, args.port, args.world)
        print(f"restored {n} objects")
    else:
        print(backup_once(args.host, args.port, args.out, args.world))
