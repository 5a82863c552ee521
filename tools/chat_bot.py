"""Chat bot: a headless protocol client that joins a world, watches chat and
replies through a pluggable response function.

Parity with server/ChatBot.* (LLM chatbots speaking the protocol; the
reference streams completions from an LLM API — the `respond_fn` here is
that seam; the default is a tiny rule-based responder so the bot works
without egress).

Usage: python tools/chat_bot.py --port 7600 --name Gerald
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from substrata_tpu.net.client import Client
from substrata_tpu.shared.avatar import Avatar


def default_responder(name: str, message: str) -> str | None:
    """Rule-based fallback (an LLM client plugs in via respond_fn)."""
    m = message.lower()
    if "hello" in m or "hi" in m:
        return "Hello! Welcome to the world."
    if "help" in m:
        return ("I can answer questions about this world. Try asking about "
                "parcels, vehicles, or building.")
    if m.endswith("?"):
        return "Good question — I'm a simple bot; an LLM backend can be plugged in."
    return None


class ChatBot:
    def __init__(self, host: str, port: int, name: str = "ChatBot",
                 world: str = "", respond_fn=None):
        self.name = name
        self.respond_fn = respond_fn or default_responder
        self.client = Client(host, port, world_name=world)
        self.client.start()
        self.client.send_avatar_created(Avatar(name=name))
        self.replies_sent = 0
        self._running = False

    def poll_once(self):
        ev = self.client.pop_events()
        for sender, msg in ev.chat:
            if sender == self.name:
                continue
            reply = self.respond_fn(sender, msg)
            if reply:
                self.client.send_chat(self.name, reply)
                self.replies_sent += 1

    def run(self, duration: float | None = None):
        self._running = True
        t0 = time.monotonic()
        while self._running and self.client.connected:
            self.poll_once()
            time.sleep(0.1)
            if duration is not None and time.monotonic() - t0 > duration:
                break

    def stop(self):
        self._running = False
        self.client.stop()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--name", default="ChatBot")
    ap.add_argument("--world", default="")
    args = ap.parse_args()
    bot = ChatBot(args.host, args.port, args.name, args.world)
    print(f"chat bot '{args.name}' connected as avatar {bot.client.avatar_uid}")
    bot.run()
