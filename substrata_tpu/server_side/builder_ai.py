"""BuilderAI: the server-side AI building assistant behind the
BuilderAI message family (shared/Protocol.h:15000-15013: BuilderAIUserMessage
/ BuilderAICancel from the client; BuilderAITextDelta / BuilderAIToolActivity
/ BuilderAITurnComplete / BuilderAIError streamed back).

The reference drives an LLM with the same tool specs as the MCP endpoint
(webserver/MCPHandlers.cpp getToolSpecs) and executes tool calls as the
requesting user.  Here the LLM is a pluggable seam (`responder`) — the
default is a deterministic scripted builder good enough to exercise the full
streaming wire path and the tool execution loop without network access; a
production deployment plugs a real LLM client into the same seam.
"""

from __future__ import annotations

import json
import re
import threading


class ScriptedBuilderLLM:
    """Deterministic fallback "LLM": parses simple build intents from the
    user message and emits tool calls.  Yields ("text", str) and
    ("tool_call", name, args) events."""

    _COUNT_RE = re.compile(r"(\d+)")
    _POS_RE = re.compile(
        r"at\s+\(?(-?\d+\.?\d*)[, ]+(-?\d+\.?\d*)[, ]+(-?\d+\.?\d*)\)?")

    def run_turn(self, user_text: str, tools):
        text = user_text.lower()
        m = self._POS_RE.search(text)
        pos = ([float(m.group(1)), float(m.group(2)), float(m.group(3))]
               if m else [0.0, 0.0, 1.0])
        if "sphere" in text:
            yield ("text", "Placing a sphere. ")
            yield ("tool_call", "create_sphere",
                   {"x": pos[0], "y": pos[1], "z": pos[2]})
        elif "cube" in text or "box" in text:
            count = 1
            cm = self._COUNT_RE.search(text)
            if cm and "at" not in text[:cm.start()]:
                count = min(int(cm.group(1)), 16)
            yield ("text", f"Placing {count} cube(s). ")
            for i in range(count):
                yield ("tool_call", "create_cube",
                       {"x": pos[0] + i * 1.2, "y": pos[1], "z": pos[2]})
        elif "delete" in text or "remove" in text:
            cm = self._COUNT_RE.search(text)
            if cm:
                yield ("text", f"Deleting object {cm.group(1)}. ")
                yield ("tool_call", "delete_object", {"uid": int(cm.group(1))})
            else:
                yield ("text", "Tell me which object uid to delete.")
        else:
            yield ("text", "I can build cubes and spheres — try "
                           "'build a cube at (1, 2, 0)'.")


class BuilderAISession:
    """One per connected client (the reference keeps per-WorkerThread
    BuilderAI state).  Runs each turn on its own thread and streams events
    through `emit(kind, payload_str)` where kind is one of 'text_delta',
    'tool_activity', 'turn_complete', 'error'."""

    def __init__(self, mcp_endpoint, user, emit, llm=None):
        self.mcp = mcp_endpoint
        self.user = user
        self.emit = emit
        self.llm = llm or ScriptedBuilderLLM()
        self._cancel = threading.Event()
        self._thread: threading.Thread | None = None

    @property
    def busy(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    def user_message(self, text: str):
        if self.busy:
            self.emit("error", "a turn is already running")
            return
        self._cancel.clear()
        self._thread = threading.Thread(target=self._run_turn, args=(text,),
                                        daemon=True)
        self._thread.start()

    def cancel(self):
        self._cancel.set()

    def _run_turn(self, text: str):
        # Drive the generator with send() so each tool's RESULT flows back
        # into the LLM's next round (the reference's agentic loop; a plain
        # for-loop would run tools blind).  Scripted generators that ignore
        # the sent value keep working unchanged.
        try:
            gen = self.llm.run_turn(text, self.mcp and TOOL_NAMES)
            result = None
            while True:
                try:
                    ev = gen.send(result) if result is not None else next(gen)
                except StopIteration:
                    break
                result = None
                if self._cancel.is_set():
                    self.emit("turn_complete", "cancelled")
                    return
                if ev[0] == "text":
                    self.emit("text_delta", ev[1])
                elif ev[0] == "tool_call":
                    _kind, name, args = ev
                    self.emit("tool_activity",
                              json.dumps({"tool": name, "args": args}))
                    result = self._call_tool(name, args)
                    self.emit("tool_activity",
                              json.dumps({"tool": name, "result": result}))
            self.emit("turn_complete", "")
        except Exception as e:
            self.emit("error", str(e))

    def _call_tool(self, name, args):
        """Execute through the MCP tool layer AS this session's user —
        same permission rules as the /mcp endpoint
        (MCPHandlers.cpp:1154-1160 handleToolCall-without-auth path)."""
        if self.mcp is None:
            return {"isError": True, "error": "no world state"}
        out = self.mcp._tools_call({"name": name, "arguments": args},
                                   self.user)
        if out.get("isError"):
            return {"isError": True,
                    "error": out["content"][0]["text"]}
        return json.loads(out["content"][0]["text"])


TOOL_NAMES = ("create_cube", "create_sphere", "create_object",
              "create_voxel_object", "edit_object", "delete_object",
              "list_objects_near", "get_object")
