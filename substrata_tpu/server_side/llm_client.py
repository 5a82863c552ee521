"""HTTP LLM client for BuilderAI and the chat bot.

The reference's BuilderAI drives a hosted LLM with the MCP tool specs and
executes tool calls as the requesting user (server/BuilderAISession,
webserver/MCPHandlers.cpp getToolSpecs).  This module is the production
side of the pluggable ``llm`` seam in `builder_ai.py`: an OpenAI-compatible
``/v1/chat/completions`` client (the de-facto self-hosting standard —
vLLM, llama.cpp, LM Studio, most gateways speak it) implementing the same
``run_turn`` generator protocol as ScriptedBuilderLLM, with a multi-round
function-calling loop.

Generator protocol (driven by BuilderAISession._run_turn):

- yields ``("text", str)`` for assistant text,
- yields ``("tool_call", name, args)`` for each tool call; the driver
  executes the tool and ``send()``s the JSON-able result back into the
  generator, which feeds it to the next model round as a ``tool`` message.

stdlib-only (urllib) — no extra dependencies, works against a loopback
server in tests (zero-egress image).
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

BUILDER_SYSTEM_PROMPT = (
    "You are Substrata's builder assistant. You build and edit objects in "
    "the user's 3D world using the provided tools. Positions are metres, "
    "z-up, ground at z=0. Keep replies short.")

CHAT_SYSTEM_PROMPT = (
    "You are a friendly in-world chat bot in the Substrata metaverse. "
    "Reply conversationally and briefly; no markdown.")


def tools_as_openai(tool_specs, names=None):
    """MCP tool specs (mcp.TOOLS rows: name/description/inputSchema) ->
    OpenAI function-calling format."""
    out = []
    for t in tool_specs:
        if names is not None and t["name"] not in names:
            continue
        out.append({"type": "function", "function": {
            "name": t["name"], "description": t["description"],
            "parameters": t["inputSchema"]}})
    return out


class HTTPChatLLM:
    """OpenAI-compatible chat-completions client implementing the
    BuilderAI ``run_turn`` seam."""

    def __init__(self, base_url: str, model: str, api_key: str | None = None,
                 system_prompt: str = BUILDER_SYSTEM_PROMPT,
                 tool_specs=None, timeout: float = 60.0,
                 max_tool_rounds: int = 8, temperature: float = 0.2):
        self.url = base_url.rstrip("/") + "/chat/completions"
        self.model = model
        self.api_key = api_key
        self.system_prompt = system_prompt
        self.tool_specs = tool_specs
        self.timeout = timeout
        self.max_tool_rounds = max_tool_rounds
        self.temperature = temperature

    # -- transport ---------------------------------------------------------
    def _post(self, payload: dict) -> dict:
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        req = urllib.request.Request(
            self.url, data=json.dumps(payload).encode(), headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as e:
            body = e.read()[:500].decode(errors="replace")
            raise RuntimeError(f"LLM endpoint {e.code}: {body}") from e
        except urllib.error.URLError as e:
            raise RuntimeError(f"LLM endpoint unreachable: {e.reason}") from e

    # -- BuilderAI seam ------------------------------------------------------
    def run_turn(self, user_text: str, tools=None):
        if self.tool_specs is None and tools:
            from substrata_tpu.server_side import mcp
            specs = tools_as_openai(mcp.TOOLS, names=set(tools))
        else:
            specs = tools_as_openai(self.tool_specs or [], names=tools and
                                    set(tools))
        messages = [{"role": "system", "content": self.system_prompt},
                    {"role": "user", "content": user_text}]
        for _round in range(self.max_tool_rounds):
            payload = {"model": self.model, "messages": messages,
                       "temperature": self.temperature}
            if specs:
                payload["tools"] = specs
            resp = self._post(payload)
            msg = resp["choices"][0]["message"]
            if msg.get("content"):
                yield ("text", msg["content"])
            calls = msg.get("tool_calls") or []
            if not calls:
                return
            messages.append({"role": "assistant",
                             "content": msg.get("content") or None,
                             "tool_calls": calls})
            for call in calls:
                fn = call["function"]
                try:
                    args = json.loads(fn.get("arguments") or "{}")
                except json.JSONDecodeError:
                    args = {}
                # The driver executes the tool and sends back the result.
                result = yield ("tool_call", fn["name"], args)
                messages.append({"role": "tool",
                                 "tool_call_id": call.get("id", fn["name"]),
                                 "content": json.dumps(result)})
        yield ("text", "(stopped: tool-call round limit reached)")

    # -- chat-bot seam (tools/chat_bot.py respond_fn) ------------------------
    def chat_responder(self):
        """A (name, message) -> reply | None callable for ChatBot, with a
        rolling per-speaker-agnostic history window."""
        history: list[dict] = []

        def respond(name: str, message: str) -> str | None:
            history.append({"role": "user",
                            "content": f"{name}: {message}"})
            del history[:-16]
            resp = self._post({
                "model": self.model, "temperature": self.temperature,
                "messages": [{"role": "system",
                              "content": CHAT_SYSTEM_PROMPT},
                             *history]})
            out = resp["choices"][0]["message"].get("content") or None
            if out:
                history.append({"role": "assistant", "content": out})
            return out

        return respond
