"""HTTP LLM integration path (server_side/llm_client.py): the production
side of the BuilderAI / chat-bot LLM seam, proven against a loopback
OpenAI-compatible endpoint (zero-egress image, so the 'real endpoint' is an
in-process mock speaking the exact chat-completions wire format)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from substrata_tpu.server_side.llm_client import HTTPChatLLM, tools_as_openai


class MockOpenAI(BaseHTTPRequestHandler):
    """Scripted chat-completions endpoint: replies from server.script (a
    list of message dicts), recording each request body."""

    def do_POST(self):
        assert self.path == "/v1/chat/completions"
        n = int(self.headers["Content-Length"])
        body = json.loads(self.rfile.read(n))
        self.server.requests.append(
            {"body": body, "auth": self.headers.get("Authorization")})
        i = min(len(self.server.requests) - 1, len(self.server.script) - 1)
        msg = self.server.script[i]
        out = json.dumps({"choices": [{"message": msg,
                                       "finish_reason": "stop"}]}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):
        pass


@pytest.fixture
def mock_llm():
    srv = HTTPServer(("127.0.0.1", 0), MockOpenAI)
    srv.requests = []
    srv.script = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _url(srv):
    return f"http://127.0.0.1:{srv.server_address[1]}/v1"


def test_tool_call_loop_feeds_results_back(mock_llm):
    mock_llm.script = [
        {"role": "assistant", "content": "Building it now.",
         "tool_calls": [{"id": "call_1", "type": "function", "function": {
             "name": "create_cube",
             "arguments": json.dumps({"x": 1.0, "y": 2.0, "z": 0.0})}}]},
        {"role": "assistant", "content": "Done — cube uid 42 placed."},
    ]
    llm = HTTPChatLLM(_url(mock_llm), model="test-model", api_key="sk-test")
    gen = llm.run_turn("build a cube at (1,2,0)", ("create_cube",))
    events = []
    ev = next(gen)
    while True:
        events.append(ev)
        try:
            if ev[0] == "tool_call":
                ev = gen.send({"uid": 42, "ok": True})   # tool result
            else:
                ev = next(gen)
        except StopIteration:
            break
    kinds = [e[0] for e in events]
    assert kinds == ["text", "tool_call", "text"]
    assert events[1][1] == "create_cube" and events[1][2]["x"] == 1.0
    assert "42" in events[2][1]
    # Wire-format checks: auth header, tool specs, and the tool RESULT fed
    # back as a role=tool message on round 2.
    r1, r2 = mock_llm.requests
    assert r1["auth"] == "Bearer sk-test"
    assert r1["body"]["tools"][0]["function"]["name"] == "create_cube"
    assert "parameters" in r1["body"]["tools"][0]["function"]
    tool_msgs = [m for m in r2["body"]["messages"] if m["role"] == "tool"]
    assert len(tool_msgs) == 1
    assert json.loads(tool_msgs[0]["content"])["uid"] == 42
    assert tool_msgs[0]["tool_call_id"] == "call_1"


def test_builder_session_drives_http_llm(mock_llm):
    """Full BuilderAISession loop over the HTTP seam: tool executed through
    the real MCP layer, result returned to the model."""
    from substrata_tpu.net.server import ServerAllWorldsState
    from substrata_tpu.server_side.accounts import AccountStore, User
    from substrata_tpu.server_side.builder_ai import BuilderAISession
    from substrata_tpu.server_side.mcp import MCPEndpoint

    mock_llm.script = [
        {"role": "assistant", "content": None,
         "tool_calls": [{"id": "c1", "type": "function", "function": {
             "name": "create_cube",
             "arguments": json.dumps({"x": 0.0, "y": 0.0, "z": 1.0})}}]},
        {"role": "assistant", "content": "Placed your cube."},
    ]
    worlds = ServerAllWorldsState()
    mcp = MCPEndpoint(worlds, AccountStore())
    emitted = []
    done = threading.Event()

    def emit(kind, text):
        emitted.append((kind, text))
        if kind in ("turn_complete", "error"):
            done.set()

    llm = HTTPChatLLM(_url(mock_llm), model="m")
    s = BuilderAISession(mcp, User(user_id=1, name="u"), emit, llm=llm)
    s.user_message("build me a cube")
    assert done.wait(10.0)
    kinds = [k for k, _ in emitted]
    assert kinds[-1] == "turn_complete", emitted
    assert kinds.count("tool_activity") == 2     # call + result
    assert any(k == "text_delta" and "Placed" in t for k, t in emitted)
    # The object really exists in the world.
    with worlds.lock:
        w = worlds.get_world("")
        assert len(w.objects) == 1
    # Round 2 saw the real tool result.
    r2 = mock_llm.requests[1]["body"]
    tool_msgs = [m for m in r2["messages"] if m["role"] == "tool"]
    assert tool_msgs and "uid" in tool_msgs[0]["content"]


def test_chat_responder(mock_llm):
    mock_llm.script = [
        {"role": "assistant", "content": "Hello Alice!"},
    ]
    respond = HTTPChatLLM(_url(mock_llm), model="m").chat_responder()
    assert respond("Alice", "hi there") == "Hello Alice!"
    msgs = mock_llm.requests[0]["body"]["messages"]
    assert msgs[0]["role"] == "system"
    assert msgs[-1] == {"role": "user", "content": "Alice: hi there"}


def test_endpoint_error_surfaces(mock_llm):
    llm = HTTPChatLLM("http://127.0.0.1:1/v1", model="m", timeout=0.5)
    with pytest.raises(RuntimeError, match="unreachable"):
        list(llm.run_turn("hello", None))


def test_tools_as_openai_filters():
    from substrata_tpu.server_side.mcp import TOOLS
    out = tools_as_openai(TOOLS, names={"create_cube"})
    assert len(out) == 1
    assert out[0]["function"]["name"] == "create_cube"
    assert out[0]["function"]["parameters"]["type"] == "object"
