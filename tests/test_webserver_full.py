"""Full webserver route surface: auctions/orders, news, events, worlds,
screenshots/tiles, admin gating on the god-user model, API keys/secrets,
ERC-721 metadata, and the MCP JSON-RPC endpoint (webserver/ +
MCPHandlers.cpp parity)."""

import http.client
import json
import time
import urllib.parse

import numpy as np
import pytest

from substrata_tpu.net.server import ServerAllWorldsState
from substrata_tpu.server_side.accounts import AccountStore
from substrata_tpu.server_side.webserver import WebServer
from substrata_tpu.shared.parcel import Parcel


FORM = {"Content-Type": "application/x-www-form-urlencoded"}


@pytest.fixture
def site():
    store = AccountStore()
    admin = store.create_user("admin", "a@x", "adminpw1")   # id 1 = god user
    alice = store.create_user("alice", "al@x", "alicepw1")
    worlds = ServerAllWorldsState()
    w = worlds.get_world("")
    w.parcels[7] = Parcel(parcel_id=7, owner_id=0,
                          aabb_min=np.array([0., 0., 0.]),
                          aabb_max=np.array([20., 20., 10.]))
    ws = WebServer(store, worlds_state=worlds, port=0)
    ws.start()
    yield ws, store, worlds
    ws.stop()


def _conn(ws):
    return http.client.HTTPConnection("127.0.0.1", ws.port, timeout=10)


def _login(conn, name, pw):
    body = urllib.parse.urlencode({"username": name, "password": pw})
    conn.request("POST", "/login_post", body, FORM)
    r = conn.getresponse()
    cookie = r.getheader("Set-Cookie")
    r.read()
    assert r.status == 200, r.status
    return {"Cookie": cookie.split(";")[0]}


def _get(conn, path, headers=None):
    conn.request("GET", path, headers=headers or {})
    r = conn.getresponse()
    return r.status, r.read().decode("utf-8", "replace")


def _post(conn, path, fields, headers=None):
    h = dict(FORM)
    h.update(headers or {})
    conn.request("POST", path, urllib.parse.urlencode(fields), h)
    r = conn.getresponse()
    return r.status, r.read().decode("utf-8", "replace")


def test_info_pages_and_cookie_flags(site):
    ws, store, worlds = site
    conn = _conn(ws)
    for path in ("/terms", "/about_substrata", "/about_parcel_sales",
                 "/about_scripting", "/faq", "/map"):
        status, body = _get(conn, path)
        assert status == 200, path
    body = urllib.parse.urlencode({"username": "alice",
                                   "password": "alicepw1"})
    conn.request("POST", "/login_post", body, FORM)
    r = conn.getresponse()
    cookie = r.getheader("Set-Cookie")
    r.read()
    assert "HttpOnly" in cookie and "SameSite=Lax" in cookie


def test_auction_buy_flow_and_orders(site):
    ws, store, worlds = site
    conn = _conn(ws)
    admin_h = _login(conn, "admin", "adminpw1")

    status, body = _post(conn, "/admin_create_parcel_auction_post",
                         {"parcel_id": 7, "start_price": 1000,
                          "end_price": 100, "duration_hours": 48}, admin_h)
    assert status == 200 and "auction 1 created" in body

    status, body = _get(conn, "/parcel_auction_list")
    assert status == 200 and "parcel 7" in body

    alice_h = _login(conn, "alice", "alicepw1")
    status, body = _post(conn, "/buy_parcel_now", {"auction_id": 1}, alice_h)
    assert status == 200 and "bought parcel 7" in body

    a = store.auctions[1]
    assert a.sold_to_user_id == 2
    assert worlds.get_world("").parcels[7].owner_id == 2
    assert store.orders[1].confirmed

    status, body = _get(conn, "/order/1", alice_h)
    assert status == 200 and "confirmed" in body
    status, body = _get(conn, "/recent_parcel_sales")
    assert "parcel 7 sold" in body


def test_parcel_edit_permissions(site):
    ws, store, worlds = site
    conn = _conn(ws)
    alice_h = _login(conn, "alice", "alicepw1")
    # alice does not own parcel 7 yet
    status, _ = _post(conn, "/edit_parcel_title_post",
                      {"parcel_id": 7, "title": "mine"}, alice_h)
    assert status == 403
    worlds.get_world("").parcels[7].owner_id = 2
    status, _ = _post(conn, "/edit_parcel_title_post",
                      {"parcel_id": 7, "title": "Alice's plot"}, alice_h)
    assert status == 200
    status, body = _get(conn, "/parcel/7")
    assert "Alice&#x27;s plot" in body or "Alice's plot" in body
    # add a writer by name
    status, _ = _post(conn, "/add_parcel_writer_post",
                      {"parcel_id": 7, "writer_name": "admin"}, alice_h)
    assert status == 200
    assert 1 in worlds.get_world("").parcels[7].writer_ids


def test_news_events_worlds(site):
    ws, store, worlds = site
    conn = _conn(ws)
    admin_h = _login(conn, "admin", "adminpw1")
    alice_h = _login(conn, "alice", "alicepw1")

    # news: admin-only create
    status, _ = _post(conn, "/admin_new_news_post",
                      {"title": "v2 launch", "content": "hello"}, alice_h)
    assert status == 403
    status, _ = _post(conn, "/admin_new_news_post",
                      {"title": "v2 launch", "content": "hello"}, admin_h)
    assert status == 200
    status, body = _get(conn, "/news")
    assert "v2 launch" in body
    status, body = _get(conn, "/news_post/1")
    assert "hello" in body

    # events: any user may create
    status, body = _post(conn, "/create_event_post",
                         {"world_name": "", "title": "rave",
                          "description": "bring glowsticks",
                          "start_time": time.time(),
                          "end_time": time.time() + 3600}, alice_h)
    assert status == 200
    status, body = _get(conn, "/events")
    assert "rave" in body
    # only creator/admin can delete
    status, _ = _post(conn, "/delete_event_post", {"event_id": 1}, admin_h)
    assert status == 200

    # worlds
    status, _ = _post(conn, "/create_world_post",
                      {"name": "moon", "description": "low gravity"},
                      alice_h)
    assert status == 200
    status, body = _get(conn, "/worlds")
    assert "moon" in body
    status, body = _get(conn, "/world/moon")
    assert "low gravity" in body


def test_screenshots_tiles_and_erc721(site):
    ws, store, worlds = site
    conn = _conn(ws)
    s = ws.site_data.add_screenshot(b"\x89PNG fake")
    t = ws.site_data.add_screenshot(b"\x89PNG tile", is_map_tile=True,
                                    tile_x=3, tile_y=-1, tile_z=0)
    status, body = _get(conn, f"/screenshot/{s.screenshot_id}")
    assert status == 200 and "PNG fake" in body
    status, body = _get(conn, "/tile?x=3&y=-1&z=0")
    assert status == 200 and "tile" in body
    status, body = _get(conn, "/tile?x=9&y=9&z=9")
    assert status == 404
    status, body = _get(conn, "/p/7")
    meta = json.loads(body)
    assert meta["name"] == "Parcel 7"


def test_api_keys_secrets_and_admin_state(site):
    ws, store, worlds = site
    conn = _conn(ws)
    alice_h = _login(conn, "alice", "alicepw1")
    status, body = _post(conn, "/create_api_key_post", {}, alice_h)
    assert status == 200 and "new key" in body
    status, _ = _post(conn, "/add_secret_post",
                      {"name": "eth_key", "value": "0xdead"}, alice_h)
    assert status == 200
    assert store.secrets_for_user(2) == {"eth_key": "0xdead"}
    status, body = _get(conn, "/secrets", alice_h)
    assert "eth_key" in body and "0xdead" not in body   # values not shown

    admin_h = _login(conn, "admin", "adminpw1")
    status, _ = _post(conn, "/admin_set_server_admin_message_post",
                      {"message": "maintenance at noon"}, admin_h)
    assert status == 200
    status, body = _get(conn, "/")
    assert "maintenance at noon" in body
    status, _ = _post(conn, "/admin_set_read_only_mode_post",
                      {"value": "1"}, admin_h)
    assert worlds.read_only_mode
    status, _ = _post(conn, "/admin_set_feature_flag_post",
                      {"name": "LUA_HTTP_REQUESTS", "value": "true"}, admin_h)
    assert worlds.feature_flags["LUA_HTTP_REQUESTS"] is True
    # non-admin denied on every admin page
    status, _ = _get(conn, "/admin", alice_h)
    assert status == 403


def test_password_change_and_reset(site):
    ws, store, worlds = site
    conn = _conn(ws)
    alice_h = _login(conn, "alice", "alicepw1")
    status, _ = _post(conn, "/change_password_post",
                      {"old_password": "wrong", "new_password": "x"},
                      alice_h)
    assert status == 403
    status, _ = _post(conn, "/change_password_post",
                      {"old_password": "alicepw1",
                       "new_password": "newpw123"}, alice_h)
    assert status == 200
    assert store.login("alice", "newpw123") is not None
    # reset flow via token
    pr = store.request_password_reset("alice")
    status, _ = _post(conn, "/set_new_password_post",
                      {"token": pr.token, "password": "resetpw1"})
    assert status == 200
    assert store.login("alice", "resetpw1") is not None


# ---------------------------------------------------------------- MCP

def _mcp_call(conn, key, method, params=None, rid=1):
    body = json.dumps({"jsonrpc": "2.0", "id": rid, "method": method,
                       "params": params or {}})
    headers = {"Content-Type": "application/json"}
    if key:
        headers["Authorization"] = f"Bearer {key}"
    conn.request("POST", "/mcp", body, headers)
    r = conn.getresponse()
    return r.status, json.loads(r.read() or b"{}")


def test_mcp_auth_and_tools(site):
    ws, store, worlds = site
    conn = _conn(ws)
    status, resp = _mcp_call(conn, None, "initialize")
    assert status == 401 and resp["error"]["code"] == -32001

    key = store.create_api_key(2).key          # alice's key
    status, resp = _mcp_call(conn, key, "initialize")
    assert status == 200 and "serverInfo" in resp["result"]
    status, resp = _mcp_call(conn, key, "tools/list")
    names = [t["name"] for t in resp["result"]["tools"]]
    assert {"list_worlds", "create_cube", "edit_object",
            "delete_object"} <= set(names)

    # create a cube, read it back, edit it, delete it
    status, resp = _mcp_call(conn, key, "tools/call",
                             {"name": "create_cube",
                              "arguments": {"x": 5, "y": 5, "z": 1}})
    out = json.loads(resp["result"]["content"][0]["text"])
    uid = out["uid"]
    assert worlds.get_world("").objects[uid].creator_id == 2

    status, resp = _mcp_call(conn, key, "tools/call",
                             {"name": "list_objects_near",
                              "arguments": {"x": 5, "y": 5, "z": 1,
                                            "radius": 10}})
    near = json.loads(resp["result"]["content"][0]["text"])
    assert any(o["uid"] == uid for o in near)

    status, resp = _mcp_call(conn, key, "tools/call",
                             {"name": "edit_object",
                              "arguments": {"uid": uid, "content": "hi"}})
    assert json.loads(resp["result"]["content"][0]["text"])["edited"]

    status, resp = _mcp_call(conn, key, "tools/call",
                             {"name": "delete_object",
                              "arguments": {"uid": uid}})
    assert uid not in worlds.get_world("").objects


def test_mcp_permissions_and_errors(site):
    ws, store, worlds = site
    conn = _conn(ws)
    alice_key = store.create_api_key(2).key
    admin_key = store.create_api_key(1).key

    # alice creates an object; a second non-god user cannot delete it
    bob = store.create_user("bob", "b@x", "bobpw123")
    bob_key = store.create_api_key(bob.user_id).key
    _, resp = _mcp_call(conn, alice_key, "tools/call",
                        {"name": "create_sphere",
                         "arguments": {"x": 50, "y": 50, "z": 1}})
    uid = json.loads(resp["result"]["content"][0]["text"])["uid"]
    _, resp = _mcp_call(conn, bob_key, "tools/call",
                        {"name": "delete_object", "arguments": {"uid": uid}})
    assert resp["result"].get("isError"), resp
    assert uid in worlds.get_world("").objects
    # the god user can
    _, resp = _mcp_call(conn, admin_key, "tools/call",
                        {"name": "delete_object", "arguments": {"uid": uid}})
    assert uid not in worlds.get_world("").objects

    # protocol errors
    _, resp = _mcp_call(conn, alice_key, "no_such_method")
    assert resp["error"]["code"] == -32601
    _, resp = _mcp_call(conn, alice_key, "tools/call",
                        {"name": "no_such_tool"})
    assert resp["error"]["code"] == -32602
