"""In-process HTTP site: the full webserver/ route surface.

Parity with the reference webserver/ layer (WebServerRequestHandler.cpp
routing to MainPageHandlers / AccountHandlers / LoginHandlers /
AdminHandlers / ParcelHandlers / NewsPostHandlers / SubEventHandlers /
ScreenshotHandlers / WorldHandlers / ResourceHandlers / MCPHandlers +
WebDataStore): info pages, accounts (login/signup/reset/change password,
API keys, secrets), parcels + Dutch parcel auctions + orders, news posts,
events, worlds, screenshots + map tiles, ERC-721 parcel metadata, an admin
surface gated on the god-user model (ObjectPermissions.cpp:65), and the
MCP JSON-RPC endpoint (server_side/mcp.py).

TLS termination and CDN concerns stay out of scope; payment flows complete
instantly instead of bouncing through PayPal/Coinbase IPN callbacks
(webserver/PayPalHandlers parity is the order/auction state machine, not
the gateway)."""

from __future__ import annotations

import html
import json
import threading
import time
import urllib.parse
from http.cookies import SimpleCookie
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from substrata_tpu.server_side.accounts import AuctionState
from substrata_tpu.server_side.mcp import MCPEndpoint
from substrata_tpu.server_side.site_data import SiteDataStore, SubEvent


class WebDataStore:
    """webserver/WebDataStore parity: fragments + public files served from
    memory (a file watcher can refresh them)."""

    def __init__(self):
        self.fragments: dict[str, str] = {
            "header": "<html><body><h1>substrata-tpu</h1>",
            "footer": "</body></html>",
        }
        self.public_files: dict[str, bytes] = {}
        # Static info pages (webserver_fragments/ in the reference).
        self.info_pages: dict[str, str] = {
            "/terms": "<h2>Terms of use</h2>",
            "/about_substrata": "<h2>About</h2><p>A TPU-native metaverse "
                                "server.</p>",
            "/about_parcel_sales": "<h2>Parcel sales</h2><p>Parcels sell by "
                                   "descending-price auction.</p>",
            "/about_scripting": "<h2>Scripting</h2><p>Winter eval hooks + "
                                "XML scripts + event handlers.</p>",
            "/faq": "<h2>FAQ</h2>",
            "/running_your_own_server": "<h2>Running your own server</h2>",
            "/map": "<h2>Map</h2><p>Tiles at /tile?x=&y=&z=</p>",
            "/bot_status": "<h2>Bot status</h2>",
        }


def _e(s) -> str:
    return html.escape(str(s))


class WebServer:
    def __init__(self, accounts, worlds_state=None, resource_manager=None,
                 port: int = 0, site_data: SiteDataStore | None = None,
                 secure_cookies: bool = False, tls_context=None,
                 payments=None, game_server=None):
        self.accounts = accounts
        self.worlds_state = worlds_state
        # Game server for protocol-over-WebSocket connections (the web
        # client path: WebServerRequestHandler.cpp:874-882 wraps the
        # upgraded socket and hands it to a game WorkerThread).
        self.game_server = game_server
        self.resources = resource_manager
        self.site_data = site_data or SiteDataStore()
        self.data_store = WebDataStore()
        self.mcp = (MCPEndpoint(worlds_state, accounts)
                    if worlds_state is not None else None)
        self.secure_cookies = secure_cookies
        # Payment processor seam (PayPal / Coinbase Commerce): flow logic
        # (locks, orders, webhook signature checks) is provider-agnostic;
        # the dev provider fabricates the remote side for hermetic tests.
        from substrata_tpu.server_side.commerce import DevPaymentProvider
        self.payments = payments or DevPaymentProvider()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                pass

            # ---------------- helpers ----------------
            def _send(self, code, body, ctype="text/html; charset=utf-8",
                      cookies=None, location=None):
                data = body.encode("utf-8") if isinstance(body, str) else body
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                if location:
                    self.send_header("Location", location)
                if cookies:
                    for c in cookies:
                        self.send_header("Set-Cookie", c)
                self.end_headers()
                self.wfile.write(data)

            def _redirect(self, where):
                self._send(302, "", location=where)

            def _cookie(self, session_id):
                c = (f"session_id={session_id}; HttpOnly; Path=/; "
                     f"SameSite=Lax")
                if outer.secure_cookies:
                    c += "; Secure"
                return c

            def _session_user(self):
                cookie = SimpleCookie(self.headers.get("Cookie", ""))
                sid = cookie.get("session_id")
                if sid is None:
                    return None
                return outer.accounts.user_for_session(sid.value)

            def _is_admin(self, user) -> bool:
                return (user is not None
                        and outer.accounts.is_god_user(user.user_id))

            def _page(self, inner):
                f = outer.data_store.fragments
                msg = ""
                ws = outer.worlds_state
                if ws is not None and getattr(ws, "server_admin_message", ""):
                    msg = (f"<p class=admin-message>"
                           f"{_e(ws.server_admin_message)}</p>")
                return f["header"] + msg + inner + f["footer"]

            def _form(self):
                length = int(self.headers.get("Content-Length", 0))
                return urllib.parse.parse_qs(
                    self.rfile.read(length).decode("utf-8", "replace"))

            @staticmethod
            def _f1(form, key, default=""):
                return form.get(key, [default])[0]

            # ---------------- GET routing ----------------
            def do_GET(self):
                try:
                    self._do_GET()
                except BrokenPipeError:
                    pass
                except Exception as e:
                    try:
                        self._send(500, self._page(f"<p>error: {_e(e)}</p>"))
                    except Exception:
                        pass

            def _do_GET(self):
                # Protocol-over-WebSocket upgrade -> game WorkerThread
                # (WebServerRequestHandler::handleWebSocketConnection).
                if ("websocket" in
                        self.headers.get("Upgrade", "").lower()):
                    return self._websocket_upgrade()
                path, _, query = self.path.partition("?")
                path = urllib.parse.unquote(path)
                q = urllib.parse.parse_qs(query)
                user = self._session_user()
                ds = outer.data_store
                sd = outer.site_data

                if path == "/":
                    return self._index(user)
                if path == "/webclient":
                    from substrata_tpu.server_side.webclient_page import \
                        WEBCLIENT_HTML
                    return self._send(200, WEBCLIENT_HTML)
                if path in ds.info_pages:
                    return self._send(200, self._page(ds.info_pages[path]))

                # --- auth pages ---
                if path == "/login":
                    return self._send(200, self._page(
                        '<form method=post action=/login_post>'
                        '<input name=username><input name=password '
                        'type=password><button>Log in</button></form>'))
                if path == "/signup":
                    return self._send(200, self._page(
                        '<form method=post action=/signup_post>'
                        '<input name=username><input name=email>'
                        '<input name=password type=password>'
                        '<button>Sign up</button></form>'))
                if path == "/reset_password":
                    return self._send(200, self._page(
                        '<form method=post action=/reset_password_post>'
                        '<input name=username><button>Reset</button></form>'))
                if path == "/change_password":
                    return self._send(200, self._page(
                        '<form method=post action=/change_password_post>'
                        '<input name=old_password type=password>'
                        '<input name=new_password type=password>'
                        '<button>Change</button></form>'))

                # --- account ---
                if path == "/account":
                    if user is None:
                        return self._redirect("/login")
                    return self._send(200, self._page(
                        f"<p>Account: {_e(user.name)} ({_e(user.email)})</p>"
                        f"<p><a href=/api_keys>API keys</a> "
                        f"<a href=/secrets>Secrets</a></p>"))
                if path == "/api_keys":
                    if user is None:
                        return self._redirect("/login")
                    keys = [k for k in outer.accounts.api_keys.values()
                            if k.user_id == user.user_id and not k.revoked]
                    rows = "".join(f"<li><code>{_e(k.key)}</code></li>"
                                   for k in keys)
                    return self._send(200, self._page(
                        f"<h2>API keys</h2><ul>{rows}</ul>"
                        '<form method=post action=/create_api_key_post>'
                        '<button>New key</button></form>'))
                if path == "/secrets":
                    if user is None:
                        return self._redirect("/login")
                    rows = "".join(
                        f"<li>{_e(n)}</li>" for n in
                        outer.accounts.secrets_for_user(user.user_id))
                    return self._send(200, self._page(
                        f"<h2>Secrets</h2><ul>{rows}</ul>"
                        '<form method=post action=/add_secret_post>'
                        '<input name=name><input name=value>'
                        '<button>Add</button></form>'))

                # --- parcels + auctions + orders ---
                if path == "/parcels":
                    return self._parcel_list()
                if path.startswith("/parcel/"):
                    return self._parcel_page(path[len("/parcel/"):], user)
                if path == "/parcel_auction_list":
                    return self._auction_list()
                if path.startswith("/parcel_auction/"):
                    return self._auction_page(
                        path[len("/parcel_auction/"):], user)
                if path == "/recent_parcel_sales":
                    return self._recent_sales()
                if path.startswith("/order/"):
                    return self._order_page(path[len("/order/"):], user)
                if path.startswith("/p/"):
                    return self._erc721_metadata(path[len("/p/"):])
                if path == "/buy_parcel_now_paypal":
                    return self._buy_with_provider_page(q, user, "paypal")
                if path == "/buy_parcel_now_coinbase":
                    return self._buy_with_provider_page(q, user, "coinbase")
                if path == "/order_landing":
                    return self._order_landing(q, user)

                # --- photos (webserver/PhotoHandlers.cpp) ---
                if path == "/photos":
                    return self._photos_page()
                if path.startswith("/photo/"):
                    return self._photo_page(path[len("/photo/"):], user)
                for pref, fieldn in (("/photo_image/", "image_data"),
                                     ("/photo_midsize_image/", "midsize_data"),
                                     ("/photo_thumb_image/", "thumbnail_data")):
                    if path.startswith(pref):
                        return self._photo_image(path[len(pref):], fieldn)
                if path == "/edit_photo_parcel":
                    return self._edit_photo_parcel_page(q, user)

                # --- chatbot config (webserver/ChatBotHandlers.cpp) ---
                if path == "/chatbots":
                    return self._chatbots_page(user)
                if path == "/new_chatbot":
                    return self._new_chatbot_page(user)
                if path == "/edit_chatbot":
                    return self._edit_chatbot_page(q, user)

                # --- news ---
                if path == "/news":
                    posts = sd.published_news()
                    rows = "".join(
                        f"<li><a href=/news_post/{p.post_id}>"
                        f"{_e(p.title)}</a></li>" for p in posts)
                    return self._send(200, self._page(
                        f"<h2>News</h2><ul>{rows}</ul>"))
                if path.startswith("/news_post/"):
                    try:
                        p = sd.news_posts.get(int(path[len("/news_post/"):]))
                    except ValueError:
                        p = None
                    if p is None or not (p.published or self._is_admin(user)):
                        return self._send(404, self._page("<p>no such post</p>"))
                    return self._send(200, self._page(
                        f"<h2>{_e(p.title)}</h2><div>{_e(p.content)}</div>"))

                # --- events ---
                if path == "/events":
                    rows = "".join(
                        f"<li><a href=/event/{e.event_id}>{_e(e.title)}</a> "
                        f"in world '{_e(e.world_name)}'</li>"
                        for e in sd.upcoming_events())
                    return self._send(200, self._page(
                        f"<h2>Events</h2><ul>{rows}</ul>"))
                if path.startswith("/event/"):
                    try:
                        ev = sd.events.get(int(path[len("/event/"):]))
                    except ValueError:
                        ev = None
                    if ev is None or ev.state == SubEvent.STATE_DELETED:
                        return self._send(404, self._page("<p>no such event</p>"))
                    return self._send(200, self._page(
                        f"<h2>{_e(ev.title)}</h2><p>{_e(ev.description)}</p>"
                        f"<p>{len(ev.attendee_ids)} attending</p>"))

                # --- worlds ---
                if path == "/worlds":
                    return self._world_list()
                if path.startswith("/world/"):
                    return self._world_page(path[len("/world/"):])

                # --- screenshots / tiles ---
                if path.startswith("/screenshot/"):
                    try:
                        s = sd.screenshots.get(
                            int(path[len("/screenshot/"):]))
                    except ValueError:
                        s = None
                    if s is None or not s.state_done:
                        return self._send(404, "not rendered")
                    return self._send(200, s.data, ctype="image/png")
                if path == "/tile":
                    try:
                        s = sd.tile(int(self._f1(q, "x", "0")),
                                    int(self._f1(q, "y", "0")),
                                    int(self._f1(q, "z", "0")))
                    except ValueError:
                        s = None
                    if s is None:
                        return self._send(404, "no tile")
                    return self._send(200, s.data, ctype="image/png")

                # --- resources / files / api ---
                if path.startswith("/resource/"):
                    if outer.resources is None:
                        return self._send(404, "no resource store")
                    url = path[len("/resource/"):]
                    try:
                        data = outer.resources.load_resource(url)
                        return self._send(200, data,
                                          ctype="application/octet-stream")
                    except FileNotFoundError:
                        return self._send(404, "not found")
                if path.startswith("/files/"):
                    f = ds.public_files.get(path[len("/files/"):])
                    if f is None:
                        return self._send(404, "not found")
                    return self._send(200, f,
                                      ctype="application/octet-stream")
                if path == "/metrics":
                    return self._metrics()
                if path == "/api/stats":
                    return self._api_stats()

                # --- admin pages ---
                if path.startswith("/admin"):
                    if not self._is_admin(user):
                        return self._send(403, self._page("<p>admins only</p>"))
                    return self._admin_get(path)

                if path in ds.public_files:
                    return self._send(200, ds.public_files[path],
                                      ctype="application/octet-stream")
                return self._send(404, self._page("<p>not found</p>"))

            def _websocket_upgrade(self):
                from substrata_tpu.net.server import WorkerConnection
                from substrata_tpu.net.websocket import (WebSocketStream,
                                                         handshake_response)
                key = self.headers.get("Sec-WebSocket-Key")
                if outer.game_server is None or not key:
                    return self._send(404, self._page(
                        "<p>no game server behind this site</p>"))
                # Session-cookie login for websocket game connections
                # (WorkerThread.cpp:183-187: "If the client connected via a
                # websocket, they can be logged in with a session cookie").
                user = self._session_user()
                self.connection.sendall(handshake_response(key))
                self.close_connection = True
                ws = WebSocketStream(self.connection)
                worker = WorkerConnection(outer.game_server, ws,
                                          self.client_address)
                if user is not None:
                    worker.logged_in_user_id = user.user_id
                # Run the protocol endpoint ON this HTTP thread (the site
                # is a thread-per-connection server; the reference spawns a
                # WorkerThread for the same effect).  Returns at disconnect.
                worker.run()

            # ---------------- GET page builders ----------------
            def _index(self, user):
                n_obs = n_parcels = 0
                ws = outer.worlds_state
                if ws is not None:
                    with ws.lock:
                        for w in ws.worlds.values():
                            n_obs += len(w.objects)
                            n_parcels += len(w.parcels)
                who = (f"Logged in as {_e(user.name)}" if user
                       else "Not logged in")
                news = outer.site_data.published_news()[:3]
                news_html = "".join(
                    f"<li><a href=/news_post/{p.post_id}>{_e(p.title)}</a></li>"
                    for p in news)
                live = [a for a in outer.accounts.auctions.values()
                        if a.state == int(AuctionState.FOR_SALE)]
                enter = ("<p><a href=/webclient>Enter the world in your "
                         "browser</a></p>" if outer.game_server is not None
                         else "")
                self._send(200, self._page(
                    f"<p>{who}</p>{enter}"
                    f"<p>{n_obs} objects, {n_parcels} parcels</p>"
                    f"<p>{len(live)} parcels <a href=/parcel_auction_list>"
                    f"on auction</a></p><ul>{news_html}</ul>"))

            def _metrics(self):
                """Prometheus text exposition: serving-side observability
                (beyond the reference, which has only conPrint diagnostics
                — SURVEY §5 'No metrics export')."""
                lines = []

                def m(name, value, help_=""):
                    if help_:
                        lines.append(f"# HELP {name} {help_}")
                        lines.append(f"# TYPE {name} gauge")
                    lines.append(f"{name} {value}")

                m("substrata_users", len(outer.accounts.users),
                  "registered accounts")
                ws = outer.worlds_state
                if ws is not None:
                    with ws.lock:
                        m("substrata_worlds", len(ws.worlds), "named worlds")
                        m("substrata_objects",
                          sum(len(w.objects) for w in ws.worlds.values()),
                          "world objects across all worlds")
                        m("substrata_avatars",
                          sum(len(w.avatars) for w in ws.worlds.values()),
                          "connected avatars across all worlds")
                        m("substrata_parcels",
                          sum(len(w.parcels) for w in ws.worlds.values()),
                          "parcels across all worlds")
                gs = outer.game_server
                if gs is not None:
                    with gs.conn_lock:
                        m("substrata_game_connections", len(gs.connections),
                          "live game-protocol connections")
                    m("substrata_udp_voice_packets_total",
                      gs.udp_packets_received, "UDP voice packets relayed")
                m("substrata_auctions_live",
                  sum(1 for a in outer.accounts.auctions.values()
                      if a.state == int(AuctionState.FOR_SALE)),
                  "parcels currently on auction")
                self._send(200, "\n".join(lines) + "\n",
                           ctype="text/plain; version=0.0.4; charset=utf-8")

            def _iter_parcels(self):
                ws = outer.worlds_state
                if ws is None:
                    return
                with ws.lock:
                    for w in ws.worlds.values():
                        for p in w.parcels.values():
                            yield w, p

            def _find_parcel(self, pid: int):
                for w, p in self._iter_parcels():
                    if p.parcel_id == pid:
                        return w, p
                return None, None

            def _parcel_list(self):
                rows = [f"<li><a href=/parcel/{p.parcel_id}>parcel "
                        f"{p.parcel_id}</a> owner {p.owner_id}</li>"
                        for _w, p in self._iter_parcels()]
                self._send(200, self._page("<ul>" + "".join(rows) + "</ul>"))

            def _parcel_page(self, pid_str, user):
                try:
                    w, p = self._find_parcel(int(pid_str))
                except ValueError:
                    w = p = None
                if p is None:
                    return self._send(404, self._page("<p>no such parcel</p>"))
                owner = outer.accounts.users.get(p.owner_id)
                writers = ", ".join(str(i) for i in p.writer_ids)
                editable = user is not None and (
                    user.user_id == p.owner_id or self._is_admin(user))
                edit = ""
                if editable:
                    edit = (
                        f'<form method=post action=/edit_parcel_title_post>'
                        f'<input type=hidden name=parcel_id value={p.parcel_id}>'
                        f'<input name=title value="{_e(p.title)}">'
                        f'<button>Set title</button></form>'
                        f'<form method=post action=/edit_parcel_description_post>'
                        f'<input type=hidden name=parcel_id value={p.parcel_id}>'
                        f'<input name=description value="{_e(p.description)}">'
                        f'<button>Set description</button></form>'
                        f'<form method=post action=/add_parcel_writer_post>'
                        f'<input type=hidden name=parcel_id value={p.parcel_id}>'
                        f'<input name=writer_name>'
                        f'<button>Add writer</button></form>')
                self._send(200, self._page(
                    f"<h2>Parcel {p.parcel_id}: {_e(p.title)}</h2>"
                    f"<p>{_e(p.description)}</p>"
                    f"<p>owner: {_e(owner.name) if owner else p.owner_id}, "
                    f"writers: [{writers}]</p>"
                    f"<p>bounds {p.aabb_min.tolist()} .. "
                    f"{p.aabb_max.tolist()}</p>" + edit))

            def _auction_list(self):
                now = time.time()
                rows = []
                for a in outer.accounts.auctions.values():
                    if a.state == int(AuctionState.FOR_SALE):
                        rows.append(
                            f"<li><a href=/parcel_auction/{a.auction_id}>"
                            f"parcel {a.parcel_id}</a> now "
                            f"{a.current_price(now):.2f} EUR</li>")
                self._send(200, self._page(
                    "<h2>Parcel auctions</h2><ul>" + "".join(rows) + "</ul>"))

            def _auction_page(self, aid_str, user):
                try:
                    a = outer.accounts.auctions.get(int(aid_str))
                except ValueError:
                    a = None
                if a is None:
                    return self._send(404, self._page("<p>no such auction</p>"))
                now = time.time()
                state = AuctionState(a.state).name
                buy = ""
                if a.state == int(AuctionState.FOR_SALE) and user is not None:
                    buy = (f'<form method=post action=/buy_parcel_now>'
                           f'<input type=hidden name=auction_id '
                           f'value={a.auction_id}>'
                           f'<button>Buy now for {a.current_price(now):.2f}'
                           f' EUR</button></form>')
                self._send(200, self._page(
                    f"<h2>Auction {a.auction_id} — parcel "
                    f"<a href=/parcel/{a.parcel_id}>{a.parcel_id}</a></h2>"
                    f"<p>state: {state}, price now: "
                    f"{a.current_price(now):.2f} EUR "
                    f"({a.start_price:.2f} → {a.end_price:.2f})</p>" + buy))

            def _recent_sales(self):
                rows = [f"<li>parcel {a.parcel_id} sold for "
                        f"{a.sold_price:.2f} EUR</li>"
                        for a in outer.accounts.auctions.values()
                        if a.state == int(AuctionState.SOLD)]
                self._send(200, self._page(
                    "<h2>Recent sales</h2><ul>" + "".join(rows) + "</ul>"))

            def _order_page(self, oid_str, user):
                try:
                    o = outer.accounts.orders.get(int(oid_str))
                except ValueError:
                    o = None
                if o is None or user is None or (
                        o.user_id != user.user_id
                        and not self._is_admin(user)):
                    return self._send(404, self._page("<p>no such order</p>"))
                self._send(200, self._page(
                    f"<h2>Order {o.order_id}</h2><p>parcel {o.parcel_id}, "
                    f"{o.price:.2f} EUR, "
                    f"{'confirmed' if o.confirmed else 'pending'}</p>"))

            def _erc721_metadata(self, pid_str):
                """ERC-721 metadata JSON for a parcel NFT
                (webserver/ParcelHandlers.cpp /p/ route)."""
                try:
                    _w, p = self._find_parcel(int(pid_str))
                except ValueError:
                    p = None
                if p is None:
                    return self._send(404, "{}", ctype="application/json")
                meta = {
                    "name": f"Parcel {p.parcel_id}",
                    "description": p.description or f"Substrata parcel "
                                                    f"{p.parcel_id}",
                    "attributes": [
                        {"trait_type": "x", "value": float(p.aabb_min[0])},
                        {"trait_type": "y", "value": float(p.aabb_min[1])},
                    ],
                }
                self._send(200, json.dumps(meta), ctype="application/json")

            def _world_list(self):
                ws = outer.worlds_state
                rows = []
                if ws is not None:
                    with ws.lock:
                        for name, w in ws.worlds.items():
                            label = _e(name) or "(main)"
                            rows.append(
                                f"<li><a href=/world/{_e(name)}>{label}</a>"
                                f" — {len(w.objects)} objects</li>")
                self._send(200, self._page(
                    "<h2>Worlds</h2><ul>" + "".join(rows) + "</ul>"))

            def _world_page(self, name):
                ws = outer.worlds_state
                if ws is None:
                    return self._send(404, self._page("<p>no worlds</p>"))
                with ws.lock:
                    w = ws.worlds.get(name)
                    details = ws.world_details.get(name)
                    counts = (len(w.objects), len(w.avatars),
                              len(w.parcels)) if w is not None else None
                if counts is None:
                    return self._send(404, self._page("<p>no such world</p>"))
                desc = _e(details.description) if details else ""
                self._send(200, self._page(
                    f"<h2>World '{_e(name) or '(main)'}'</h2><p>{desc}</p>"
                    f"<p>{counts[0]} objects, {counts[1]} avatars, "
                    f"{counts[2]} parcels</p>"))

            def _api_stats(self):
                stats = {"users": len(outer.accounts.users)}
                ws = outer.worlds_state
                if ws is not None:
                    with ws.lock:
                        stats["worlds"] = len(ws.worlds)
                        stats["objects"] = sum(len(w.objects)
                                               for w in ws.worlds.values())
                self._send(200, json.dumps(stats), ctype="application/json")

            def _admin_get(self, path):
                acc = outer.accounts
                ws = outer.worlds_state
                sd = outer.site_data
                if path == "/admin":
                    ro = getattr(ws, "read_only_mode", False) if ws else False
                    flags = getattr(ws, "feature_flags", {}) if ws else {}
                    return self._send(200, self._page(
                        f"<h2>Admin</h2><p>{len(acc.users)} users, "
                        f"{len(acc.sessions)} sessions, read_only={ro}</p>"
                        f"<p>feature flags: {_e(flags)}</p>"
                        "<p><a href=/admin_users>users</a> "
                        "<a href=/admin_parcels>parcels</a> "
                        "<a href=/admin_parcel_auctions>auctions</a> "
                        "<a href=/admin_orders>orders</a> "
                        "<a href=/admin_news_posts>news</a> "
                        "<a href=/admin_worlds>worlds</a> "
                        "<a href=/admin_lod_chunks>lod chunks</a></p>"))
                if path == "/admin_users":
                    rows = "".join(
                        f"<li><a href=/admin_user/{u.user_id}>"
                        f"{_e(u.name)}</a></li>" for u in acc.users.values())
                    return self._send(200, self._page(f"<ul>{rows}</ul>"))
                if path.startswith("/admin_user/"):
                    try:
                        u = acc.users.get(int(path[len("/admin_user/"):]))
                    except ValueError:
                        u = None
                    if u is None:
                        return self._send(404, self._page("<p>no user</p>"))
                    return self._send(200, self._page(
                        f"<p>{_e(u.name)} {_e(u.email)} flags={u.flags} "
                        f"god={acc.is_god_user(u.user_id)}</p>"))
                if path == "/admin_parcels":
                    rows = "".join(
                        f"<li>parcel {p.parcel_id} owner {p.owner_id}</li>"
                        for _w, p in self._iter_parcels())
                    return self._send(200, self._page(f"<ul>{rows}</ul>"))
                if path == "/admin_parcel_auctions":
                    rows = "".join(
                        f"<li>auction {a.auction_id} parcel {a.parcel_id} "
                        f"state {AuctionState(a.state).name}</li>"
                        for a in acc.auctions.values())
                    return self._send(200, self._page(
                        f"<ul>{rows}</ul>"
                        '<form method=post '
                        'action=/admin_create_parcel_auction_post>'
                        '<input name=parcel_id><input name=start_price>'
                        '<input name=end_price><input name=duration_hours>'
                        '<button>Create auction</button></form>'))
                if path == "/admin_orders":
                    rows = "".join(
                        f"<li>order {o.order_id} user {o.user_id} parcel "
                        f"{o.parcel_id} {o.price:.2f} EUR</li>"
                        for o in acc.orders.values())
                    return self._send(200, self._page(f"<ul>{rows}</ul>"))
                if path == "/admin_news_posts":
                    rows = "".join(
                        f"<li>{p.post_id}: {_e(p.title)} "
                        f"{'published' if p.published else 'draft'}</li>"
                        for p in sd.news_posts.values())
                    return self._send(200, self._page(
                        f"<ul>{rows}</ul>"
                        '<form method=post action=/admin_new_news_post>'
                        '<input name=title><input name=content>'
                        '<button>New post</button></form>'))
                if path == "/admin_worlds":
                    rows = ""
                    if ws is not None:
                        with ws.lock:
                            rows = "".join(
                                f"<li>'{_e(n) or '(main)'}' "
                                f"{len(w.objects)} objects</li>"
                                for n, w in ws.worlds.items())
                    return self._send(200, self._page(f"<ul>{rows}</ul>"))
                if path == "/admin_lod_chunks":
                    chunks = getattr(ws, "lod_chunks", {}) if ws else {}
                    rows = "".join(f"<li>{_e(k)}</li>" for k in chunks)
                    return self._send(200, self._page(f"<ul>{rows}</ul>"))
                if path == "/admin_map":
                    n = len(outer.site_data.map_tiles)
                    return self._send(200, self._page(f"<p>{n} tiles</p>"))
                return self._send(404, self._page("<p>not found</p>"))

            # ---------------- POST routing ----------------
            def do_POST(self):
                try:
                    self._do_POST()
                except BrokenPipeError:
                    pass
                except Exception as e:
                    try:
                        self._send(500, self._page(f"<p>error: {_e(e)}</p>"))
                    except Exception:
                        pass

            def _do_POST(self):
                path = urllib.parse.unquote(self.path.partition("?")[0])

                if path == "/mcp":
                    return self._mcp()

                # Raw body kept for webhook signature verification (the
                # Coinbase HMAC is over the exact bytes received).
                length = int(self.headers.get("Content-Length", 0))
                raw_body = self.rfile.read(length)
                form = urllib.parse.parse_qs(
                    raw_body.decode("utf-8", "replace"))
                user = self._session_user()
                acc = outer.accounts

                # --- auth ---
                if path in ("/signup", "/signup_post"):
                    try:
                        acc.create_user(self._f1(form, "username"),
                                        self._f1(form, "email"),
                                        self._f1(form, "password"))
                        return self._send(200,
                                          self._page("<p>account created</p>"))
                    except ValueError as e:
                        return self._send(400, self._page(f"<p>{_e(e)}</p>"))
                if path in ("/login", "/login_post"):
                    s = acc.login(self._f1(form, "username"),
                                  self._f1(form, "password"))
                    if s is None:
                        return self._send(403,
                                          self._page("<p>bad credentials</p>"))
                    return self._send(200, self._page("<p>logged in</p>"),
                                      cookies=[self._cookie(s.session_id)])
                if path in ("/logout", "/logout_post"):
                    cookie = SimpleCookie(self.headers.get("Cookie", ""))
                    sid = cookie.get("session_id")
                    if sid is not None:
                        acc.logout(sid.value)
                    return self._send(200, self._page("<p>logged out</p>"))
                if path == "/reset_password_post":
                    pr = acc.request_password_reset(
                        self._f1(form, "username"))
                    # Token would be emailed; don't leak existence either way.
                    return self._send(200,
                                      self._page("<p>reset requested</p>"))
                if path == "/set_new_password_post":
                    ok = acc.reset_password(self._f1(form, "token"),
                                            self._f1(form, "password"))
                    return self._send(200 if ok else 400, self._page(
                        "<p>password set</p>" if ok
                        else "<p>bad or expired token</p>"))
                if path == "/change_password_post":
                    if user is None:
                        return self._redirect("/login")
                    ok = acc.change_password(
                        user.user_id, self._f1(form, "old_password"),
                        self._f1(form, "new_password"))
                    return self._send(200 if ok else 403, self._page(
                        "<p>changed</p>" if ok else "<p>wrong password</p>"))

                # --- api keys + secrets ---
                if path == "/create_api_key_post":
                    if user is None:
                        return self._redirect("/login")
                    k = acc.create_api_key(user.user_id)
                    return self._send(200, self._page(
                        f"<p>new key: <code>{_e(k.key)}</code></p>"))
                if path == "/delete_api_key_post":
                    if user is None:
                        return self._redirect("/login")
                    acc.revoke_api_key(user.user_id, self._f1(form, "key"))
                    return self._send(200, self._page("<p>revoked</p>"))
                if path == "/add_secret_post":
                    if user is None:
                        return self._redirect("/login")
                    acc.add_secret(user.user_id, self._f1(form, "name"),
                                   self._f1(form, "value"))
                    return self._send(200, self._page("<p>secret added</p>"))
                if path == "/delete_secret_post":
                    if user is None:
                        return self._redirect("/login")
                    acc.delete_secret(user.user_id, self._f1(form, "name"))
                    return self._send(200, self._page("<p>secret deleted</p>"))

                # --- parcels ---
                if path in ("/edit_parcel_title_post",
                            "/edit_parcel_description_post",
                            "/add_parcel_writer_post",
                            "/remove_parcel_writer_post"):
                    return self._parcel_post(path, form, user)

                # --- commerce ---
                if path == "/buy_parcel_now":
                    return self._buy_parcel_now(form, user)
                if path == "/buy_parcel_with_paypal_post":
                    return self._buy_with_provider_post(form, user, "paypal")
                if path == "/buy_parcel_with_coinbase_post":
                    return self._buy_with_provider_post(form, user, "coinbase")
                if path == "/paypal_ipn":
                    return self._paypal_ipn(form)
                if path == "/coinbase_webhook":
                    return self._coinbase_webhook(raw_body)

                # --- photos ---
                if path == "/edit_photo_parcel_post":
                    return self._edit_photo_parcel_post(form, user)
                if path == "/delete_photo_post":
                    return self._delete_photo_post(form, user)

                # --- chatbot config ---
                if path == "/create_new_chatbot_post":
                    return self._create_chatbot_post(form, user)
                if path == "/edit_chatbot_post":
                    return self._edit_chatbot_post(form, user)
                if path == "/delete_chatbot_post":
                    return self._delete_chatbot_post(form, user)
                if path == "/chatbot_add_tool_post":
                    return self._chatbot_add_tool_post(form, user)
                if path == "/chatbot_delete_tool_post":
                    return self._chatbot_delete_tool_post(form, user)

                # --- events ---
                if path == "/create_event_post":
                    if user is None:
                        return self._redirect("/login")
                    e = outer.site_data.create_event(
                        user.user_id, self._f1(form, "world_name"),
                        self._f1(form, "title"),
                        self._f1(form, "description"),
                        float(self._f1(form, "start_time", "0") or 0),
                        float(self._f1(form, "end_time", "0") or 0))
                    e.state = SubEvent.STATE_PUBLISHED
                    return self._send(200, self._page(
                        f"<p>event {e.event_id} created</p>"))
                if path == "/edit_event_post":
                    return self._edit_event(form, user)
                if path == "/delete_event_post":
                    ev = outer.site_data.events.get(
                        int(self._f1(form, "event_id", "0") or 0))
                    if ev is None or user is None or (
                            ev.creator_id != user.user_id
                            and not self._is_admin(user)):
                        return self._send(403, self._page("<p>denied</p>"))
                    ev.state = SubEvent.STATE_DELETED
                    return self._send(200, self._page("<p>deleted</p>"))

                # --- worlds ---
                if path == "/create_world_post":
                    return self._create_world(form, user)

                # --- news (author/admin) ---
                if path == "/edit_news_post_post":
                    return self._edit_news(form, user)
                if path == "/delete_news_post":
                    p = outer.site_data.news_posts.get(
                        int(self._f1(form, "post_id", "0") or 0))
                    if p is None or not self._is_admin(user):
                        return self._send(403, self._page("<p>denied</p>"))
                    del outer.site_data.news_posts[p.post_id]
                    return self._send(200, self._page("<p>deleted</p>"))

                # --- admin ---
                if path.startswith("/admin_"):
                    if not self._is_admin(user):
                        return self._send(403, self._page("<p>admins only</p>"))
                    return self._admin_post(path, form)

                return self._send(404, self._page("<p>not found</p>"))

            # ---------------- POST handler bodies ----------------
            def _mcp(self):
                if outer.mcp is None:
                    return self._send(404, "{}", ctype="application/json")
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                status, resp = outer.mcp.handle(
                    body, self.headers.get("Authorization"))
                self._send(status, resp, ctype="application/json")

            def _parcel_post(self, path, form, user):
                if user is None:
                    return self._redirect("/login")
                try:
                    w, p = self._find_parcel(
                        int(self._f1(form, "parcel_id", "0") or 0))
                except ValueError:
                    p = None
                if p is None:
                    return self._send(404, self._page("<p>no parcel</p>"))
                if user.user_id != p.owner_id and not self._is_admin(user):
                    return self._send(403, self._page("<p>denied</p>"))
                if path == "/edit_parcel_title_post":
                    p.title = self._f1(form, "title")
                elif path == "/edit_parcel_description_post":
                    p.description = self._f1(form, "description")
                elif path == "/add_parcel_writer_post":
                    u = outer.accounts.users_by_name.get(
                        self._f1(form, "writer_name"))
                    if u is None:
                        return self._send(404, self._page("<p>no user</p>"))
                    if u.user_id not in p.writer_ids:
                        p.writer_ids.append(u.user_id)
                elif path == "/remove_parcel_writer_post":
                    u = outer.accounts.users_by_name.get(
                        self._f1(form, "writer_name"))
                    if u is not None and u.user_id in p.writer_ids:
                        p.writer_ids.remove(u.user_id)
                return self._send(200, self._page("<p>parcel updated</p>"))

            def _buy_parcel_now(self, form, user):
                """Dutch-auction instant purchase: lock, order, complete,
                transfer ownership (ParcelAuction lock + Order flow;
                payment gateway callbacks collapsed to instant success)."""
                if user is None:
                    return self._redirect("/login")
                acc = outer.accounts
                try:
                    a = acc.auctions.get(
                        int(self._f1(form, "auction_id", "0") or 0))
                except ValueError:
                    a = None
                if a is None:
                    return self._send(404, self._page("<p>no auction</p>"))
                now = time.time()
                if not a.try_lock(user.user_id, now):
                    return self._send(409, self._page(
                        "<p>auction is locked by another buyer</p>"))
                price = a.current_price(now)
                o = acc.create_order(user.user_id, a.parcel_id, price)
                if not a.complete_sale(user.user_id, now):
                    return self._send(409, self._page("<p>sale failed</p>"))
                o.confirmed = True
                _w, p = self._find_parcel(a.parcel_id)
                if p is not None:
                    p.owner_id = user.user_id
                return self._send(200, self._page(
                    f"<p>bought parcel {a.parcel_id} for {price:.2f} EUR — "
                    f"<a href=/order/{o.order_id}>order {o.order_id}</a></p>"))

            # ---------------- payment-gateway purchase flows ----------------
            # (reference: /buy_parcel_now_paypal, /buy_parcel_with_*_post,
            #  /paypal_ipn, /coinbase_webhook dispatch in
            #  WebServerRequestHandler.cpp:126-146)
            def _buy_with_provider_page(self, q, user, provider):
                if user is None:
                    return self._redirect("/login")
                a = outer.accounts.auctions.get(
                    int(q.get("auction_id", ["0"])[0] or 0))
                if a is None:
                    return self._send(404, self._page("<p>no auction</p>"))
                price = a.current_price(time.time())
                label = "PayPal" if provider == "paypal" else "Coinbase"
                return self._send(200, self._page(
                    f"<h2>Buy parcel {a.parcel_id} with {label}</h2>"
                    f"<p>Current price: {price:.2f} EUR</p>"
                    f"<form method=post action="
                    f"/buy_parcel_with_{provider}_post>"
                    f"<input type=hidden name=auction_id "
                    f"value={a.auction_id}>"
                    f"<input type=submit value='Pay with {label}'></form>"))

            def _buy_with_provider_post(self, form, user, provider):
                if user is None:
                    return self._redirect("/login")
                acc = outer.accounts
                a = acc.auctions.get(
                    int(self._f1(form, "auction_id", "0") or 0))
                if a is None:
                    return self._send(404, self._page("<p>no auction</p>"))
                now = time.time()
                # AuctionLock: hold the price while the buyer pays.
                if not a.try_lock(user.user_id, now):
                    return self._send(409, self._page(
                        "<p>auction is locked by another buyer</p>"))
                o = acc.create_order(user.user_id, a.parcel_id,
                                     a.current_price(now))
                landing = "/order_landing"
                if provider == "paypal":
                    url = outer.payments.paypal_checkout_url(o, landing)
                else:
                    url, code = outer.payments.create_coinbase_charge(
                        o, landing)
                return self._redirect(url)

            def _confirm_order(self, order_id: int) -> bool:
                """Shared confirmation path for IPN + webhook: mark the
                order paid, complete the auction sale, transfer the
                parcel."""
                acc = outer.accounts
                o = acc.orders.get(order_id)
                if o is None or o.confirmed:
                    return False
                now = time.time()
                for a in acc.auctions.values():
                    if (a.parcel_id == o.parcel_id
                            and a.complete_sale(o.user_id, now)):
                        break
                o.confirmed = True
                _w, p = self._find_parcel(o.parcel_id)
                if p is not None:
                    p.owner_id = o.user_id
                return True

            def _paypal_ipn(self, form):
                # PayPalHandlers::handleIPNPost: verify the notification
                # with the provider, then confirm the order in `custom`.
                if not outer.payments.verify_paypal_ipn(form):
                    return self._send(400, "IPN verification failed",
                                      ctype="text/plain")
                if self._f1(form, "payment_status") != "Completed":
                    return self._send(200, "", ctype="text/plain")
                try:
                    oid = int(self._f1(form, "custom", "0"))
                except ValueError:
                    return self._send(400, "bad custom", ctype="text/plain")
                o = outer.accounts.orders.get(oid)
                if o is not None and self._f1(form, "mc_gross"):
                    # Amount check: a tampered IPN paying less is rejected.
                    if abs(float(self._f1(form, "mc_gross")) - o.price) > 0.01:
                        return self._send(400, "amount mismatch",
                                          ctype="text/plain")
                self._confirm_order(oid)
                return self._send(200, "", ctype="text/plain")

            def _coinbase_webhook(self, raw_body):
                from substrata_tpu.server_side.commerce import (
                    verify_coinbase_signature)
                sig = self.headers.get("X-CC-Webhook-Signature", "")
                if not verify_coinbase_signature(
                        raw_body, sig,
                        outer.payments.coinbase_webhook_secret()):
                    return self._send(400, "bad signature",
                                      ctype="text/plain")
                try:
                    ev = json.loads(raw_body.decode("utf-8"))["event"]
                except (ValueError, KeyError):
                    return self._send(400, "bad body", ctype="text/plain")
                if ev.get("type") == "charge:confirmed":
                    code = ev.get("data", {}).get("code", "")
                    oid = getattr(outer.payments, "charges", {}).get(code)
                    if oid is not None:
                        self._confirm_order(oid)
                return self._send(200, "", ctype="text/plain")

            def _order_landing(self, q, user):
                o = outer.accounts.orders.get(
                    int(q.get("order_id", ["0"])[0] or 0))
                if o is None:
                    return self._send(404, self._page("<p>no order</p>"))
                status = "confirmed" if o.confirmed else "awaiting payment"
                return self._send(200, self._page(
                    f"<h2>Order {o.order_id}</h2>"
                    f"<p>Parcel {o.parcel_id} — {o.price:.2f} EUR — "
                    f"{status}</p>"))

            # ---------------- photos (PhotoHandlers.cpp) ----------------
            def _photos_page(self):
                items = []
                for p in sorted(outer.accounts.photos.values(),
                                key=lambda p: -p.created_time):
                    if p.state != p.STATE_PUBLISHED:
                        continue
                    items.append(
                        f"<a href=/photo/{p.id}><img src={p.thumbnail_url()}"
                        f" alt='{_e(p.caption)}'></a>")
                return self._send(200, self._page(
                    "<h2>Photos</h2>" + ("".join(items) or "<p>none yet</p>")))

            def _photo_page(self, pid_str, user):
                try:
                    p = outer.accounts.photos.get(int(pid_str))
                except ValueError:
                    p = None
                if p is None or p.state != p.STATE_PUBLISHED:
                    return self._send(404, self._page("<p>no photo</p>"))
                own = user is not None and (user.user_id == p.creator_id
                                            or self._is_admin(user))
                controls = ""
                if own:
                    controls = (
                        f"<a href='/edit_photo_parcel?photo_id={p.id}'>"
                        f"edit</a> "
                        f"<form method=post action=/delete_photo_post>"
                        f"<input type=hidden name=photo_id value={p.id}>"
                        f"<input type=submit value=Delete></form>")
                parcel = (f"<a href=/parcel/{p.parcel_id}>parcel "
                          f"{p.parcel_id}</a>" if p.parcel_id >= 0 else "")
                return self._send(200, self._page(
                    f"<h2>Photo {p.id}</h2>"
                    f"<img src={p.midsize_url()} alt=photo>"
                    f"<p>{_e(p.caption)}</p><p>{parcel}</p>{controls}"))

            def _photo_image(self, pid_str, fieldn):
                try:
                    p = outer.accounts.photos.get(int(pid_str))
                except ValueError:
                    p = None
                if p is None or p.state != p.STATE_PUBLISHED:
                    return self._send(404, "not found", ctype="text/plain")
                data = getattr(p, fieldn) or p.image_data
                return self._send(200, data, ctype="image/jpeg")

            def _edit_photo_parcel_page(self, q, user):
                p = outer.accounts.photos.get(
                    int(q.get("photo_id", ["0"])[0] or 0))
                if p is None:
                    return self._send(404, self._page("<p>no photo</p>"))
                if user is None or (user.user_id != p.creator_id
                                    and not self._is_admin(user)):
                    return self._redirect("/login")
                return self._send(200, self._page(
                    f"<h2>Edit photo {p.id}</h2>"
                    f"<form method=post action=/edit_photo_parcel_post>"
                    f"<input type=hidden name=photo_id value={p.id}>"
                    f"parcel id: <input name=parcel_id "
                    f"value={p.parcel_id}><br>"
                    f"caption: <input name=caption value='{_e(p.caption)}'>"
                    f"<input type=submit value=Save></form>"))

            def _edit_photo_parcel_post(self, form, user):
                p = outer.accounts.photos.get(
                    int(self._f1(form, "photo_id", "0") or 0))
                if p is None:
                    return self._send(404, self._page("<p>no photo</p>"))
                if user is None or (user.user_id != p.creator_id
                                    and not self._is_admin(user)):
                    return self._redirect("/login")
                try:
                    p.parcel_id = int(self._f1(form, "parcel_id",
                                               str(p.parcel_id)))
                except ValueError:
                    pass
                p.caption = self._f1(form, "caption",
                                     p.caption)[:p.MAX_CAPTION_SIZE]
                return self._redirect(f"/photo/{p.id}")

            def _delete_photo_post(self, form, user):
                p = outer.accounts.photos.get(
                    int(self._f1(form, "photo_id", "0") or 0))
                if p is None:
                    return self._send(404, self._page("<p>no photo</p>"))
                if user is None or (user.user_id != p.creator_id
                                    and not self._is_admin(user)):
                    return self._redirect("/login")
                p.state = p.STATE_DELETED
                return self._redirect("/photos")

            # ---------------- chatbot config (ChatBotHandlers.cpp) --------
            def _own_chatbot(self, form_or_q, user, key="chatbot_id"):
                # Both parse_qs forms and query dicts hold list values.
                raw = form_or_q.get(key, ["0"])[0]
                try:
                    b = outer.accounts.chatbots.get(int(raw or 0))
                except ValueError:
                    b = None
                if b is None or user is None:
                    return None
                if b.owner_id != user.user_id and not self._is_admin(user):
                    return None
                return b

            def _chatbots_page(self, user):
                if user is None:
                    return self._redirect("/login")
                rows = [
                    f"<li><a href='/edit_chatbot?chatbot_id={b.id}'>"
                    f"{_e(b.name)}</a></li>"
                    for b in outer.accounts.chatbots.values()
                    if b.owner_id == user.user_id or self._is_admin(user)]
                return self._send(200, self._page(
                    "<h2>Your ChatBots</h2><ul>" + "".join(rows) + "</ul>"
                    "<a href=/new_chatbot>New chatbot</a>"))

            def _new_chatbot_page(self, user):
                if user is None:
                    return self._redirect("/login")
                return self._send(200, self._page(
                    "<h2>New ChatBot</h2>"
                    "<form method=post action=/create_new_chatbot_post>"
                    "name: <input name=name><br>"
                    "world: <input name=world_name><br>"
                    "<input type=submit value=Create></form>"))

            def _edit_chatbot_page(self, q, user):
                b = self._own_chatbot(q, user)
                if b is None:
                    return self._redirect("/login")
                tools = "".join(
                    f"<li>{_e(f.function_name)}: {_e(f.description)}"
                    f"<form method=post action=/chatbot_delete_tool_post>"
                    f"<input type=hidden name=chatbot_id value={b.id}>"
                    f"<input type=hidden name=function_name "
                    f"value='{_e(f.function_name)}'>"
                    f"<input type=submit value=Remove></form></li>"
                    for f in b.info_tool_functions.values())
                return self._send(200, self._page(
                    f"<h2>Edit ChatBot {b.id}</h2>"
                    f"<form method=post action=/edit_chatbot_post>"
                    f"<input type=hidden name=chatbot_id value={b.id}>"
                    f"name: <input name=name value='{_e(b.name)}'><br>"
                    f"x: <input name=pos_x value={b.pos[0]}> "
                    f"y: <input name=pos_y value={b.pos[1]}> "
                    f"z: <input name=pos_z value={b.pos[2]}><br>"
                    f"heading: <input name=heading value={b.heading}><br>"
                    f"base prompt:<br><textarea name=base_prompt>"
                    f"{_e(b.custom_prompt_part)}</textarea><br>"
                    f"<input type=submit value=Save></form>"
                    f"<h3>Tool functions</h3><ul>{tools}</ul>"
                    f"<form method=post action=/chatbot_add_tool_post>"
                    f"<input type=hidden name=chatbot_id value={b.id}>"
                    f"name: <input name=function_name> "
                    f"description: <input name=description> "
                    f"result: <input name=result_content>"
                    f"<input type=submit value='Add tool'></form>"
                    f"<form method=post action=/delete_chatbot_post>"
                    f"<input type=hidden name=chatbot_id value={b.id}>"
                    f"<input type=submit value='Delete chatbot'></form>"))

            def _create_chatbot_post(self, form, user):
                if user is None:
                    return self._redirect("/login")
                from substrata_tpu.server_side.commerce import ChatBotConfig
                b = outer.accounts.create_chatbot(
                    owner_id=user.user_id,
                    name=self._f1(form, "name")[:ChatBotConfig.MAX_NAME_SIZE],
                    world_name=self._f1(form, "world_name"))
                return self._redirect(f"/edit_chatbot?chatbot_id={b.id}")

            def _edit_chatbot_post(self, form, user):
                b = self._own_chatbot(form, user)
                if b is None:
                    return self._redirect("/login")
                b.name = self._f1(form, "name", b.name)[:b.MAX_NAME_SIZE]
                try:
                    b.pos = (float(self._f1(form, "pos_x", str(b.pos[0]))),
                             float(self._f1(form, "pos_y", str(b.pos[1]))),
                             float(self._f1(form, "pos_z", str(b.pos[2]))))
                    b.heading = float(self._f1(form, "heading",
                                               str(b.heading)))
                except ValueError:
                    pass
                b.custom_prompt_part = self._f1(
                    form, "base_prompt",
                    b.custom_prompt_part)[:b.MAX_CUSTOM_PROMPT_PART_SIZE]
                return self._redirect(f"/edit_chatbot?chatbot_id={b.id}")

            def _delete_chatbot_post(self, form, user):
                b = self._own_chatbot(form, user)
                if b is None:
                    return self._redirect("/login")
                outer.accounts.chatbots.pop(b.id, None)
                return self._redirect("/chatbots")

            def _chatbot_add_tool_post(self, form, user):
                from substrata_tpu.server_side.commerce import (
                    ChatBotToolFunction)
                b = self._own_chatbot(form, user)
                if b is None:
                    return self._redirect("/login")
                fn = self._f1(form, "function_name")[
                    :ChatBotToolFunction.MAX_FUNCTION_NAME_SIZE]
                if fn:
                    b.info_tool_functions[fn] = ChatBotToolFunction(
                        function_name=fn,
                        description=self._f1(form, "description")[
                            :ChatBotToolFunction.MAX_DESCRIPTION_SIZE],
                        result_content=self._f1(form, "result_content")[
                            :ChatBotToolFunction.MAX_RESULT_CONTENT_SIZE])
                return self._redirect(f"/edit_chatbot?chatbot_id={b.id}")

            def _chatbot_delete_tool_post(self, form, user):
                b = self._own_chatbot(form, user)
                if b is None:
                    return self._redirect("/login")
                b.info_tool_functions.pop(self._f1(form, "function_name"),
                                          None)
                return self._redirect(f"/edit_chatbot?chatbot_id={b.id}")

            def _edit_event(self, form, user):
                ev = outer.site_data.events.get(
                    int(self._f1(form, "event_id", "0") or 0))
                if ev is None or user is None or (
                        ev.creator_id != user.user_id
                        and not self._is_admin(user)):
                    return self._send(403, self._page("<p>denied</p>"))
                if "title" in form:
                    ev.title = self._f1(form, "title")
                if "description" in form:
                    ev.description = self._f1(form, "description")
                ev.last_modified_time = time.time()
                return self._send(200, self._page("<p>event updated</p>"))

            def _create_world(self, form, user):
                if user is None:
                    return self._redirect("/login")
                ws = outer.worlds_state
                if ws is None:
                    return self._send(404, self._page("<p>no worlds</p>"))
                name = self._f1(form, "name").strip()
                if not name:
                    return self._send(400, self._page("<p>name required</p>"))
                from substrata_tpu.shared.records import WorldDetails
                with ws.lock:
                    if name in ws.worlds:
                        return self._send(409,
                                          self._page("<p>world exists</p>"))
                    ws.get_world(name)
                    ws.world_details[name] = WorldDetails(
                        name=name, owner_id=user.user_id,
                        created_time=time.time(),
                        description=self._f1(form, "description"))
                return self._send(200, self._page(
                    f"<p>world '{_e(name)}' created</p>"))

            def _edit_news(self, form, user):
                p = outer.site_data.news_posts.get(
                    int(self._f1(form, "post_id", "0") or 0))
                if p is None or not self._is_admin(user):
                    return self._send(403, self._page("<p>denied</p>"))
                if "title" in form:
                    p.title = self._f1(form, "title")
                if "content" in form:
                    p.content = self._f1(form, "content")
                if "published" in form:
                    p.published = self._f1(form, "published") in ("1", "true")
                p.last_modified_time = time.time()
                return self._send(200, self._page("<p>post updated</p>"))

            def _admin_post(self, path, form):
                acc = outer.accounts
                ws = outer.worlds_state
                if path == "/admin_new_news_post":
                    p = outer.site_data.create_news_post(
                        0, self._f1(form, "title"), self._f1(form, "content"))
                    p.published = True
                    return self._send(200, self._page(
                        f"<p>post {p.post_id} created</p>"))
                if path == "/admin_create_parcel_auction_post":
                    hours = float(self._f1(form, "duration_hours", "48") or 48)
                    now = time.time()
                    a = acc.create_auction(
                        int(self._f1(form, "parcel_id", "0") or 0),
                        float(self._f1(form, "start_price", "1000") or 1000),
                        float(self._f1(form, "end_price", "50") or 50),
                        now, now + hours * 3600)
                    return self._send(200, self._page(
                        f"<p>auction {a.auction_id} created</p>"))
                if path == "/admin_terminate_parcel_auction":
                    a = acc.auctions.get(
                        int(self._f1(form, "auction_id", "0") or 0))
                    if a is None:
                        return self._send(404, self._page("<p>no auction</p>"))
                    a.state = int(AuctionState.NOT_SOLD)
                    return self._send(200, self._page("<p>terminated</p>"))
                if path == "/admin_set_parcel_owner_post":
                    _w, p = self._find_parcel(
                        int(self._f1(form, "parcel_id", "0") or 0))
                    if p is None:
                        return self._send(404, self._page("<p>no parcel</p>"))
                    p.owner_id = int(self._f1(form, "owner_id", "0") or 0)
                    return self._send(200, self._page("<p>owner set</p>"))
                if path == "/admin_set_feature_flag_post":
                    if ws is None:
                        return self._send(404, self._page("<p>no state</p>"))
                    ws.feature_flags[self._f1(form, "name")] = (
                        self._f1(form, "value") in ("1", "true", "on"))
                    return self._send(200, self._page("<p>flag set</p>"))
                if path == "/admin_set_read_only_mode_post":
                    if ws is None:
                        return self._send(404, self._page("<p>no state</p>"))
                    ws.read_only_mode = (
                        self._f1(form, "value") in ("1", "true", "on"))
                    return self._send(200, self._page("<p>read-only set</p>"))
                if path == "/admin_set_server_admin_message_post":
                    if ws is None:
                        return self._send(404, self._page("<p>no state</p>"))
                    ws.server_admin_message = self._f1(form, "message")
                    return self._send(200, self._page("<p>message set</p>"))
                if path == "/admin_set_user_as_world_gardener_post":
                    u = acc.users.get(
                        int(self._f1(form, "user_id", "0") or 0))
                    if u is None:
                        return self._send(404, self._page("<p>no user</p>"))
                    u.flags |= u.WORLD_GARDENER_FLAG
                    return self._send(200, self._page("<p>gardener set</p>"))
                return self._send(404, self._page("<p>not found</p>"))

        self.httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        if tls_context is not None:
            # HTTPS (reference: Server.cpp:519-522 serves the website over
            # TLS on 443; same handler stack, wrapped listening socket).
            self.httpd.socket = tls_context.wrap_socket(
                self.httpd.socket, server_side=True)
        self.tls = tls_context is not None
        self.port = self.httpd.server_address[1]
        self._thread = None

    def start(self):
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        daemon=True)
        self._thread.start()

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread:
            self._thread.join(timeout=2.0)
