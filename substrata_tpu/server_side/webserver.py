"""In-process HTTP site: accounts, parcels, resources, admin, API.

Parity with the reference webserver/ layer (WebServerRequestHandler routing
to MainPageHandlers / AccountHandlers / LoginHandlers / AdminHandlers /
ParcelHandlers / ResourceHandlers / ScreenshotHandlers + WebDataStore):
the same route surface over Python's threading HTTP server, backed by
AccountStore, ServerAllWorldsState and ResourceManager.  TLS termination
and CDN concerns stay out of scope; handlers return HTML fragments or
JSON.
"""

from __future__ import annotations

import html
import json
import threading
import urllib.parse
from http import HTTPStatus
from http.cookies import SimpleCookie
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class WebDataStore:
    """webserver/WebDataStore parity: fragments + public files served from
    memory (a file watcher can refresh them)."""

    def __init__(self):
        self.fragments: dict[str, str] = {
            "header": "<html><body><h1>substrata-tpu</h1>",
            "footer": "</body></html>",
        }
        self.public_files: dict[str, bytes] = {}


class WebServer:
    def __init__(self, accounts, worlds_state=None, resource_manager=None,
                 port: int = 0):
        self.accounts = accounts
        self.worlds_state = worlds_state
        self.resources = resource_manager
        self.data_store = WebDataStore()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                pass

            # -- helpers --
            def _send(self, code, body, ctype="text/html; charset=utf-8",
                      cookies=None):
                data = body.encode("utf-8") if isinstance(body, str) else body
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                if cookies:
                    for c in cookies:
                        self.send_header("Set-Cookie", c)
                self.end_headers()
                self.wfile.write(data)

            def _session_user(self):
                cookie = SimpleCookie(self.headers.get("Cookie", ""))
                sid = cookie.get("session_id")
                if sid is None:
                    return None
                return outer.accounts.user_for_session(sid.value)

            def _page(self, inner):
                f = outer.data_store.fragments
                return f["header"] + inner + f["footer"]

            def _form(self):
                length = int(self.headers.get("Content-Length", 0))
                return urllib.parse.parse_qs(self.rfile.read(length).decode())

            # -- routing (WebServerRequestHandler parity) --
            def do_GET(self):
                path, _, query = self.path.partition("?")
                q = urllib.parse.parse_qs(query)
                user = self._session_user()
                if path == "/":
                    n_obs = 0
                    n_parcels = 0
                    if outer.worlds_state is not None:
                        with outer.worlds_state.lock:
                            for w in outer.worlds_state.worlds.values():
                                n_obs += len(w.objects)
                                n_parcels += len(w.parcels)
                    who = f"Logged in as {html.escape(user.name)}" if user else "Not logged in"
                    self._send(200, self._page(
                        f"<p>{who}</p><p>{n_obs} objects, {n_parcels} parcels</p>"))
                elif path == "/login":
                    self._send(200, self._page(
                        '<form method=post action=/login>'
                        '<input name=username><input name=password type=password>'
                        '<button>Log in</button></form>'))
                elif path == "/signup":
                    self._send(200, self._page(
                        '<form method=post action=/signup>'
                        '<input name=username><input name=email>'
                        '<input name=password type=password>'
                        '<button>Sign up</button></form>'))
                elif path == "/account":
                    if user is None:
                        self._send(302, "", cookies=None)
                        return
                    self._send(200, self._page(
                        f"<p>Account: {html.escape(user.name)} "
                        f"({html.escape(user.email)})</p>"))
                elif path == "/parcels":
                    rows = []
                    if outer.worlds_state is not None:
                        with outer.worlds_state.lock:
                            for w in outer.worlds_state.worlds.values():
                                for p in w.parcels.values():
                                    rows.append(f"<li>parcel {p.parcel_id} "
                                                f"owner {p.owner_id}</li>")
                    self._send(200, self._page("<ul>" + "".join(rows) + "</ul>"))
                elif path.startswith("/resource/"):
                    if outer.resources is None:
                        self._send(404, "no resource store")
                        return
                    url = urllib.parse.unquote(path[len("/resource/"):])
                    try:
                        data = outer.resources.load_resource(url)
                        self._send(200, data, ctype="application/octet-stream")
                    except FileNotFoundError:
                        self._send(404, "not found")
                elif path == "/api/stats":
                    stats = {"users": len(outer.accounts.users)}
                    if outer.worlds_state is not None:
                        with outer.worlds_state.lock:
                            stats["worlds"] = len(outer.worlds_state.worlds)
                            stats["objects"] = sum(
                                len(w.objects)
                                for w in outer.worlds_state.worlds.values())
                    self._send(200, json.dumps(stats), ctype="application/json")
                elif path == "/admin":
                    if user is None or user.user_id != 1:
                        self._send(403, self._page("<p>admins only</p>"))
                        return
                    self._send(200, self._page(
                        f"<p>{len(outer.accounts.users)} users, "
                        f"{len(outer.accounts.sessions)} sessions</p>"))
                elif path in outer.data_store.public_files:
                    self._send(200, outer.data_store.public_files[path],
                               ctype="application/octet-stream")
                else:
                    self._send(404, self._page("<p>not found</p>"))

            def do_POST(self):
                path = self.path.partition("?")[0]
                form = self._form()
                if path == "/signup":
                    try:
                        outer.accounts.create_user(
                            form.get("username", [""])[0],
                            form.get("email", [""])[0],
                            form.get("password", [""])[0])
                        self._send(200, self._page("<p>account created</p>"))
                    except ValueError as e:
                        self._send(400, self._page(f"<p>{html.escape(str(e))}</p>"))
                elif path == "/login":
                    s = outer.accounts.login(form.get("username", [""])[0],
                                             form.get("password", [""])[0])
                    if s is None:
                        self._send(403, self._page("<p>bad credentials</p>"))
                    else:
                        self._send(200, self._page("<p>logged in</p>"),
                                   cookies=[f"session_id={s.session_id}; HttpOnly; Path=/"])
                elif path == "/logout":
                    cookie = SimpleCookie(self.headers.get("Cookie", ""))
                    sid = cookie.get("session_id")
                    if sid is not None:
                        outer.accounts.logout(sid.value)
                    self._send(200, self._page("<p>logged out</p>"))
                else:
                    self._send(404, self._page("<p>not found</p>"))

        self.httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
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
