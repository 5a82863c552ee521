"""Configuration: server XML config + credentials, client settings store,
and command-line parsing.

Parity targets: server/ServerConfig.h + parseServerConfig (Server.cpp:156,
substrata_server_config.xml), SimpleCredentials (key=value lines,
Server.cpp:292-294), the client's persistent SettingsStore
(gui_client SettingsStore semantics, JSON-file backed here instead of
QSettings), and the server/client ArgumentParser syntax (Server.cpp:234-238).
"""

from __future__ import annotations

import argparse
import json
import os
import threading
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field


@dataclass
class ServerConfig:
    """server/ServerConfig.h fields with the same defaults."""

    webserver_fragments_dir: str = ""
    webserver_public_files_dir: str = ""
    webclient_dir: str = ""
    tls_certificate_path: str = ""
    tls_private_key_path: str = ""
    allow_light_mapper_bot_full_perms: bool = False
    update_parcel_sales: bool = False
    do_lua_http_request_rate_limiting: bool = True
    enable_LOD_chunking: bool = True
    enable_registration: bool = True
    enable_mcp_server: bool = True
    do_mcp_rate_limiting: bool = True
    AI_model_id: str = "xai/grok-4.5"
    shared_LLM_prompt_part: str = (
        "You are a helpful bot in the Substrata Metaverse.")


_BOOL_FIELDS = {
    "allow_light_mapper_bot_full_perms", "update_parcel_sales",
    "do_lua_http_request_rate_limiting", "enable_LOD_chunking",
    "enable_registration", "enable_mcp_server", "do_mcp_rate_limiting",
}


def parse_server_config(path_or_xml: str) -> ServerConfig:
    """parseServerConfig equivalent (Server.cpp:156): read the <config>
    element; unknown elements are ignored, missing ones keep defaults."""
    if os.path.exists(path_or_xml):
        with open(path_or_xml, "r", encoding="utf-8") as f:
            xml_text = f.read()
    else:
        xml_text = path_or_xml
    root = ET.fromstring(xml_text)
    if root.tag != "config":
        raise ValueError("server config root element must be <config>")
    cfg = ServerConfig()
    for child in root:
        if not hasattr(cfg, child.tag):
            continue
        text = (child.text or "").strip()
        if child.tag in _BOOL_FIELDS:
            setattr(cfg, child.tag, text.lower() in ("1", "true", "yes", "on"))
        else:
            setattr(cfg, child.tag, text)
    return cfg


@dataclass
class ServerCredentials:
    """SimpleCredentials (key=value lines; '#' comments)."""

    creds: dict = field(default_factory=dict)

    @classmethod
    def parse(cls, path_or_text: str) -> "ServerCredentials":
        if os.path.exists(path_or_text):
            with open(path_or_text, "r", encoding="utf-8") as f:
                text = f.read()
        else:
            text = path_or_text
        creds = {}
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, _, v = line.partition("=")
            creds[k.strip()] = v.strip()
        return cls(creds)

    def get(self, key: str, default: str = "") -> str:
        return self.creds.get(key, default)


class SettingsStore:
    """Persistent key-value settings (the client's SettingsStore; the
    reference uses QSettings — here a JSON file with atomic writes).
    Keys are slash-separated like QSettings ("ui/show_minimap")."""

    def __init__(self, path: str | None = None):
        self.path = path
        self._lock = threading.Lock()
        self._data: dict = {}
        if path and os.path.exists(path):
            try:
                with open(path, "r", encoding="utf-8") as f:
                    self._data = json.load(f)
            except (OSError, ValueError):
                self._data = {}

    def _flush(self):
        if not self.path:
            return
        tmp = self.path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(self._data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    def get_bool(self, key: str, default: bool = False) -> bool:
        with self._lock:
            return bool(self._data.get(key, default))

    def get_int(self, key: str, default: int = 0) -> int:
        with self._lock:
            return int(self._data.get(key, default))

    def get_double(self, key: str, default: float = 0.0) -> float:
        with self._lock:
            return float(self._data.get(key, default))

    def get_string(self, key: str, default: str = "") -> str:
        with self._lock:
            return str(self._data.get(key, default))

    def set(self, key: str, value):
        with self._lock:
            self._data[key] = value
            self._flush()

    # QSettings-style aliases
    def set_bool(self, key, value):
        self.set(key, bool(value))

    def set_int(self, key, value):
        self.set(key, int(value))

    def set_double(self, key, value):
        self.set(key, float(value))

    def set_string(self, key, value):
        self.set(key, str(value))


def server_arg_parser() -> argparse.ArgumentParser:
    """Server CLI syntax (Server.cpp:234-238)."""
    p = argparse.ArgumentParser(prog="substrata-tpu-server")
    p.add_argument("--enable_dev_mode", action="store_true")
    p.add_argument("--test", action="store_true")
    p.add_argument("--save_sanitised_database", type=str, default=None)
    p.add_argument("--db_path", type=str, default=None)
    p.add_argument("--do_not_load_resources", action="store_true")
    p.add_argument("--config", type=str, default=None,
                   help="path to substrata_server_config.xml")
    p.add_argument("--port", type=int, default=7600)
    p.add_argument("--udp_port", type=int, default=7601)
    p.add_argument("--web_port", type=int, default=80)
    return p


def client_arg_parser() -> argparse.ArgumentParser:
    """Client CLI syntax (gui_client main arg surface: a sub:// URL plus
    -h hostname / -u URL / --screenshotslave etc.; the TPU build keeps the
    headless-relevant subset)."""
    p = argparse.ArgumentParser(prog="substrata-tpu-client")
    p.add_argument("url", nargs="?", default=None,
                   help="sub://server/worldname URL to connect to")
    p.add_argument("-hostname", "--hostname", type=str, default="localhost")
    p.add_argument("--world", type=str, default="")
    p.add_argument("--settings", type=str, default=None,
                   help="path to the settings JSON")
    p.add_argument("--screenshotslave", action="store_true")
    p.add_argument("--no_MDI", action="store_true")
    return p


def parse_sub_url(url: str):
    """Parse sub://host[:port]/worldname (URLParser parity)."""
    if not url.startswith("sub://"):
        raise ValueError("not a sub:// URL")
    rest = url[len("sub://"):]
    hostport, _, world = rest.partition("/")
    host, _, port = hostport.partition(":")
    return host, (int(port) if port else 7600), world
