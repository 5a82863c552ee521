"""TLS for both planes (reference parity).

The reference TLS-wraps every game-protocol connection after accept
(server/ListenerThread.cpp: accept -> TLSSocket handshake) and serves the
website over HTTPS on 443 (server/Server.cpp:519-522, webserver TLS
config).  Here:

- ``make_server_context`` / ``make_client_context`` build ``ssl`` contexts
  for the game listener (net/server.py), the game client (net/client.py),
  and the webserver (server_side/webserver.py).
- ``generate_self_signed_cert`` creates a throwaway cert/key pair for tests
  and dev servers (the reference ships a similar dev fallback; production
  points at real cert files).

Uses the stdlib ``ssl`` module; cert generation prefers the ``cryptography``
package and falls back to the ``openssl`` CLI, so nothing here adds a hard
dependency.
"""

from __future__ import annotations

import datetime
import os
import ssl
import subprocess
import tempfile


def generate_self_signed_cert(common_name: str = "localhost",
                              out_dir: str | None = None):
    """Create (cert_path, key_path) for a throwaway self-signed cert."""
    out_dir = out_dir or tempfile.mkdtemp(prefix="substrata_tls_")
    cert_path = os.path.join(out_dir, "cert.pem")
    key_path = os.path.join(out_dir, "key.pem")
    try:
        from cryptography import x509
        from cryptography.hazmat.primitives import hashes, serialization
        from cryptography.hazmat.primitives.asymmetric import rsa
        from cryptography.x509.oid import NameOID

        key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
        name = x509.Name(
            [x509.NameAttribute(NameOID.COMMON_NAME, common_name)])
        now = datetime.datetime.now(datetime.timezone.utc)
        cert = (x509.CertificateBuilder()
                .subject_name(name).issuer_name(name)
                .public_key(key.public_key())
                .serial_number(x509.random_serial_number())
                .not_valid_before(now - datetime.timedelta(minutes=5))
                .not_valid_after(now + datetime.timedelta(days=365))
                .add_extension(x509.SubjectAlternativeName(
                    [x509.DNSName(common_name),
                     x509.DNSName("localhost"),
                     x509.IPAddress(__import__("ipaddress").ip_address(
                         "127.0.0.1"))]), critical=False)
                .sign(key, hashes.SHA256()))
        with open(key_path, "wb") as f:
            f.write(key.private_bytes(
                serialization.Encoding.PEM,
                serialization.PrivateFormat.TraditionalOpenSSL,
                serialization.NoEncryption()))
        with open(cert_path, "wb") as f:
            f.write(cert.public_bytes(serialization.Encoding.PEM))
    except ImportError:
        subprocess.run(
            ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
             "-keyout", key_path, "-out", cert_path, "-days", "365",
             "-subj", f"/CN={common_name}",
             "-addext", "subjectAltName=DNS:localhost,IP:127.0.0.1"],
            check=True, capture_output=True)
    return cert_path, key_path


def make_server_context(certfile: str, keyfile: str) -> ssl.SSLContext:
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(certfile, keyfile)
    return ctx


def make_client_context(cafile: str | None = None,
                        insecure: bool = False) -> ssl.SSLContext:
    """Client context; ``insecure=True`` skips verification (dev servers
    with self-signed certs, like the reference client's allow-insecure
    connection option)."""
    ctx = ssl.create_default_context(cafile=cafile)
    if insecure:
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
    return ctx
