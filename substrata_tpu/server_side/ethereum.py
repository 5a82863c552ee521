"""Ethereum parcel-NFT minting support.

Parity with ethereum/ (RLP.{h,cpp}, Signing.{h,cpp}, Infura.{h,cpp},
UInt256.h, EthAddress.h, EthTransaction.h + vendored secp256k1) and
server/SubEthTransaction.*: RLP encoding, Keccak-256, secp256k1 ECDSA
signing with the legacy EIP-155 scheme, address derivation, and legacy
transaction construction.  Submission (Infura) is an interface: this image
has zero egress, so `EthProvider` is the seam a deployment plugs its RPC
client into.

Pure Python: this path runs a handful of times per parcel sale; correctness
over speed.
"""

from __future__ import annotations

import hashlib
import hmac
import secrets
from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# Keccak-256 (the original Keccak padding, NOT SHA3-256)
# ---------------------------------------------------------------------------

_ROUND_CONSTANTS = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_ROTATIONS = [
    [0, 36, 3, 41, 18], [1, 44, 10, 45, 2], [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56], [27, 20, 39, 8, 14],
]
_MASK = (1 << 64) - 1


def _rol(x, n):
    return ((x << n) | (x >> (64 - n))) & _MASK


def _keccak_f(state):
    for rc in _ROUND_CONSTANTS:
        # theta
        c = [state[x][0] ^ state[x][1] ^ state[x][2] ^ state[x][3] ^ state[x][4]
             for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rol(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                state[x][y] ^= d[x]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rol(state[x][y], _ROTATIONS[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                state[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y])
        # iota
        state[0][0] ^= rc
    return state


def keccak256(data: bytes) -> bytes:
    rate = 136  # bytes, for 256-bit output
    state = [[0] * 5 for _ in range(5)]
    # Keccak (pre-SHA3) multi-rate padding: 0x01 ... 0x80.
    padded = bytearray(data)
    padded.append(0x01)
    while len(padded) % rate:
        padded.append(0x00)
    padded[-1] |= 0x80
    for block_off in range(0, len(padded), rate):
        block = padded[block_off:block_off + rate]
        for i in range(rate // 8):
            lane = int.from_bytes(block[i * 8:(i + 1) * 8], "little")
            state[i % 5][i // 5] ^= lane
        state = _keccak_f(state)
    out = b""
    for i in range(4):  # 32 bytes
        out += state[i % 5][i // 5].to_bytes(8, "little")
    return out


# ---------------------------------------------------------------------------
# RLP (ethereum/RLP.cpp parity)
# ---------------------------------------------------------------------------

def _int_to_min_bytes(v: int) -> bytes:
    if v == 0:
        return b""
    return v.to_bytes((v.bit_length() + 7) // 8, "big")


def rlp_encode(item) -> bytes:
    """item: bytes | int | list (nested)."""
    if isinstance(item, int):
        item = _int_to_min_bytes(item)
    if isinstance(item, (bytes, bytearray)):
        item = bytes(item)
        if len(item) == 1 and item[0] < 0x80:
            return item
        if len(item) <= 55:
            return bytes([0x80 + len(item)]) + item
        ln = _int_to_min_bytes(len(item))
        return bytes([0xB7 + len(ln)]) + ln + item
    if isinstance(item, (list, tuple)):
        body = b"".join(rlp_encode(i) for i in item)
        if len(body) <= 55:
            return bytes([0xC0 + len(body)]) + body
        ln = _int_to_min_bytes(len(body))
        return bytes([0xF7 + len(ln)]) + ln + body
    raise TypeError(f"cannot RLP-encode {type(item)}")


def rlp_decode(data: bytes):
    item, rest = _rlp_decode_one(bytes(data))
    if rest:
        raise ValueError("trailing RLP bytes")
    return item


def _rlp_decode_one(data: bytes):
    if not data:
        raise ValueError("empty RLP")
    b0 = data[0]
    if b0 < 0x80:
        return data[:1], data[1:]
    if b0 <= 0xB7:
        n = b0 - 0x80
        return data[1:1 + n], data[1 + n:]
    if b0 <= 0xBF:
        ll = b0 - 0xB7
        n = int.from_bytes(data[1:1 + ll], "big")
        return data[1 + ll:1 + ll + n], data[1 + ll + n:]
    if b0 <= 0xF7:
        n = b0 - 0xC0
        body = data[1:1 + n]
        rest = data[1 + n:]
    else:
        ll = b0 - 0xF7
        n = int.from_bytes(data[1:1 + ll], "big")
        body = data[1 + ll:1 + ll + n]
        rest = data[1 + ll + n:]
    items = []
    while body:
        item, body = _rlp_decode_one(body)
        items.append(item)
    return items, rest


# ---------------------------------------------------------------------------
# secp256k1 ECDSA (ethereum/Signing.cpp + vendored secp256k1 parity)
# ---------------------------------------------------------------------------

_P = 2 ** 256 - 2 ** 32 - 977
_N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
_GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
_GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8


def _inv_mod(a, m):
    return pow(a, m - 2, m)


def _ec_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2 and (y1 + y2) % _P == 0:
        return None
    if p1 == p2:
        lam = (3 * x1 * x1) * _inv_mod(2 * y1, _P) % _P
    else:
        lam = (y2 - y1) * _inv_mod(x2 - x1, _P) % _P
    x3 = (lam * lam - x1 - x2) % _P
    y3 = (lam * (x1 - x3) - y1) % _P
    return x3, y3


def _ec_mul(k, point):
    result = None
    addend = point
    while k:
        if k & 1:
            result = _ec_add(result, addend)
        addend = _ec_add(addend, addend)
        k >>= 1
    return result


def generate_private_key() -> bytes:
    while True:
        k = secrets.randbits(256)
        if 1 <= k < _N:
            return k.to_bytes(32, "big")


def public_key_for(private_key: bytes) -> tuple:
    return _ec_mul(int.from_bytes(private_key, "big"), (_GX, _GY))


def eth_address_for(private_key: bytes) -> str:
    """EthAddress.h parity: keccak256(pubkey)[12:] as 0x-hex."""
    x, y = public_key_for(private_key)
    pub = x.to_bytes(32, "big") + y.to_bytes(32, "big")
    return "0x" + keccak256(pub)[12:].hex()


def _rfc6979_k(msg_hash: bytes, private_key: bytes) -> int:
    """Deterministic nonce (RFC 6979, SHA-256) — no RNG-reuse footguns."""
    v = b"\x01" * 32
    k = b"\x00" * 32
    k = hmac.new(k, v + b"\x00" + private_key + msg_hash, hashlib.sha256).digest()
    v = hmac.new(k, v, hashlib.sha256).digest()
    k = hmac.new(k, v + b"\x01" + private_key + msg_hash, hashlib.sha256).digest()
    v = hmac.new(k, v, hashlib.sha256).digest()
    while True:
        v = hmac.new(k, v, hashlib.sha256).digest()
        cand = int.from_bytes(v, "big")
        if 1 <= cand < _N:
            return cand
        k = hmac.new(k, v + b"\x00", hashlib.sha256).digest()
        v = hmac.new(k, v, hashlib.sha256).digest()


def ecdsa_sign(msg_hash: bytes, private_key: bytes):
    """Returns (r, s, recovery_id) with low-s normalisation."""
    z = int.from_bytes(msg_hash, "big")
    d = int.from_bytes(private_key, "big")
    while True:
        k = _rfc6979_k(msg_hash, private_key)
        x, y = _ec_mul(k, (_GX, _GY))
        r = x % _N
        if r == 0:
            msg_hash = keccak256(msg_hash)
            continue
        s = _inv_mod(k, _N) * (z + r * d) % _N
        if s == 0:
            msg_hash = keccak256(msg_hash)
            continue
        rec_id = (y & 1) ^ (1 if x >= _N else 0)
        if s > _N // 2:  # low-s (EIP-2)
            s = _N - s
            rec_id ^= 1
        return r, s, rec_id


def ecdsa_verify(msg_hash: bytes, r: int, s: int, public_key: tuple) -> bool:
    if not (1 <= r < _N and 1 <= s < _N):
        return False
    z = int.from_bytes(msg_hash, "big")
    w = _inv_mod(s, _N)
    u1 = z * w % _N
    u2 = r * w % _N
    pt = _ec_add(_ec_mul(u1, (_GX, _GY)), _ec_mul(u2, public_key))
    if pt is None:
        return False
    return pt[0] % _N == r


# ---------------------------------------------------------------------------
# Legacy transactions (EthTransaction.h / SubEthTransaction parity)
# ---------------------------------------------------------------------------

@dataclass
class EthTransaction:
    nonce: int = 0
    gas_price: int = 20 * 10 ** 9
    gas_limit: int = 100_000
    to: str = ""             # 0x-hex address
    value: int = 0
    data: bytes = b""
    chain_id: int = 1

    def signing_hash(self) -> bytes:
        """EIP-155 pre-image."""
        to_bytes = bytes.fromhex(self.to[2:]) if self.to else b""
        pre = [self.nonce, self.gas_price, self.gas_limit, to_bytes,
               self.value, self.data, self.chain_id, 0, 0]
        return keccak256(rlp_encode(pre))

    def sign(self, private_key: bytes) -> bytes:
        """Returns the raw signed RLP transaction."""
        r, s, rec = ecdsa_sign(self.signing_hash(), private_key)
        v = rec + 35 + 2 * self.chain_id
        to_bytes = bytes.fromhex(self.to[2:]) if self.to else b""
        return rlp_encode([self.nonce, self.gas_price, self.gas_limit,
                           to_bytes, self.value, self.data, v, r, s])


def make_mint_parcel_data(parcel_id: int, to_address: str) -> bytes:
    """SubEthTransaction parity: ABI-encoded mintParcel(uint256, address)."""
    selector = keccak256(b"mintParcel(uint256,address)")[:4]
    arg1 = parcel_id.to_bytes(32, "big")
    arg2 = bytes(12) + bytes.fromhex(to_address[2:])
    return selector + arg1 + arg2


class EthProvider:
    """RPC seam (ethereum/Infura.{h,cpp} parity): a deployment points this
    at its JSON-RPC endpoint; in-image there is no egress, so the default
    provider queues transactions for inspection."""

    def __init__(self):
        self.submitted: list[bytes] = []

    def send_raw_transaction(self, raw_tx: bytes) -> str:
        self.submitted.append(raw_tx)
        return "0x" + keccak256(raw_tx).hex()
