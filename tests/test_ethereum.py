"""Ethereum layer tests (ethereum/: RLP, Keccak, secp256k1 signing,
EthTransaction; test vectors from the public specs)."""

import pytest

from substrata_tpu.server_side.ethereum import (
    EthProvider, EthTransaction, ecdsa_sign, ecdsa_verify, eth_address_for,
    generate_private_key, keccak256, make_mint_parcel_data, public_key_for,
    rlp_decode, rlp_encode,
)


def test_keccak256_vectors():
    # Canonical Keccak-256 vectors (original padding, not SHA3).
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    assert keccak256(b"hello world").hex() == (
        "47173285a8d7341e5e972fc677286384f802f8ef42a5ec5f03bbfa254cb01fad")


def test_rlp_vectors():
    # From the Ethereum RLP spec.
    assert rlp_encode(b"dog") == b"\x83dog"
    assert rlp_encode([b"cat", b"dog"]) == b"\xc8\x83cat\x83dog"
    assert rlp_encode(b"") == b"\x80"
    assert rlp_encode(0) == b"\x80"
    assert rlp_encode(15) == b"\x0f"
    assert rlp_encode(1024) == b"\x82\x04\x00"
    assert rlp_encode([]) == b"\xc0"
    long = b"Lorem ipsum dolor sit amet, consectetur adipisicing elit"
    assert rlp_encode(long) == b"\xb8\x38" + long
    # Nested: [ [], [[]], [ [], [[]] ] ]
    assert rlp_encode([[], [[]], [[], [[]]]]) == bytes.fromhex("c7c0c1c0c3c0c1c0")


def test_rlp_roundtrip():
    item = [b"hello", [b"a", b"bb"], b"\x01\x02\x03" * 30]
    assert rlp_decode(rlp_encode(item)) == item


def test_address_derivation():
    # Well-known test vector: private key 1.
    pk = (1).to_bytes(32, "big")
    assert eth_address_for(pk) == "0x7e5f4552091a69125d5dfcb7b8c2659029395bdf"
    pk2 = (2).to_bytes(32, "big")
    assert eth_address_for(pk2) == "0x2b5ad5c4795c026514f8317c7a215e218dccd6cf"


def test_sign_verify():
    pk = generate_private_key()
    pub = public_key_for(pk)
    h = keccak256(b"the message")
    r, s, rec = ecdsa_sign(h, pk)
    assert ecdsa_verify(h, r, s, pub)
    assert not ecdsa_verify(keccak256(b"other"), r, s, pub)
    # Deterministic nonce (RFC 6979): same signature twice.
    assert ecdsa_sign(h, pk) == (r, s, rec)


def test_transaction_sign_and_submit():
    pk = (0xC0FFEE).to_bytes(32, "big")
    tx = EthTransaction(nonce=3, gas_price=25 * 10 ** 9, gas_limit=120_000,
                        to="0x7e5f4552091a69125d5dfcb7b8c2659029395bdf",
                        value=10 ** 17,
                        data=make_mint_parcel_data(42, "0x2b5ad5c4795c026514f8317c7a215e218dccd6cf"),
                        chain_id=1)
    raw = tx.sign(pk)
    decoded = rlp_decode(raw)
    assert len(decoded) == 9
    v = int.from_bytes(decoded[6], "big")
    assert v in (37, 38)  # EIP-155 chain id 1
    # The mint call data has the right selector + args.
    data = decoded[5]
    assert data[:4] == keccak256(b"mintParcel(uint256,address)")[:4]
    assert int.from_bytes(data[4:36], "big") == 42
    provider = EthProvider()
    tx_hash = provider.send_raw_transaction(raw)
    assert tx_hash.startswith("0x") and len(tx_hash) == 66
    assert provider.submitted == [raw]
