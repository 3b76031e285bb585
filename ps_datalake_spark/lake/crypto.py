"""Convergent encryption for chunk payloads.

The reference encrypts each chunk deterministically — the key is derived from
the plaintext, so identical plaintexts produce identical ciphertexts and
dedup survives encryption (evidenced by the stored-hash == ciphertext-hash
verification at /root/reference/src/store/mod.rs:386-389,412-414).

Cipher: AES-GCM-SIV with key = sha256(plaintext) when the `cryptography`
package is available; otherwise a keystream cipher built from blake2b
(key ‖ counter → 64-byte blocks, XOR) — deterministic, self-inverse with the
same key, and dependency-free. Both are convergent; the store records which
was used per chunk so readers pick the right one.
"""

from __future__ import annotations

import hashlib

try:  # optional hardware-accelerated path
    from cryptography.hazmat.primitives.ciphers.aead import AESGCMSIV  # type: ignore

    _HAVE_AES = True
except ImportError:
    _HAVE_AES = False

_NONCE = b"ps-datalake!"  # fixed 12-byte nonce is safe: key is per-plaintext


def convergent_key(plaintext: bytes) -> bytes:
    """key = sha256(plaintext) — the convergence property."""
    return hashlib.sha256(plaintext).digest()


def cipher_name() -> str:
    return "aes-gcm-siv" if _HAVE_AES else "blake2b-ctr"


def _keystream_xor(key: bytes, data: bytes) -> bytes:
    out = bytearray(len(data))
    block = 64
    for i in range(0, len(data), block):
        ks = hashlib.blake2b(
            key + i.to_bytes(8, "big"), digest_size=min(block, len(data) - i)
        ).digest()
        chunk = data[i : i + len(ks)]
        out[i : i + len(ks)] = bytes(a ^ b for a, b in zip(chunk, ks))
    return bytes(out)


def encrypt(plaintext: bytes, key: bytes) -> bytes:
    if _HAVE_AES:
        return AESGCMSIV(key).encrypt(_NONCE, plaintext, None)
    return _keystream_xor(key, plaintext)


def decrypt(ciphertext: bytes, key: bytes) -> bytes:
    if _HAVE_AES:
        return AESGCMSIV(key).decrypt(_NONCE, ciphertext, None)
    return _keystream_xor(key, ciphertext)
