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


KNOWN_CIPHERS = ("aes-gcm-siv", "blake2b-ctr")


def cipher_name() -> str:
    return "aes-gcm-siv" if _HAVE_AES else "blake2b-ctr"


def cipher_available(cipher: str) -> bool:
    return cipher == "blake2b-ctr" or (cipher == "aes-gcm-siv" and _HAVE_AES)


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


def _require(cipher: str) -> None:
    from ..errors import Corrupted

    if cipher not in KNOWN_CIPHERS:
        raise Corrupted(f"unknown chunk cipher {cipher!r}")
    if not cipher_available(cipher):
        raise Corrupted(
            f"chunk encrypted with {cipher!r} but that cipher is unavailable "
            "in this environment (install 'cryptography' for aes-gcm-siv)"
        )


def encrypt_as(cipher: str, plaintext: bytes, key: bytes) -> bytes:
    """Encrypt under an explicitly-named cipher (raises Corrupted if it is
    unknown or unavailable here)."""
    _require(cipher)
    if cipher == "aes-gcm-siv":
        return AESGCMSIV(key).encrypt(_NONCE, plaintext, None)
    return _keystream_xor(key, plaintext)


def decrypt_as(cipher: str, ciphertext: bytes, key: bytes) -> bytes:
    """Decrypt branching on the cipher RECORDED with the chunk — never on
    what this environment would pick for writes.  XOR-decrypting an AES
    ciphertext with the blake2b keystream would silently return garbage (the
    fallback is unauthenticated); the recorded name makes the mismatch a
    loud Corrupted instead."""
    _require(cipher)
    if cipher == "aes-gcm-siv":
        try:
            return AESGCMSIV(key).decrypt(_NONCE, ciphertext, None)
        except Exception as e:  # InvalidTag and friends → uniform Corrupted
            from ..errors import Corrupted

            raise Corrupted(f"AEAD authentication failed: {e!r}") from e
    return _keystream_xor(key, ciphertext)


def encrypt(plaintext: bytes, key: bytes) -> bytes:
    """Encrypt with this environment's preferred cipher (cipher_name())."""
    return encrypt_as(cipher_name(), plaintext, key)


def decrypt(ciphertext: bytes, key: bytes) -> bytes:
    """Decrypt assuming this environment's preferred cipher.  Prefer
    decrypt_as(recorded_cipher, ...) wherever the cipher is recorded."""
    return decrypt_as(cipher_name(), ciphertext, key)
