"""Blake2b hashing (SEAL-heritage HashFunction contract).

Counterpart of the reference's blake2b/blake2xb layer
(/root/reference/src/host/blake2b.cu, include/host/hash.h:19-29:
HashFunction::hash produces a 4x64-bit block over a uint64 buffer).  Not on
any hot path; bound to the stdlib implementation.
"""

from __future__ import annotations

import hashlib

import numpy as np

HASH_BLOCK_UINT64_COUNT = 4  # 256-bit digest, as the reference


def blake2b(data: bytes, digest_size: int = 64, key: bytes = b"") -> bytes:
    return hashlib.blake2b(data, digest_size=digest_size, key=key).digest()


def hash_uint64(buffer: np.ndarray | list[int]) -> tuple[int, int, int, int]:
    """HashFunction::hash: uint64 buffer -> 4x64-bit digest block."""
    arr = np.ascontiguousarray(np.asarray(buffer, dtype=np.uint64))
    digest = hashlib.blake2b(arr.tobytes(), digest_size=32).digest()
    words = np.frombuffer(digest, dtype=np.uint64)
    return tuple(int(w) for w in words)


def blake2xb(data: bytes, out_len: int, key: bytes = b"") -> bytes:
    """Extendable-output blake2 (reference blake2xb): stdlib blake2b in
    counter mode over the root hash — deterministic arbitrary-length
    expansion with the same security contract."""
    root = hashlib.blake2b(data, digest_size=64, key=key).digest()
    out = bytearray()
    counter = 0
    while len(out) < out_len:
        block = hashlib.blake2b(
            root + counter.to_bytes(8, "little"), digest_size=64
        ).digest()
        out.extend(block)
        counter += 1
    return bytes(out[:out_len])
