"""MurmurHash3 x64 128-bit — the signature primitive of the engine.

Semantics mirror the reference's hash layer (apache/datasketches-pig
``src/main/java/org/apache/datasketches/pig/hash/MurmurHash3.java:45`` and the
datasketches-java MurmurHash3 it wraps), which is Austin Appleby's public-domain
MurmurHash3_x64_128: seed-parameterized, strings hashed as UTF-8 bytes
(``MurmurHash3.java:179``), null/empty inputs produce null (``:168-181``).

Two implementations live here:

* ``murmur3_x64_128`` — a scalar pure-Python implementation written directly
  from the public algorithm spec.  Used as the independent cross-check oracle
  in tests and for one-off hashing (config stamps, tiny inputs).
* ``murmur3_x64_128_fixed`` — a numpy-vectorized kernel over N inputs of one
  common byte length.  This is the hot path: shingle hashing, band hashing and
  signature derivation all call it on large batches inside Arrow pandas UDFs
  (no per-row Python).  Variable-length batches are handled by
  ``murmur3_bytes_batch`` which buckets rows by length and runs the fixed
  kernel per bucket.

The default sketch seed is 9001, matching the reference's update seed
(``src/main/javadoc/resources/dictionary.html:48-52``).
"""

from __future__ import annotations

import numpy as np

MASK64 = 0xFFFFFFFFFFFFFFFF
DEFAULT_SEED = 9001

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


# ---------------------------------------------------------------------------
# scalar reference implementation (pure python big-int, independent of numpy)
# ---------------------------------------------------------------------------

def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & MASK64
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = DEFAULT_SEED) -> tuple[int, int]:
    """Scalar MurmurHash3_x64_128 over ``data`` → (h1, h2) as uint64 ints."""
    length = len(data)
    h1 = seed & MASK64
    h2 = seed & MASK64
    nblocks = length // 16

    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")

        k1 = (k1 * _C1) & MASK64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & MASK64
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & MASK64
        h1 = (h1 * 5 + 0x52DCE729) & MASK64

        k2 = (k2 * _C2) & MASK64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & MASK64
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & MASK64
        h2 = (h2 * 5 + 0x38495AB5) & MASK64

    tail = data[nblocks * 16 :]
    k1 = 0
    k2 = 0
    tlen = len(tail)
    if tlen > 8:
        for i in range(tlen - 1, 7, -1):
            k2 = (k2 << 8) | tail[i]
        k2 = (k2 * _C2) & MASK64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & MASK64
        h2 ^= k2
    if tlen > 0:
        for i in range(min(tlen, 8) - 1, -1, -1):
            k1 = (k1 << 8) | tail[i]
        k1 = (k1 * _C1) & MASK64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & MASK64
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & MASK64
    h2 = (h2 + h1) & MASK64
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & MASK64
    h2 = (h2 + h1) & MASK64
    return h1, h2


# ---------------------------------------------------------------------------
# vectorized kernel — N rows, one fixed byte length
# ---------------------------------------------------------------------------

def _rotl_v(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _fmix_v(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xC4CEB9FE1A85EC53)
    k = k ^ (k >> np.uint64(33))
    return k


def murmur3_x64_128_fixed(data: np.ndarray, seed: int = DEFAULT_SEED) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized MurmurHash3_x64_128 over ``data`` of shape (N, L) uint8.

    All rows share byte length L.  Returns (h1, h2) uint64 arrays of shape (N,).
    numpy uint64 arithmetic wraps mod 2**64, matching the C semantics.
    """
    if data.ndim != 2 or data.dtype != np.uint8:
        raise ValueError("data must be a 2-D uint8 array (N rows × L bytes)")
    n, length = data.shape
    c1 = np.uint64(_C1)
    c2 = np.uint64(_C2)
    h1 = np.full(n, np.uint64(seed & MASK64), dtype=np.uint64)
    h2 = h1.copy()
    if length == 0:
        words64 = np.zeros((n, 0), dtype=np.uint64)
    else:
        # Zero-pad each row to a 16-byte multiple and view as little-endian
        # uint64 words.  Zero padding reproduces the tail-assembly semantics
        # exactly (tail k1/k2 are built byte-by-byte with missing bytes = 0),
        # so both body blocks and the tail read straight out of this view —
        # no per-byte shift/accumulate needed.
        padded_len = ((length + 15) // 16) * 16
        buf = np.zeros((n, padded_len), dtype=np.uint8)
        buf[:, :length] = data
        words64 = buf.view(np.uint64)
        if not np.little_endian:  # pragma: no cover
            words64 = words64.byteswap()

    nblocks = length // 16
    for i in range(nblocks):
        k1 = words64[:, 2 * i].copy()
        k2 = words64[:, 2 * i + 1].copy()

        k1 *= c1
        k1 = _rotl_v(k1, 31)
        k1 *= c2
        h1 ^= k1
        h1 = _rotl_v(h1, 27)
        h1 += h2
        h1 = h1 * np.uint64(5) + np.uint64(0x52DCE729)

        k2 *= c2
        k2 = _rotl_v(k2, 33)
        k2 *= c1
        h2 ^= k2
        h2 = _rotl_v(h2, 31)
        h2 += h1
        h2 = h2 * np.uint64(5) + np.uint64(0x38495AB5)

    tlen = length - nblocks * 16
    if tlen > 0:
        if tlen > 8:
            k2 = words64[:, 2 * nblocks + 1].copy()
            k2 *= c2
            k2 = _rotl_v(k2, 33)
            k2 *= c1
            h2 ^= k2
        k1 = words64[:, 2 * nblocks].copy()
        k1 *= c1
        k1 = _rotl_v(k1, 31)
        k1 *= c2
        h1 ^= k1

    ln = np.uint64(length)
    h1 ^= ln
    h2 ^= ln
    h1 += h2
    h2 += h1
    h1 = _fmix_v(h1)
    h2 = _fmix_v(h2)
    h1 += h2
    h2 += h1
    return h1, h2


def murmur3_bytes_batch(values: list[bytes | None], seed: int = DEFAULT_SEED) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Hash a batch of variable-length byte strings.

    Rows are bucketed by length so each bucket runs through the fixed-length
    vectorized kernel.  Null / empty inputs produce null (valid_mask False),
    mirroring the reference's skip rule (``hash/MurmurHash3.java:168-181``).

    Returns (h1, h2, valid_mask); h1/h2 are uint64 with undefined content where
    valid_mask is False.
    """
    n = len(values)
    h1 = np.zeros(n, dtype=np.uint64)
    h2 = np.zeros(n, dtype=np.uint64)
    valid = np.zeros(n, dtype=bool)

    by_len: dict[int, list[int]] = {}
    for i, v in enumerate(values):
        if v is None or len(v) == 0:
            continue
        by_len.setdefault(len(v), []).append(i)

    for length, idxs in by_len.items():
        if length > 4096 and len(idxs) < 64:
            # long, sparse bucket: the vectorized kernel degrades to a python
            # loop over blocks of tiny arrays — the scalar big-int path is
            # faster there
            for i in idxs:
                a, b = murmur3_x64_128(values[i], seed)
                h1[i] = a
                h2[i] = b
                valid[i] = True
            continue
        buf = np.empty((len(idxs), length), dtype=np.uint8)
        for j, i in enumerate(idxs):
            buf[j] = np.frombuffer(values[i], dtype=np.uint8)
        a, b = murmur3_x64_128_fixed(buf, seed)
        ii = np.asarray(idxs)
        h1[ii] = a
        h2[ii] = b
        valid[ii] = True
    return h1, h2, valid


def murmur3_long_batch(values: np.ndarray, seed: int = DEFAULT_SEED) -> tuple[np.ndarray, np.ndarray]:
    """Hash int64/uint64 values as their 8-byte little-endian representation,
    matching datasketches' update(long) (one-element long array)."""
    v = np.ascontiguousarray(values.astype(np.uint64))
    data = v.view(np.uint8).reshape(len(v), 8)
    if not np.little_endian:  # pragma: no cover - x86/arm are little-endian
        data = data[:, ::-1]
    return murmur3_x64_128_fixed(data, seed)
