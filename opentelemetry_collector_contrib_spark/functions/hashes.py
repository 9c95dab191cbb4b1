"""Pure-Python hash primitives for OTTL converter parity.

Algorithms reimplemented from their public specifications (FNV-1a: the
Fowler–Noll–Vo spec; MurmurHash3 x64 128: Austin Appleby's public-domain
reference; XXH3: the published xxHash specification, whose default secret
and prime constants are spec values, not code). Validated bit-for-bit
against the reference's test vectors
(pkg/ottl/ottlfuncs/func_fnv_test.go, func_murmur3_hash128_test.go,
func_xxh3_test.go, func_xxh128_test.go) in tests/test_ottl_hashes.py.

These run inside Arrow-batched pandas UDFs (per-batch Python loops — the
documented slow path for converters with no JVM equivalent; the engine's
hot-path hashing stays on F.xxhash64 / F.sha2 / h60)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

_M64 = (1 << 64) - 1


def hash_batch_udf(py_fn, rettype: str):
    """Arrow-batched Column wrapper: py_fn(bytes) over each value, NULL
    passthrough. Iterator form so the closure binds once per executor."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(rettype)
    def run(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in it:
            yield batch.map(lambda v: None if v is None else py_fn(v.encode("utf-8")))

    return run

# --- FNV-1a 64 --------------------------------------------------------------

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3


def fnv1a_64(data: bytes) -> int:
    """FNV-1a 64-bit (hash/fnv New64a in the reference, func_fnv.go:43-56);
    returned as the signed int64 the reference emits."""
    h = _FNV_OFFSET
    for b in data:
        h = ((h ^ b) * _FNV_PRIME) & _M64
    return h - (1 << 64) if h >= (1 << 63) else h


# --- MurmurHash3 x64 128 ----------------------------------------------------

_MC1 = 0x87C37B91114253D5
_MC2 = 0x4CF5AD432745937F


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3 x64 variant, 128-bit → (h1, h2) as unsigned 64-bit ints.
    The reference hex-encodes little-endian h1||h2 (func_murmur3_hash128.go:35-48)."""
    h1 = h2 = seed & _M64
    n = len(data)
    nblocks = n // 16
    for i in range(nblocks):
        o = i * 16
        k1 = int.from_bytes(data[o : o + 8], "little")
        k2 = int.from_bytes(data[o + 8 : o + 16], "little")
        k1 = (_rotl64((k1 * _MC1) & _M64, 31) * _MC2) & _M64
        h1 ^= k1
        h1 = (_rotl64(h1, 27) + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (_rotl64((k2 * _MC2) & _M64, 33) * _MC1) & _M64
        h2 ^= k2
        h2 = (_rotl64(h2, 31) + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64
    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    t = len(tail)
    # tail mixing (explicit fallthrough order of the reference switch)
    if t >= 9:
        for i in range(t - 1, 7, -1):
            k2 = ((k2 << 8) | tail[i]) & _M64
        k2 = (_rotl64((k2 * _MC2) & _M64, 33) * _MC1) & _M64
        h2 ^= k2
    if t > 0:
        for i in range(min(t, 8) - 1, -1, -1):
            k1 = ((k1 << 8) | tail[i]) & _M64
        k1 = (_rotl64((k1 * _MC1) & _M64, 31) * _MC2) & _M64
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1, h2


def murmur3_128_hex(data: bytes) -> str:
    h1, h2 = murmur3_x64_128(data)
    return (h1.to_bytes(8, "little") + h2.to_bytes(8, "little")).hex()


# --- XXH3 (64 and 128) ------------------------------------------------------

_P32_1 = 0x9E3779B1
_P32_2 = 0x85EBCA77
_P32_3 = 0xC2B2AE3D
_P64_1 = 0x9E3779B185EBCA87
_P64_2 = 0xC2B2AE3D27D4EB4F
_P64_3 = 0x165667B19E3779F9
_P64_4 = 0x85EBCA77C2B2AE63
_P64_5 = 0x27D4EB2F165667C5
_MX1 = 0x165667919E3779F9
_MX2 = 0x9FB21C651E98DF25

_KSECRET = bytes.fromhex(
    "b8fe6c3923a44bbe7c01812cf721ad1c"
    "ded46de9839097db7240a4a4b7b3671f"
    "cb79e64eccc0e578825ad07dccff7221"
    "b8084674f743248ee03590e6813a264c"
    "3c2852bb91c300cb88d0658b1b532ea3"
    "71644897a20df94e3819ef46a9deacd8"
    "a8fa763fe39c343ff9dcbbc7c70b4f1d"
    "8a51e04bcdb45931c89f7ec9d9787364"
    "eac5ac8334d3ebc3c581a0fffa1363eb"
    "170ddd51b7f0da49d316552629d4689e"
    "2b16be587d47a1fc8ff8b8d17ad031ce"
    "45cb3a8f95160428afd7fbcabb4b407e"
)


def _r64(b: bytes, o: int) -> int:
    return int.from_bytes(b[o : o + 8], "little")


def _r32(b: bytes, o: int) -> int:
    return int.from_bytes(b[o : o + 4], "little")


def _swap32(x: int) -> int:
    return int.from_bytes((x & 0xFFFFFFFF).to_bytes(4, "little"), "big")


def _swap64(x: int) -> int:
    return int.from_bytes((x & _M64).to_bytes(8, "little"), "big")


def _avalanche(h: int) -> int:  # XXH3_avalanche
    h &= _M64
    h ^= h >> 37
    h = (h * _MX1) & _M64
    h ^= h >> 32
    return h


def _avalanche64(h: int) -> int:  # XXH64_avalanche
    h &= _M64
    h ^= h >> 33
    h = (h * _P64_2) & _M64
    h ^= h >> 29
    h = (h * _P64_3) & _M64
    h ^= h >> 32
    return h


def _mul128(a: int, b: int) -> tuple[int, int]:
    p = a * b
    return p & _M64, (p >> 64) & _M64


def _mul128_fold64(a: int, b: int) -> int:
    lo, hi = _mul128(a, b)
    return lo ^ hi


def _mix16(data: bytes, do: int, sec: bytes, so: int) -> int:
    return _mul128_fold64(
        _r64(data, do) ^ _r64(sec, so),
        _r64(data, do + 8) ^ _r64(sec, so + 8),
    )


def _accumulate_512(acc: list[int], data: bytes, do: int, sec: bytes, so: int) -> None:
    for i in range(8):
        dv = _r64(data, do + 8 * i)
        dk = dv ^ _r64(sec, so + 8 * i)
        acc[i ^ 1] = (acc[i ^ 1] + dv) & _M64
        acc[i] = (acc[i] + (dk & 0xFFFFFFFF) * (dk >> 32)) & _M64


def _scramble(acc: list[int], sec: bytes, so: int) -> None:
    for i in range(8):
        a = acc[i]
        a ^= a >> 47
        a ^= _r64(sec, so + 8 * i)
        acc[i] = (a * _P32_1) & _M64


def _hash_long_accs(data: bytes) -> list[int]:
    acc = [_P32_3, _P64_1, _P64_2, _P64_3, _P64_4, _P32_2, _P64_5, _P32_1]
    sec = _KSECRET
    n = len(data)
    stripes_per_block = (len(sec) - 64) // 8  # 16
    block_len = 64 * stripes_per_block
    nb_blocks = (n - 1) // block_len
    for b in range(nb_blocks):
        for s in range(stripes_per_block):
            _accumulate_512(acc, data, b * block_len + s * 64, sec, s * 8)
        _scramble(acc, sec, len(sec) - 64)
    nb_stripes = ((n - 1) - block_len * nb_blocks) // 64
    for s in range(nb_stripes):
        _accumulate_512(acc, data, nb_blocks * block_len + s * 64, sec, s * 8)
    _accumulate_512(acc, data, n - 64, sec, len(sec) - 64 - 7)
    return acc


def _merge_accs(acc: list[int], sec: bytes, so: int, start: int) -> int:
    r = start & _M64
    for i in range(4):
        r = (
            r
            + _mul128_fold64(
                acc[2 * i] ^ _r64(sec, so + 16 * i),
                acc[2 * i + 1] ^ _r64(sec, so + 16 * i + 8),
            )
        ) & _M64
    return _avalanche(r)


def xxh3_64(data: bytes) -> int:
    sec = _KSECRET
    n = len(data)
    if n == 0:
        return _avalanche64(_r64(sec, 56) ^ _r64(sec, 64))
    if n <= 3:
        c1, c2, c3 = data[0], data[n >> 1], data[-1]
        combined = (c1 << 16) | (c2 << 24) | c3 | (n << 8)
        bitflip = _r32(sec, 0) ^ _r32(sec, 4)
        return _avalanche64(combined ^ bitflip)
    if n <= 8:
        in1, in2 = _r32(data, 0), _r32(data, n - 4)
        bitflip = _r64(sec, 8) ^ _r64(sec, 16)
        keyed = (in2 | (in1 << 32)) ^ bitflip
        # rrmxmx
        h = keyed ^ _rotl64(keyed, 49) ^ _rotl64(keyed, 24)
        h = (h * _MX2) & _M64
        h ^= (h >> 35) + n
        h = (h * _MX2) & _M64
        return h ^ (h >> 28)
    if n <= 16:
        lo = _r64(data, 0) ^ (_r64(sec, 24) ^ _r64(sec, 32))
        hi = _r64(data, n - 8) ^ (_r64(sec, 40) ^ _r64(sec, 48))
        acc = (n + _swap64(lo) + hi + _mul128_fold64(lo, hi)) & _M64
        return _avalanche(acc)
    if n <= 128:
        acc = (n * _P64_1) & _M64
        if n > 32:
            if n > 64:
                if n > 96:
                    acc = (acc + _mix16(data, 48, sec, 96) + _mix16(data, n - 64, sec, 112)) & _M64
                acc = (acc + _mix16(data, 32, sec, 64) + _mix16(data, n - 48, sec, 80)) & _M64
            acc = (acc + _mix16(data, 16, sec, 32) + _mix16(data, n - 32, sec, 48)) & _M64
        acc = (acc + _mix16(data, 0, sec, 0) + _mix16(data, n - 16, sec, 16)) & _M64
        return _avalanche(acc)
    if n <= 240:
        acc = (n * _P64_1) & _M64
        for i in range(8):
            acc = (acc + _mix16(data, 16 * i, sec, 16 * i)) & _M64
        acc = _avalanche(acc)
        for i in range(8, n // 16):
            acc = (acc + _mix16(data, 16 * i, sec, 16 * (i - 8) + 3)) & _M64
        acc = (acc + _mix16(data, n - 16, sec, 136 - 17)) & _M64
        return _avalanche(acc)
    accs = _hash_long_accs(data)
    return _merge_accs(accs, sec, 11, (n * _P64_1) & _M64)


def xxh3_128(data: bytes) -> tuple[int, int]:
    """→ (low64, high64)."""
    sec = _KSECRET
    n = len(data)
    if n == 0:
        lo = _avalanche64(_r64(sec, 64) ^ _r64(sec, 72))
        hi = _avalanche64(_r64(sec, 80) ^ _r64(sec, 88))
        return lo, hi
    if n <= 3:
        c1, c2, c3 = data[0], data[n >> 1], data[-1]
        comb_lo = (c1 << 16) | (c2 << 24) | c3 | (n << 8)
        comb_hi = (_rotl32(_swap32(comb_lo), 13)) & 0xFFFFFFFF
        lo = _avalanche64(comb_lo ^ (_r32(sec, 0) ^ _r32(sec, 4)))
        hi = _avalanche64(comb_hi ^ (_r32(sec, 8) ^ _r32(sec, 12)))
        return lo, hi
    if n <= 8:
        in_lo, in_hi = _r32(data, 0), _r32(data, n - 4)
        in64 = in_lo | (in_hi << 32)
        keyed = in64 ^ (_r64(sec, 16) ^ _r64(sec, 24))
        m_lo, m_hi = _mul128(keyed, (_P64_1 + (n << 2)) & _M64)
        m_hi = (m_hi + ((m_lo << 1) & _M64)) & _M64
        m_lo ^= m_hi >> 3
        m_lo ^= m_lo >> 35
        m_lo = (m_lo * _MX2) & _M64
        m_lo ^= m_lo >> 28
        m_hi = _avalanche(m_hi)
        return m_lo, m_hi
    if n <= 16:
        in_lo = _r64(data, 0)
        in_hi = _r64(data, n - 8)
        in_lo ^= in_hi ^ (_r64(sec, 32) ^ _r64(sec, 40))
        m_lo, m_hi = _mul128(in_lo, _P64_1)
        m_lo = (m_lo + (((n - 1) << 54) & _M64)) & _M64
        in_hi ^= _r64(sec, 48) ^ _r64(sec, 56)
        m_hi = (m_hi + in_hi + (in_hi & 0xFFFFFFFF) * (_P32_2 - 1)) & _M64
        m_lo ^= _swap64(m_hi)
        h_lo, h_hi = _mul128(m_lo, _P64_2)
        h_hi = (h_hi + (m_hi * _P64_2)) & _M64
        return _avalanche(h_lo), _avalanche(h_hi)

    def mix32b(alo: int, ahi: int, o1: int, o2: int, so: int) -> tuple[int, int]:
        alo = (alo + _mix16(data, o1, sec, so)) & _M64
        alo ^= (_r64(data, o2) + _r64(data, o2 + 8)) & _M64
        ahi = (ahi + _mix16(data, o2, sec, so + 16)) & _M64
        ahi ^= (_r64(data, o1) + _r64(data, o1 + 8)) & _M64
        return alo, ahi

    if n <= 128:
        alo, ahi = (n * _P64_1) & _M64, 0
        i = (n - 1) // 32
        while i >= 0:
            alo, ahi = mix32b(alo, ahi, 16 * i, n - 16 * (i + 1), 32 * i)
            i -= 1
        lo = (alo + ahi) & _M64
        hi = ((alo * _P64_1) + (ahi * _P64_4) + (n * _P64_2)) & _M64
        return _avalanche(lo), (0 - _avalanche(hi)) & _M64
    if n <= 240:
        alo, ahi = (n * _P64_1) & _M64, 0
        for i in range(4):
            alo, ahi = mix32b(alo, ahi, 32 * i, 32 * i + 16, 32 * i)
        alo, ahi = _avalanche(alo), _avalanche(ahi)
        for i in range(4, n // 32):
            alo, ahi = mix32b(alo, ahi, 32 * i, 32 * i + 16, 3 + 32 * (i - 4))
        alo, ahi = mix32b(alo, ahi, n - 16, n - 32, 136 - 17 - 16)
        lo = (alo + ahi) & _M64
        hi = ((alo * _P64_1) + (ahi * _P64_4) + (n * _P64_2)) & _M64
        return _avalanche(lo), (0 - _avalanche(hi)) & _M64
    accs = _hash_long_accs(data)
    lo = _merge_accs(accs, sec, 11, (n * _P64_1) & _M64)
    hi = _merge_accs(accs, sec, len(sec) - 64 - 11, (~(n * _P64_2)) & _M64)
    return lo, hi


def _rotl32(x: int, r: int) -> int:
    x &= 0xFFFFFFFF
    return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF


def xxh3_64_hex(data: bytes) -> str:
    """Big-endian hex, matching hex.EncodeToString(Sum(nil)) (func_xxh3.go:45)."""
    return f"{xxh3_64(data):016x}"


def xxh3_128_hex(data: bytes) -> str:
    """Big-endian high||low, matching Sum128().Bytes() (func_xxh128.go:45)."""
    lo, hi = xxh3_128(data)
    return f"{hi:016x}{lo:016x}"
