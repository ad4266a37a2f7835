"""MySQL/Doris-compatible block ciphers (pure python).

Doris's aes_encrypt/aes_decrypt follow MySQL semantics
(be/src/util/encryption_util.h; function_encryption.cpp):

- the user KEY is folded into the cipher key size by XOR
  (MySQL ``my_aes_create_key``): byte i of the input XORs into slot
  ``i % key_bytes`` — NOT a hash, NOT a truncation;
- block modes ECB/CBC pad with PKCS#7; CTR/OFB/CFB are stream modes;
- the active default mode comes from the ``block_encryption_mode``
  session variable (default AES_128_ECB), overridable per call via the
  4th argument;
- decrypt failures (bad padding/length) return NULL.

Spark's builtin aes_encrypt (GCM default, raw key, no folding) is
byte-incompatible, so these kernels back the Doris spellings
(query_p0/sql_functions/encryption_digest/test_encryption_function.
groovy). Pure python AES/SM4: the container has no crypto lib, and the
suite payloads are tiny.
"""

from __future__ import annotations

# ---------------------------------------------------------------- AES

def _xtime(a: int) -> int:
    return ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else a << 1


def _gmul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        b >>= 1
        a = _xtime(a)
    return p


def _build_tables():
    inv = [0] * 256
    for i in range(1, 256):
        # brute-force GF(2^8) inverse — import-time only
        for j in range(1, 256):
            if _gmul(i, j) == 1:
                inv[i] = j
                break

    def rotl8(x, n):
        return ((x << n) | (x >> (8 - n))) & 0xFF

    sbox = [0] * 256
    for i in range(256):
        b = inv[i]
        sbox[i] = (
            b ^ rotl8(b, 1) ^ rotl8(b, 2) ^ rotl8(b, 3) ^ rotl8(b, 4)
            ^ 0x63
        )
    inv_sbox = [0] * 256
    for i, s in enumerate(sbox):
        inv_sbox[s] = i
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _build_tables()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36,
         0x6C, 0xD8, 0xAB, 0x4D]


def _key_expand(key: bytes) -> list:
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([w[i - nk][j] ^ t[j] for j in range(4)])
    return [sum((w[4 * r + c] for c in range(4)), []) for r in range(nr + 1)]


def _enc_block(block: bytes, rks: list) -> bytes:
    s = [b ^ k for b, k in zip(block, rks[0])]
    nr = len(rks) - 1
    for rnd in range(1, nr + 1):
        s = [_SBOX[b] for b in s]
        # ShiftRows on column-major state: byte index = 4*col + row
        s = [s[(4 * ((i // 4) + (i % 4)) + (i % 4)) % 16] for i in range(16)]
        if rnd != nr:
            t = []
            for c in range(4):
                col = s[4 * c : 4 * c + 4]
                t += [
                    _gmul(col[0], 2) ^ _gmul(col[1], 3) ^ col[2] ^ col[3],
                    col[0] ^ _gmul(col[1], 2) ^ _gmul(col[2], 3) ^ col[3],
                    col[0] ^ col[1] ^ _gmul(col[2], 2) ^ _gmul(col[3], 3),
                    _gmul(col[0], 3) ^ col[1] ^ col[2] ^ _gmul(col[3], 2),
                ]
            s = t
        s = [b ^ k for b, k in zip(s, rks[rnd])]
    return bytes(s)


def _dec_block(block: bytes, rks: list) -> bytes:
    nr = len(rks) - 1
    s = [b ^ k for b, k in zip(block, rks[nr])]
    for rnd in range(nr - 1, -1, -1):
        # InvShiftRows
        s = [s[(4 * ((i // 4) - (i % 4)) + (i % 4)) % 16] for i in range(16)]
        s = [_INV_SBOX[b] for b in s]
        s = [b ^ k for b, k in zip(s, rks[rnd])]
        if rnd != 0:
            t = []
            for c in range(4):
                col = s[4 * c : 4 * c + 4]
                t += [
                    _gmul(col[0], 14) ^ _gmul(col[1], 11)
                    ^ _gmul(col[2], 13) ^ _gmul(col[3], 9),
                    _gmul(col[0], 9) ^ _gmul(col[1], 14)
                    ^ _gmul(col[2], 11) ^ _gmul(col[3], 13),
                    _gmul(col[0], 13) ^ _gmul(col[1], 9)
                    ^ _gmul(col[2], 14) ^ _gmul(col[3], 11),
                    _gmul(col[0], 11) ^ _gmul(col[1], 13)
                    ^ _gmul(col[2], 9) ^ _gmul(col[3], 14),
                ]
            s = t
    return bytes(s)


# ---------------------------------------------------------------- SM4

_SM4_SBOX = bytes([
    0xd6, 0x90, 0xe9, 0xfe, 0xcc, 0xe1, 0x3d, 0xb7, 0x16, 0xb6, 0x14,
    0xc2, 0x28, 0xfb, 0x2c, 0x05, 0x2b, 0x67, 0x9a, 0x76, 0x2a, 0xbe,
    0x04, 0xc3, 0xaa, 0x44, 0x13, 0x26, 0x49, 0x86, 0x06, 0x99, 0x9c,
    0x42, 0x50, 0xf4, 0x91, 0xef, 0x98, 0x7a, 0x33, 0x54, 0x0b, 0x43,
    0xed, 0xcf, 0xac, 0x62, 0xe4, 0xb3, 0x1c, 0xa9, 0xc9, 0x08, 0xe8,
    0x95, 0x80, 0xdf, 0x94, 0xfa, 0x75, 0x8f, 0x3f, 0xa6, 0x47, 0x07,
    0xa7, 0xfc, 0xf3, 0x73, 0x17, 0xba, 0x83, 0x59, 0x3c, 0x19, 0xe6,
    0x85, 0x4f, 0xa8, 0x68, 0x6b, 0x81, 0xb2, 0x71, 0x64, 0xda, 0x8b,
    0xf8, 0xeb, 0x0f, 0x4b, 0x70, 0x56, 0x9d, 0x35, 0x1e, 0x24, 0x0e,
    0x5e, 0x63, 0x58, 0xd1, 0xa2, 0x25, 0x22, 0x7c, 0x3b, 0x01, 0x21,
    0x78, 0x87, 0xd4, 0x00, 0x46, 0x57, 0x9f, 0xd3, 0x27, 0x52, 0x4c,
    0x36, 0x02, 0xe7, 0xa0, 0xc4, 0xc8, 0x9e, 0xea, 0xbf, 0x8a, 0xd2,
    0x40, 0xc7, 0x38, 0xb5, 0xa3, 0xf7, 0xf2, 0xce, 0xf9, 0x61, 0x15,
    0xa1, 0xe0, 0xae, 0x5d, 0xa4, 0x9b, 0x34, 0x1a, 0x55, 0xad, 0x93,
    0x32, 0x30, 0xf5, 0x8c, 0xb1, 0xe3, 0x1d, 0xf6, 0xe2, 0x2e, 0x82,
    0x66, 0xca, 0x60, 0xc0, 0x29, 0x23, 0xab, 0x0d, 0x53, 0x4e, 0x6f,
    0xd5, 0xdb, 0x37, 0x45, 0xde, 0xfd, 0x8e, 0x2f, 0x03, 0xff, 0x6a,
    0x72, 0x6d, 0x6c, 0x5b, 0x51, 0x8d, 0x1b, 0xaf, 0x92, 0xbb, 0xdd,
    0xbc, 0x7f, 0x11, 0xd9, 0x5c, 0x41, 0x1f, 0x10, 0x5a, 0xd8, 0x0a,
    0xc1, 0x31, 0x88, 0xa5, 0xcd, 0x7b, 0xbd, 0x2d, 0x74, 0xd0, 0x12,
    0xb8, 0xe5, 0xb4, 0xb0, 0x89, 0x69, 0x97, 0x4a, 0x0c, 0x96, 0x77,
    0x7e, 0x65, 0xb9, 0xf1, 0x09, 0xc5, 0x6e, 0xc6, 0x84, 0x18, 0xf0,
    0x7d, 0xec, 0x3a, 0xdc, 0x4d, 0x20, 0x79, 0xee, 0x5f, 0x3e, 0xd7,
    0xcb, 0x39, 0x48,
])
_SM4_FK = [0xA3B1BAC6, 0x56AA3350, 0x677D9197, 0xB27022DC]
# CK[i] byte j = (7 * (4i + j)) mod 256 (GB/T 32907-2016)
_SM4_CK = []
for _i in range(32):
    _ck = 0
    for _j in range(4):
        _ck = (_ck << 8) | ((7 * (4 * _i + _j)) % 256)
    _SM4_CK.append(_ck)


def _rotl32(x: int, n: int) -> int:
    return ((x << n) | (x >> (32 - n))) & 0xFFFFFFFF


def _sm4_tau(a: int) -> int:
    return (
        (_SM4_SBOX[(a >> 24) & 0xFF] << 24)
        | (_SM4_SBOX[(a >> 16) & 0xFF] << 16)
        | (_SM4_SBOX[(a >> 8) & 0xFF] << 8)
        | _SM4_SBOX[a & 0xFF]
    )


def _sm4_key_expand(key: bytes) -> list:
    mk = [int.from_bytes(key[4 * i : 4 * i + 4], "big") for i in range(4)]
    k = [mk[i] ^ _SM4_FK[i] for i in range(4)]
    rks = []
    for i in range(32):
        t = k[1] ^ k[2] ^ k[3] ^ _SM4_CK[i]
        t = _sm4_tau(t)
        t = t ^ _rotl32(t, 13) ^ _rotl32(t, 23)
        nk = k[0] ^ t
        rks.append(nk)
        k = k[1:] + [nk]
    return rks


def _sm4_crypt_block(block: bytes, rks: list) -> bytes:
    x = [int.from_bytes(block[4 * i : 4 * i + 4], "big") for i in range(4)]
    for i in range(32):
        t = x[1] ^ x[2] ^ x[3] ^ rks[i]
        t = _sm4_tau(t)
        t = (
            t ^ _rotl32(t, 2) ^ _rotl32(t, 10) ^ _rotl32(t, 18)
            ^ _rotl32(t, 24)
        )
        x = x[1:] + [x[0] ^ t]
    return b"".join(v.to_bytes(4, "big") for v in reversed(x))


# ------------------------------------------------------- MurmurHash3
# (util/hash/murmur_hash3.cpp + util/hash_util.hpp; exprs/function/
# function_hash.cpp: variadic args CHAIN — each argument is hashed with
# the previous result as seed; the 32-bit family seeds with 104729.)

_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF
# _rotl32 (32-bit rotate) is defined in the SM4 section above


def _rotl64b(x: int, n: int) -> int:
    return ((x << n) | (x >> (64 - n))) & _M64


def _fmix32(h: int) -> int:
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64
    k ^= k >> 33
    return k


def mmh3_x86_32(data: bytes, seed: int) -> int:
    h = seed & _M32
    c1, c2 = 0xCC9E2D51, 0x1B873593
    n = len(data)
    for i in range(0, n - n % 4, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & _M32
        k = _rotl32(k, 15)
        k = (k * c2) & _M32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
    k = 0
    tail = data[n - n % 4 :]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & _M32
        k = _rotl32(k, 15)
        k = (k * c2) & _M32
        h ^= k
    h ^= n
    return _fmix32(h)


_MC1 = 0x87C37B91114253D5
_MC2 = 0x4CF5AD432745937F


def mmh3_x64_process(data: bytes, h1: int, h2: int):
    """murmur_hash3_x64_process: x64_128 body+tail+finalization over a
    caller-carried (h1, h2) state."""
    n = len(data)
    for i in range(0, n - n % 16, 16):
        k1 = int.from_bytes(data[i : i + 8], "little")
        k2 = int.from_bytes(data[i + 8 : i + 16], "little")
        k1 = (k1 * _MC1) & _M64
        k1 = _rotl64b(k1, 31)
        k1 = (k1 * _MC2) & _M64
        h1 ^= k1
        h1 = _rotl64b(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * _MC2) & _M64
        k2 = _rotl64b(k2, 33)
        k2 = (k2 * _MC1) & _M64
        h2 ^= k2
        h2 = _rotl64b(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64
    tail = data[n - n % 16 :]
    k1 = k2 = 0
    for j in range(len(tail) - 1, 7, -1):
        k2 ^= tail[j] << (8 * (j - 8))
    if len(tail) > 8:
        k2 = (k2 * _MC2) & _M64
        k2 = _rotl64b(k2, 33)
        k2 = (k2 * _MC1) & _M64
        h2 ^= k2
    for j in range(min(len(tail), 8) - 1, -1, -1):
        k1 ^= tail[j] << (8 * j)
    if len(tail) > 0:
        k1 = (k1 * _MC1) & _M64
        k1 = _rotl64b(k1, 31)
        k1 = (k1 * _MC2) & _M64
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


def mmh3_x64_64(data: bytes, seed: int) -> int:
    """The standalone 64-bit variant (murmur_hash3_x64_64)."""
    h1 = seed & _M64
    n = len(data)
    for i in range(0, n - n % 8, 8):
        k1 = int.from_bytes(data[i : i + 8], "little")
        k1 = (k1 * _MC1) & _M64
        k1 = _rotl64b(k1, 31)
        k1 = (k1 * _MC2) & _M64
        h1 ^= k1
        h1 = _rotl64b(h1, 27)
        h1 = (h1 * 5 + 0x52DCE729) & _M64
    tail = data[n - n % 8 :]
    k1 = 0
    for j in range(len(tail) - 1, -1, -1):
        k1 ^= tail[j] << (8 * j)
    if tail:
        k1 = (k1 * _MC1) & _M64
        k1 = _rotl64b(k1, 31)
        k1 = (k1 * _MC2) & _M64
        h1 ^= k1
    h1 ^= n
    return _fmix64(h1)


def _signed(v: int, bits: int) -> int:
    return v - (1 << bits) if v >= (1 << (bits - 1)) else v


def _mmh3_chain(args, variant):
    """Doris variadic chaining: NULL any arg -> NULL; each arg's hash
    seeds the next."""
    if args is None:
        return None
    vals = list(args)
    if any(v is None for v in vals):
        return None
    bs = [str(v).encode("utf-8") for v in vals]
    if variant == "32":
        h = 104729
        for b in bs:
            h = mmh3_x86_32(b, h)
        return _signed(h, 32)
    if variant == "64":
        h = 0
        for b in bs:
            h = mmh3_x64_64(b, h)
        return _signed(h, 64)
    if variant in ("64_v2", "u64_v2"):
        h = 0
        for b in bs:
            h, _ = mmh3_x64_process(b, h, h)
        return _signed(h, 64) if variant == "64_v2" else str(h)
    # 128 / u128: packed state h1 low 64, h2 high 64; first arg seeds 0
    h1 = h2 = 0
    first = True
    for b in bs:
        if first:
            h1, h2 = mmh3_x64_process(b, 0, 0)
            first = False
        else:
            h1, h2 = mmh3_x64_process(b, h1, h2)
    packed = (h2 << 64) | h1
    return (
        str(_signed(packed, 128)) if variant == "128" else str(packed)
    )


# ------------------------------------------------------------- xxHash
# (hash_util.hpp xxHash32WithSeed/xxHash64WithSeed; chained variadics
# like the murmur family, initial seed 0)

_X64P1 = 0x9E3779B185EBCA87
_X64P2 = 0xC2B2AE3D27D4EB4F
_X64P3 = 0x165667B19E3779F9
_X64P4 = 0x85EBCA77C2B2AE63
_X64P5 = 0x27D4EB2F165667C5


def xxh64(data: bytes, seed: int) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _X64P1 + _X64P2) & _M64
        v2 = (seed + _X64P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _X64P1) & _M64

        def rnd(acc, lane):
            acc = (acc + lane * _X64P2) & _M64
            acc = _rotl64b(acc, 31)
            return (acc * _X64P1) & _M64

        while i <= n - 32:
            v1 = rnd(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = rnd(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = rnd(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = rnd(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl64b(v1, 1) + _rotl64b(v2, 7) + _rotl64b(v3, 12)
            + _rotl64b(v4, 18)
        ) & _M64

        def merge(acc, val):
            acc ^= rnd(0, val)
            return (acc * _X64P1 + _X64P4) & _M64

        h = merge(h, v1)
        h = merge(h, v2)
        h = merge(h, v3)
        h = merge(h, v4)
    else:
        h = (seed + _X64P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        k = int.from_bytes(data[i : i + 8], "little")
        k = (k * _X64P2) & _M64
        k = _rotl64b(k, 31)
        k = (k * _X64P1) & _M64
        h ^= k
        h = (_rotl64b(h, 27) * _X64P1 + _X64P4) & _M64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _X64P1) & _M64
        h = (_rotl64b(h, 23) * _X64P2 + _X64P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _X64P5) & _M64
        h = (_rotl64b(h, 11) * _X64P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _X64P2) & _M64
    h ^= h >> 29
    h = (h * _X64P3) & _M64
    h ^= h >> 32
    return h


_X32P1 = 2654435761
_X32P2 = 2246822519
_X32P3 = 3266489917
_X32P4 = 668265263
_X32P5 = 374761393


def xxh32(data: bytes, seed: int) -> int:
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _X32P1 + _X32P2) & _M32
        v2 = (seed + _X32P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _X32P1) & _M32

        def rnd(acc, lane):
            acc = (acc + lane * _X32P2) & _M32
            acc = _rotl32(acc, 13)
            return (acc * _X32P1) & _M32

        while i <= n - 16:
            v1 = rnd(v1, int.from_bytes(data[i : i + 4], "little"))
            v2 = rnd(v2, int.from_bytes(data[i + 4 : i + 8], "little"))
            v3 = rnd(v3, int.from_bytes(data[i + 8 : i + 12], "little"))
            v4 = rnd(v4, int.from_bytes(data[i + 12 : i + 16], "little"))
            i += 16
        h = (
            _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12)
            + _rotl32(v4, 18)
        ) & _M32
    else:
        h = (seed + _X32P5) & _M32
    h = (h + n) & _M32
    while i <= n - 4:
        h = (h + int.from_bytes(data[i : i + 4], "little") * _X32P3) & _M32
        h = (_rotl32(h, 17) * _X32P4) & _M32
        i += 4
    while i < n:
        h = (h + data[i] * _X32P5) & _M32
        h = (_rotl32(h, 11) * _X32P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _X32P2) & _M32
    h ^= h >> 13
    h = (h * _X32P3) & _M32
    h ^= h >> 16
    return h


# XXH3-64 (xxhash v0.8 XXH3_64bits_withSeed — hash_util.hpp routes
# xxhash_64 through XXH3, NOT classic XXH64). Standard 192-byte secret.
_K_SECRET = bytes.fromhex(
    "b8fe6c3923a44bbe7c01812cf721ad1cded46de9839097db7240a4a4b7b3671f"
    "cb79e64eccc0e578825ad07dccff7221b8084674f743248ee03590e6813a264c"
    "3c2852bb91c300cb88d0658b1b532ea371644897a20df94e3819ef46a9deacd8"
    "a8fa763fe39c343ff9dcbbc7c70b4f1d8a51e04bcdb45931c89f7ec9d9787364"
    "eac5ac8334d3ebc3c581a0fffa1363eb170ddd51b7f0da49d316552629d4689e"
    "2b16be587d47a1fc8ff8b8d17ad031ce45cb3a8f95160428afd7fbcabb4b407e"
)
_P64_1 = 0x9E3779B185EBCA87
_AVALANCHE_P = 0x165667919E3779F9
_MX_P = 0x9FB21C651E98DF25


def _r64(b, i):
    return int.from_bytes(b[i : i + 8], "little")


def _r32(b, i):
    return int.from_bytes(b[i : i + 4], "little")


def _swap32(x):
    return int.from_bytes(x.to_bytes(4, "little"), "big")


def _swap64(x):
    return int.from_bytes(x.to_bytes(8, "little"), "big")


def _xxh64_avalanche(h):
    h &= _M64
    h ^= h >> 33
    h = (h * _X64P2) & _M64
    h ^= h >> 29
    h = (h * _X64P3) & _M64
    h ^= h >> 32
    return h


def _xxh3_avalanche(h):
    h &= _M64
    h ^= h >> 37
    h = (h * _AVALANCHE_P) & _M64
    h ^= h >> 32
    return h


def _rrmxmx(h, n):
    h ^= _rotl64b(h, 49) ^ _rotl64b(h, 24)
    h = (h * _MX_P) & _M64
    h ^= (h >> 35) + n
    h &= _M64
    h = (h * _MX_P) & _M64
    h ^= h >> 28
    return h


def _mul128_fold64(a, b):
    m = a * b
    return ((m & _M64) ^ (m >> 64)) & _M64


def _mix16(data, i, sec, si, seed):
    lo = _r64(data, i) ^ ((_r64(sec, si) + seed) & _M64)
    hi = _r64(data, i + 8) ^ ((_r64(sec, si + 8) - seed) & _M64)
    return _mul128_fold64(lo, hi)


def xxh3_64(data: bytes, seed: int) -> int:
    seed &= _M64
    n = len(data)
    sec = _K_SECRET
    if n == 0:
        return _xxh64_avalanche(
            seed ^ _r64(sec, 56) ^ _r64(sec, 64))
    if n <= 3:
        c1, c2, c3 = data[0], data[n >> 1], data[-1]
        combined = (c1 << 16) | (c2 << 24) | c3 | (n << 8)
        bitflip = ((_r32(sec, 0) ^ _r32(sec, 4)) + seed) & _M64
        return _xxh64_avalanche(combined ^ bitflip)
    if n <= 8:
        s = seed ^ ((_swap32(seed & _M32) << 32) & _M64)
        input1 = _r32(data, 0)
        input2 = _r32(data, n - 4)
        bitflip = ((_r64(sec, 8) ^ _r64(sec, 16)) - s) & _M64
        input64 = (input2 + (input1 << 32)) & _M64
        return _rrmxmx(input64 ^ bitflip, n)
    if n <= 16:
        bf1 = ((_r64(sec, 24) ^ _r64(sec, 32)) + seed) & _M64
        bf2 = ((_r64(sec, 40) ^ _r64(sec, 48)) - seed) & _M64
        lo = _r64(data, 0) ^ bf1
        hi = _r64(data, n - 8) ^ bf2
        acc = (
            n + _swap64(lo) + hi + _mul128_fold64(lo, hi)
        ) & _M64
        return _xxh3_avalanche(acc)
    if n <= 128:
        acc = (n * _P64_1) & _M64
        i, j = 0, n
        rounds = (n - 1) // 32 + 1
        for r in range(rounds - 1, -1, -1):
            off = 16 * r
            acc = (acc + _mix16(data, off, sec, 32 * r, seed)) & _M64
            acc = (
                acc + _mix16(data, n - off - 16, sec, 32 * r + 16, seed)
            ) & _M64
        return _xxh3_avalanche(acc)
    if n <= 240:
        acc = (n * _P64_1) & _M64
        for i in range(8):
            acc = (acc + _mix16(data, 16 * i, sec, 16 * i, seed)) & _M64
        acc = _xxh3_avalanche(acc)
        for i in range(8, n // 16):
            acc = (
                acc + _mix16(data, 16 * i, sec, 16 * (i - 8) + 3, seed)
            ) & _M64
        acc = (acc + _mix16(data, n - 16, sec, 136 - 17, seed)) & _M64
        return _xxh3_avalanche(acc)
    # long path: custom secret when seeded (initCustomSecret: each
    # 16-byte pair gets +seed / -seed)
    if seed:
        cs = bytearray()
        for i in range(0, 192, 16):
            cs += ((_r64(sec, i) + seed) & _M64).to_bytes(8, "little")
            cs += ((_r64(sec, i + 8) - seed) & _M64).to_bytes(8, "little")
        sec = bytes(cs)
    acc = [
        _X32P3, _X64P1, _X64P2, _X64P3, _X64P4, _X32P2, _X64P5, _X32P1,
    ]
    stripes_per_block = (len(sec) - 64) // 8  # 16
    block_len = 64 * stripes_per_block

    def accumulate(acc, data, off, sec, nstripes):
        for s_ in range(nstripes):
            st = off + 64 * s_
            for lane in range(8):
                dv = _r64(data, st + 8 * lane)
                kv = dv ^ _r64(sec, 8 * s_ + 8 * lane)
                acc[lane ^ 1] = (acc[lane ^ 1] + dv) & _M64
                acc[lane] = (
                    acc[lane] + (kv & _M32) * (kv >> 32)
                ) & _M64

    def scramble(acc, sec):
        for lane in range(8):
            a = acc[lane]
            a ^= a >> 47
            a ^= _r64(sec, 192 - 64 + 8 * lane)
            acc[lane] = (a * _X32P1) & _M64

    nb_blocks = (n - 1) // block_len
    for b in range(nb_blocks):
        accumulate(acc, data, b * block_len, sec, stripes_per_block)
        scramble(acc, sec)
    off = nb_blocks * block_len
    nstripes = (n - 1 - off) // 64
    accumulate(acc, data, off, sec, nstripes)
    # last stripe
    st = n - 64
    for lane in range(8):
        dv = _r64(data, st + 8 * lane)
        kv = dv ^ _r64(sec, 192 - 64 - 7 + 8 * lane)
        acc[lane ^ 1] = (acc[lane ^ 1] + dv) & _M64
        acc[lane] = (acc[lane] + (kv & _M32) * (kv >> 32)) & _M64
    # merge
    result = (n * _P64_1) & _M64
    for i in range(4):
        lo = acc[2 * i] ^ _r64(sec, 11 + 16 * i)
        hi = acc[2 * i + 1] ^ _r64(sec, 11 + 16 * i + 8)
        result = (result + _mul128_fold64(lo, hi)) & _M64
    return _xxh3_avalanche(result)


def _xxh_chain(args, variant):
    if args is None:
        return None
    vals = list(args)
    if any(v is None for v in vals):
        return None
    h = 0
    for v in vals:
        b = str(v).encode("utf-8")
        h = xxh32(b, h) if variant == "32" else xxh3_64(b, h)
    return _signed(h, 32 if variant == "32" else 64)


# ----------------------------------------------------------- plumbing

def _fold_key(key: bytes, nbytes: int) -> bytes:
    """MySQL my_aes_create_key: XOR-fold the user key into nbytes."""
    buf = bytearray(nbytes)
    for i, b in enumerate(key):
        buf[i % nbytes] ^= b
    return bytes(buf)


def _pkcs7_pad(data: bytes, bs: int = 16) -> bytes:
    n = bs - (len(data) % bs)
    return data + bytes([n]) * n


def _pkcs7_unpad(data: bytes, bs: int = 16):
    if not data or len(data) % bs:
        return None
    n = data[-1]
    if not (1 <= n <= bs) or data[-n:] != bytes([n]) * n:
        return None
    return data[:-n]


def _gcm_gmul(x: int, y: int) -> int:
    z, v = 0, x
    for i in range(128):
        if (y >> (127 - i)) & 1:
            z ^= v
        if v & 1:
            v = (v >> 1) ^ (0xE1 << 120)
        else:
            v >>= 1
    return z


def _gcm_ghash(h: int, aad: bytes, ct: bytes) -> int:
    y = 0

    def blocks(b):
        for i in range(0, len(b), 16):
            yield int.from_bytes(
                b[i : i + 16].ljust(16, b"\0"), "big")

    for blk in blocks(aad):
        y = _gcm_gmul(y ^ blk, h)
    for blk in blocks(ct):
        y = _gcm_gmul(y ^ blk, h)
    lens = (len(aad) * 8 << 64) | (len(ct) * 8)
    return _gcm_gmul(y ^ lens, h)


def _gcm(op, data, enc, iv12, aad):
    """AES-GCM, MySQL/Doris blob layout iv(12) || ct || tag(16)
    (encryption_util.cpp do_gcm_encrypt)."""
    h = int.from_bytes(enc(b"\0" * 16), "big")
    if op == "dec":
        if len(data) < 12 + 16:
            return None
        iv12, body, tag = data[:12], data[12:-16], data[-16:]
    else:
        body = data
    j0 = iv12 + b"\0\0\0\1"

    def ctr_stream(nbytes):
        out = bytearray()
        ctr = int.from_bytes(j0, "big")
        while len(out) < nbytes:
            ctr = (ctr & ~0xFFFFFFFF) | ((ctr + 1) & 0xFFFFFFFF)
            out += enc(ctr.to_bytes(16, "big"))
        return bytes(out[:nbytes])

    ks = ctr_stream(len(body))
    other = bytes(a ^ b for a, b in zip(body, ks))
    ct = other if op == "enc" else body
    s = _gcm_ghash(h, aad or b"", ct)
    tag_calc = (
        int.from_bytes(enc(j0), "big") ^ s
    ).to_bytes(16, "big")
    if op == "enc":
        return iv12 + other + tag_calc
    return other if tag_calc == tag else None


# ------------------------------------------------------------- SM3
# (GB/T 32905-2016; util/sm3.h — sm3sum concatenates its args like
# md5sum, `sm3` is its alias)

def _sm3_p0(x):
    return x ^ _rotl32(x, 9) ^ _rotl32(x, 17)


def _sm3_p1(x):
    return x ^ _rotl32(x, 15) ^ _rotl32(x, 23)


def sm3_hex(data: bytes) -> str:
    v = [0x7380166F, 0x4914B2B9, 0x172442D7, 0xDA8A0600,
         0xA96F30BC, 0x163138AA, 0xE38DEE4D, 0xB0FB0E4E]
    ln = len(data) * 8
    data = data + b"\x80"
    while len(data) % 64 != 56:
        data += b"\x00"
    data += ln.to_bytes(8, "big")
    for off in range(0, len(data), 64):
        w = [int.from_bytes(data[off + 4 * i : off + 4 * i + 4], "big")
             for i in range(16)]
        for j in range(16, 68):
            w.append(
                _sm3_p1(w[j - 16] ^ w[j - 9] ^ _rotl32(w[j - 3], 15))
                ^ _rotl32(w[j - 13], 7) ^ w[j - 6]
            )
        w2 = [w[j] ^ w[j + 4] for j in range(64)]
        a, b, c, d, e, f, g, h = v
        for j in range(64):
            t = 0x79CC4519 if j < 16 else 0x7A879D8A
            ss1 = _rotl32(
                (_rotl32(a, 12) + e + _rotl32(t, j % 32)) & _M32, 7)
            ss2 = ss1 ^ _rotl32(a, 12)
            if j < 16:
                ff = a ^ b ^ c
                gg = e ^ f ^ g
            else:
                ff = (a & b) | (a & c) | (b & c)
                gg = (e & f) | ((~e) & g)
            tt1 = (ff + d + ss2 + w2[j]) & _M32
            tt2 = (gg + h + ss1 + w[j]) & _M32
            d = c
            c = _rotl32(b, 9)
            b = a
            a = tt1
            h = g
            g = _rotl32(f, 19)
            f = e
            e = _sm3_p0(tt2)
        v = [x ^ y for x, y in zip(v, [a, b, c, d, e, f, g, h])]
    return "".join(f"{x:08x}" for x in v)


_IV_DEFAULT = b"DORISDORISDORIS_"


def _cipher_one(op, payload, key, iv, mode, aad=None):
    if payload is None or key is None or mode is None:
        return None
    m = str(mode).upper().strip()
    import re as _re

    mm = _re.fullmatch(r"(AES|SM4)_(128|192|256)_([A-Z0-9]+)", m)
    if not mm:
        return None
    algo, bits, bmode = mm.group(1), int(mm.group(2)), mm.group(3)
    if algo == "SM4" and bits != 128:
        return None
    kb = bits // 8
    fk = _fold_key(bytes(key), kb)
    if algo == "AES":
        rks = _key_expand(fk)
        enc = lambda b: _enc_block(b, rks)          # noqa: E731
        dec = lambda b: _dec_block(b, rks)          # noqa: E731
    else:
        rks = _sm4_key_expand(fk)
        enc = lambda b: _sm4_crypt_block(b, rks)    # noqa: E731
        dec = lambda b: _sm4_crypt_block(
            b, list(reversed(rks)))                 # noqa: E731
    data = bytes(payload)
    # the IV buffer is "DORISDORISDORIS_" overlaid with the user's
    # bytes (encryption_util.cpp: iv_default) — an absent/short iv
    # falls back to the remaining default bytes
    user_iv = bytes(iv) if iv is not None else b""
    ivb = (user_iv[:16] + _IV_DEFAULT[len(user_iv):])[:16]
    if bmode == "GCM":
        try:
            return _gcm(
                op, data, enc, ivb[:12],
                bytes(aad) if aad is not None else b"")
        except Exception:
            return None
    try:
        if bmode == "ECB":
            if op == "enc":
                d = _pkcs7_pad(data)
                return b"".join(
                    enc(d[i : i + 16]) for i in range(0, len(d), 16))
            blocks = [
                dec(data[i : i + 16]) for i in range(0, len(data), 16)
            ] if (data and len(data) % 16 == 0) else None
            return _pkcs7_unpad(b"".join(blocks)) if blocks else None
        if bmode == "CBC":
            if op == "enc":
                d = _pkcs7_pad(data)
                out, prev = [], ivb
                for i in range(0, len(d), 16):
                    c = enc(bytes(
                        a ^ b for a, b in zip(d[i : i + 16], prev)))
                    out.append(c)
                    prev = c
                return b"".join(out)
            if not data or len(data) % 16:
                return None
            out, prev = [], ivb
            for i in range(0, len(data), 16):
                blk = data[i : i + 16]
                out.append(bytes(
                    a ^ b for a, b in zip(dec(blk), prev)))
                prev = blk
            return _pkcs7_unpad(b"".join(out))
        if bmode in ("CTR", "OFB", "CFB", "CFB128"):
            out = bytearray()
            if bmode == "CTR":
                ctr = int.from_bytes(ivb, "big")
                for i in range(0, len(data), 16):
                    ks = enc(ctr.to_bytes(16, "big"))
                    ctr = (ctr + 1) % (1 << 128)
                    chunk = data[i : i + 16]
                    out += bytes(a ^ b for a, b in zip(chunk, ks))
            elif bmode == "OFB":
                state = ivb
                for i in range(0, len(data), 16):
                    state = enc(state)
                    chunk = data[i : i + 16]
                    out += bytes(a ^ b for a, b in zip(chunk, state))
            else:  # CFB128
                state = ivb
                for i in range(0, len(data), 16):
                    ks = enc(state)
                    chunk = data[i : i + 16]
                    cb = bytes(a ^ b for a, b in zip(chunk, ks))
                    out += cb
                    state = (cb if op == "enc" else chunk) + state[
                        len(chunk):]
                    state = state[:16]
            return bytes(out)
    except Exception:
        return None
    return None


def register(spark) -> int:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    globals()["pd"] = pd  # type-hint resolution for the pandas_udf

    def _cipher(op: pd.Series, payload: pd.Series, key: pd.Series,
                iv: pd.Series, mode: pd.Series,
                aad: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _cipher_one(o, p, k, v, m, a)
                for o, p, k, v, m, a in zip(
                    op, payload, key, iv, mode, aad)
            ],
            dtype=object,
        )

    spark.udf.register("__doris_cipher", pandas_udf(_cipher, "binary"))

    def _sm3(arr: pd.Series) -> pd.Series:
        def one(a):
            if a is None or any(v is None for v in a):
                return None
            return sm3_hex("".join(str(v) for v in a).encode("utf-8"))

        return pd.Series([one(a) for a in arr], dtype=object)

    spark.udf.register("__sm3", pandas_udf(_sm3, "string"))

    def _mk(variant, ret):
        def k(arr: pd.Series) -> pd.Series:
            return pd.Series(
                [_mmh3_chain(a, variant) for a in arr], dtype=object
            )

        return pandas_udf(k, ret)

    spark.udf.register("__mmh3_32", _mk("32", "int"))
    spark.udf.register("__mmh3_64", _mk("64", "bigint"))
    spark.udf.register("__mmh3_64_v2", _mk("64_v2", "bigint"))
    spark.udf.register("__mmh3_u64_v2", _mk("u64_v2", "string"))
    spark.udf.register("__mmh3_128", _mk("128", "string"))
    spark.udf.register("__mmh3_u128", _mk("u128", "string"))

    def _mkx(variant, ret):
        def k(arr: pd.Series) -> pd.Series:
            return pd.Series(
                [_xxh_chain(a, variant) for a in arr], dtype=object
            )

        return pandas_udf(k, ret)

    spark.udf.register("__xxh_32", _mkx("32", "int"))
    spark.udf.register("__xxh_64", _mkx("64", "bigint"))
    return 9
