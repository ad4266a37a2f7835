"""Python-UDF tier of the Doris scalar surface — names whose semantics
cannot be expressed as Catalyst SQL expressions.

Reference: be/src/exprs/function/function_ip.cpp (IPv6 family),
function_string.cpp (unicode_normalize/convert_to/binary helpers),
hash_util (murmur3/xxhash), function_json.cpp (json_contains,
normalize_json_numbers_to_double), function_compress.cpp.

These are registered as vectorized pandas UDFs (Arrow-batched), so they
sit outside whole-stage codegen but avoid per-row Python overhead. They
are the slow path by design: every hot-path function lives in
registry.py / registry_ext.py as a pure SQL expression. At 100 TB these
names are row-parallel scalar maps — they scale linearly with executors
and carry no shuffle.

Hash-kernel notes:
- murmur_hash3_64 is MurmurHash3 x64_128 (seed 0) truncated to the low
  64 bits, matching the reference's murmur_hash3_64 wire behavior;
  _v2/u64 variants alias it (documented divergence on seed).
- xxhash_32 is the reference XXH32 algorithm (seed 0), pure python.
"""

from __future__ import annotations

import ipaddress
import json
import re
import secrets
import time
import unicodedata
import uuid as _uuid
import zlib

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

_M = (1 << 64) - 1


def _murmur3_x64_128_low64(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x64_128, low 64 bits (Austin Appleby's public domain
    algorithm, re-derived from the published reference)."""
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = seed
    length = len(data)
    rounds = length // 16

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & _M

    def fmix(k: int) -> int:
        k ^= k >> 33
        k = (k * 0xFF51AFD7ED558CCD) & _M
        k ^= k >> 33
        k = (k * 0xC4CEB9FE1A85EC53) & _M
        k ^= k >> 33
        return k

    for i in range(rounds):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (k1 * c1) & _M
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & _M
        h1 ^= k1
        h1 = rotl(h1, 27)
        h1 = (h1 + h2) & _M
        h1 = (h1 * 5 + 0x52DCE729) & _M
        k2 = (k2 * c2) & _M
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & _M
        h2 ^= k2
        h2 = rotl(h2, 31)
        h2 = (h2 + h1) & _M
        h2 = (h2 * 5 + 0x38495AB5) & _M

    tail = data[rounds * 16 :]
    k1 = k2 = 0
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * c2) & _M
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & _M
        h2 ^= k2
    if tail:
        k1 = int.from_bytes(tail[:8], "little")
        k1 = (k1 * c1) & _M
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & _M
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & _M
    return h1


def _xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 (Yann Collet's published algorithm), pure python."""
    p1, p2, p3, p4, p5 = 2654435761, 2246822519, 3266489917, 668265263, 374761393
    mask = 0xFFFFFFFF

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & mask

    n = len(data)
    idx = 0
    if n >= 16:
        v1 = (seed + p1 + p2) & mask
        v2 = (seed + p2) & mask
        v3 = seed & mask
        v4 = (seed - p1) & mask
        while idx <= n - 16:
            for vi in range(4):
                lane = int.from_bytes(data[idx : idx + 4], "little")
                if vi == 0:
                    v1 = (rotl((v1 + lane * p2) & mask, 13) * p1) & mask
                elif vi == 1:
                    v2 = (rotl((v2 + lane * p2) & mask, 13) * p1) & mask
                elif vi == 2:
                    v3 = (rotl((v3 + lane * p2) & mask, 13) * p1) & mask
                else:
                    v4 = (rotl((v4 + lane * p2) & mask, 13) * p1) & mask
                idx += 4
        acc = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & mask
    else:
        acc = (seed + p5) & mask
    acc = (acc + n) & mask
    while idx <= n - 4:
        lane = int.from_bytes(data[idx : idx + 4], "little")
        acc = (rotl((acc + lane * p3) & mask, 17) * p4) & mask
        idx += 4
    while idx < n:
        acc = (rotl((acc + data[idx] * p5) & mask, 11) * p1) & mask
        idx += 1
    acc ^= acc >> 15
    acc = (acc * p2) & mask
    acc ^= acc >> 13
    acc = (acc * p3) & mask
    acc ^= acc >> 16
    return acc


def _ip6(s):
    try:
        return ipaddress.IPv6Address(s)
    except (ValueError, TypeError):
        return None


def _ip_any(s):
    try:
        return ipaddress.ip_address(s)
    except (ValueError, TypeError):
        return None


def _json_contains(target, candidate) -> bool:
    """MySQL JSON_CONTAINS semantics (function_json.cpp json_contains)."""
    if isinstance(target, dict) and isinstance(candidate, dict):
        return all(k in target and _json_contains(target[k], v) for k, v in candidate.items())
    if isinstance(target, list):
        if isinstance(candidate, list):
            return all(any(_json_contains(t, c) for t in target) for c in candidate)
        return any(_json_contains(t, candidate) for t in target)
    if isinstance(target, bool) or isinstance(candidate, bool):
        return target is candidate
    if isinstance(target, (int, float)) and isinstance(candidate, (int, float)):
        return float(target) == float(candidate)
    return target == candidate


def _norm_numbers(x):
    if isinstance(x, dict):
        return {k: _norm_numbers(v) for k, v in x.items()}
    if isinstance(x, list):
        return [_norm_numbers(v) for v in x]
    if isinstance(x, bool):
        return x
    if isinstance(x, (int, float)):
        return float(x)
    return x


# ---- MySQL %-pattern datetime kernel (function_date_or_datetime_*.cpp,
#      str_to_date / date_format / time_format semantics). Rendering is
#      done manually token-by-token (no platform strftime extensions);
#      parsing translates to Python strptime directives, which accept
#      non-zero-padded fields and support week-based years (%U/%V/%G).

_STRPTIME_MAP = {
    "a": "%a", "b": "%b", "c": "%m", "d": "%d", "e": "%d", "f": "%f",
    "H": "%H", "h": "%I", "I": "%I", "i": "%M", "j": "%j", "k": "%H",
    "l": "%I", "M": "%B", "m": "%m", "p": "%p", "r": "%I:%M:%S %p",
    "S": "%S", "s": "%S", "T": "%H:%M:%S", "U": "%U", "u": "%W",
    "V": "%U", "v": "%V", "W": "%A", "w": "%w", "X": "%Y", "x": "%G",
    "Y": "%Y", "y": "%y", "%": "%%",
}


def _mysql_to_strptime(fmt: str) -> str:
    out, i = [], 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = _STRPTIME_MAP.get(fmt[i + 1])
            if tok is not None:
                out.append(tok)
                i += 2
                continue
            out.append(fmt[i + 1])
            i += 2
            continue
        out.append(fmt[i])
        i += 1
    return "".join(out)


# tokens that carry date (vs pure time-of-day) information: a MySQL parse
# with no date part yields a TIME in MySQL but NULL DATETIME in Doris
_DATE_TOKENS = set("YyXxVvUuMmbDdejWaw")


def _mysql_strptime_one(s, fmt):
    import datetime as _dt
    import re as _r

    if _isnull(s) or _isnull(fmt):
        return None
    fmt = str(fmt)
    if not any(t in _DATE_TOKENS for t in _r.findall(r"%(.)", fmt)):
        return None
    text = str(s).strip()
    pat = _mysql_to_strptime(fmt)
    try:
        return _dt.datetime.strptime(text, pat)
    except (ValueError, TypeError) as e:
        # MySQL permits trailing garbage after a successful prefix parse
        m = _r.search(r"unconverted data remains: (.*)$", str(e), _r.S)
        if m:
            try:
                return _dt.datetime.strptime(text[: len(text) - len(m.group(1))], pat)
            except (ValueError, TypeError):
                return None
        return None


def _ordinal(n: int) -> str:
    if 11 <= n % 100 <= 13:
        return f"{n}th"
    return f"{n}{ {1: 'st', 2: 'nd', 3: 'rd'}.get(n % 10, 'th') }"


def _isnull(v) -> bool:
    if v is None:
        return True
    try:
        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return False


def _mysql_strftime_one(t, fmt):
    if _isnull(t) or _isnull(fmt):
        return None
    if isinstance(t, str):
        # call sites pass CAST(ts AS STRING): Arrow timestamp[ns] tops
        # out at 2262-04-11, so a year-9999 Doris datetime must cross
        # the Arrow boundary as text (python datetime goes to 9999)
        import datetime as _dt

        try:
            t = _dt.datetime.fromisoformat(t)
        except ValueError:
            return None
    d = t
    iso_y, iso_w, _ = d.isocalendar()
    sunday_w = int(d.strftime("%U"))

    def mode2():  # %V/%X: Sunday-based, weeks 1..53 rolling into prior year
        if sunday_w > 0:
            return d.year, sunday_w
        import datetime as _dt

        prev = _dt.date(d.year - 1, 12, 31)
        return prev.year, int(prev.strftime("%U"))

    out, i = [], 0
    while i < len(fmt):
        c = fmt[i]
        if c != "%" or i + 1 >= len(fmt):
            out.append(c)
            i += 1
            continue
        t2 = fmt[i + 1]
        i += 2
        if t2 == "a":
            out.append(d.strftime("%a"))
        elif t2 == "b":
            out.append(d.strftime("%b"))
        elif t2 == "c":
            out.append(str(d.month))
        elif t2 == "D":
            out.append(_ordinal(d.day))
        elif t2 == "d":
            out.append(f"{d.day:02d}")
        elif t2 == "e":
            out.append(str(d.day))
        elif t2 == "f":
            out.append(f"{d.microsecond:06d}")
        elif t2 == "H":
            out.append(f"{d.hour:02d}")
        elif t2 in ("h", "I"):
            out.append(f"{(d.hour % 12) or 12:02d}")
        elif t2 == "i":
            out.append(f"{d.minute:02d}")
        elif t2 == "j":
            out.append(d.strftime("%j"))
        elif t2 == "k":
            out.append(str(d.hour))
        elif t2 == "l":
            out.append(str((d.hour % 12) or 12))
        elif t2 == "M":
            out.append(d.strftime("%B"))
        elif t2 == "m":
            out.append(f"{d.month:02d}")
        elif t2 == "p":
            out.append("AM" if d.hour < 12 else "PM")
        elif t2 == "r":
            out.append(
                f"{(d.hour % 12) or 12:02d}:{d.minute:02d}:{d.second:02d} "
                + ("AM" if d.hour < 12 else "PM")
            )
        elif t2 in ("S", "s"):
            out.append(f"{d.second:02d}")
        elif t2 == "T":
            out.append(f"{d.hour:02d}:{d.minute:02d}:{d.second:02d}")
        elif t2 == "U":
            out.append(f"{sunday_w:02d}")
        elif t2 == "u":
            out.append(d.strftime("%W"))
        elif t2 == "V":
            out.append(f"{mode2()[1]:02d}")
        elif t2 == "v":
            out.append(f"{iso_w:02d}")
        elif t2 == "W":
            out.append(d.strftime("%A"))
        elif t2 == "w":
            out.append(str((d.weekday() + 1) % 7))
        elif t2 == "X":
            out.append(f"{mode2()[0]:04d}")
        elif t2 == "x":
            out.append(f"{iso_y:04d}")
        elif t2 == "Y":
            out.append(f"{d.year:04d}")
        elif t2 == "y":
            out.append(f"{d.year % 100:02d}")
        elif t2 == "%":
            out.append("%")
        else:
            out.append(t2)
    return "".join(out)


def _mysql_week_one(d, mode) -> int | None:
    """MySQL WEEK(date, mode) — the documented 8-mode table (modes 0-7;
    negative/overflow modes reduce mod 8). Pure calendar math, session-tz
    independent (operates on the already-localized datetime value)."""
    if _isnull(d) or _isnull(mode):
        return None
    import datetime as _dt

    mode = int(mode) & 7
    monday_first = bool(mode & 1)
    week_year = bool(mode & 2)
    first_weekday = bool(mode & 4)
    if not monday_first:
        first_weekday = not first_weekday

    def week_of(dd: _dt.date) -> int:
        jan1 = _dt.date(dd.year, 1, 1)
        # weekday of Jan 1 with 0 = the week's first day
        wd = jan1.weekday() if monday_first else (jan1.weekday() + 1) % 7
        yday = (dd - jan1).days  # 0-based
        if first_weekday:
            # week 1 = first FULL week (starts on the week's first day)
            days_before = 0 if wd == 0 else 7 - wd
        else:
            # week 1 = the week holding >= 4 days of this year
            days_before = -wd if wd <= 3 else 7 - wd
        if yday < days_before:
            return 0
        return (yday - days_before) // 7 + 1

    if hasattr(d, "date"):
        d = d.date()
    w = week_of(d)
    if w == 0 and week_year:
        return week_of(_dt.date(d.year - 1, 12, 31))
    return w


_TIME_RE = None


def _parse_time_str(s):
    """Doris TIME domain: [-838:59:59, 838:59:59], optional fraction.
    Datetime-shaped strings are NOT valid TIME input (Doris yields NULL)."""
    global _TIME_RE
    import re as _r

    if _TIME_RE is None:
        _TIME_RE = _r.compile(r"^(-)?(\d{1,3}):(\d{1,2})(?::(\d{1,2}))?(\.\d+)?$")
    txt = str(s).strip()
    m = _TIME_RE.match(txt)
    if not m:
        # MySQL TIME() of a datetime string takes the time-of-day part
        dm = _r.match(
            r"^\d{4}-\d{1,2}-\d{1,2}[ T](\d{1,2}):(\d{1,2}):(\d{1,2})(\.\d+)?$", txt
        )
        if dm and int(dm.group(1)) < 24:
            h, mi, sec, frac = dm.groups()
            if int(mi) > 59 or int(sec) > 59:
                return None
            return 1, int(h), int(mi), int(sec), int(
                round(float(frac or 0) * 1_000_000)
            )
        # digit-only text packs as [±]HHMMSS ('400' -> 00:04:00)
        return _parse_time_packed(txt)
    neg, h, mi, sec, frac = m.groups()
    h, mi, sec = int(h), int(mi), int(sec or 0)
    if h > 838 or mi > 59 or sec > 59:
        return None
    micros = int(round(float(frac or 0) * 1_000_000))
    # MySQL TIME range tops at 838:59:59.000000 — any fraction at the
    # boundary overflows (838:59:59.999999 -> NULL)
    if h == 838 and mi == 59 and sec == 59 and micros > 0:
        return None
    return (-1 if neg else 1), h, mi, sec, micros


def _parse_time_packed(s):
    """MySQL/Doris numeric->TIME: the digits read as [±]HHMMSS
    (cast(300 as time) = 00:03:00, cast(-121314 as time) = -12:13:14).
    Also accepted for digit-only strings ('400' -> 00:04:00)."""
    import re as _r

    m = _r.match(r"^(-)?(\d+)(\.\d+)?$", str(s).strip())
    if not m:
        return None
    neg, digits, frac = m.groups()
    v = int(digits)
    sec, v = v % 100, v // 100
    mi, h = v % 100, v // 100
    if mi > 59 or sec > 59 or h > 838:
        return None
    micros = int(round(float(frac or 0) * 1_000_000))
    if h == 838 and mi == 59 and sec == 59 and micros > 0:
        return None
    return (-1 if neg else 1), h, mi, sec, micros


def _mysql_timefmt_one(t, fmt):
    """TIME_FORMAT: date-valued tokens render as zeros; name/ordinal/week
    tokens have no TIME meaning and NULL the whole result (MySQL/Doris)."""
    if _isnull(t) or _isnull(fmt):
        return None
    parsed = _parse_time_str(t)
    if parsed is None:
        return None
    sign, h, mi, sec, micros = parsed
    out, i = [], 0
    fmt = str(fmt)
    while i < len(fmt):
        c = fmt[i]
        if c != "%" or i + 1 >= len(fmt):
            out.append(c)
            i += 1
            continue
        t2 = fmt[i + 1]
        i += 2
        if t2 == "H":
            out.append(f"{h:02d}")
        elif t2 == "k":
            out.append(str(h))
        elif t2 in ("h", "I"):
            out.append(f"{(h % 12) or 12:02d}")
        elif t2 == "l":
            out.append(str((h % 12) or 12))
        elif t2 == "i":
            out.append(f"{mi:02d}")
        elif t2 in ("S", "s"):
            out.append(f"{sec:02d}")
        elif t2 == "f":
            out.append(f"{micros:06d}")
        elif t2 == "p":
            out.append("AM" if (h % 24) < 12 else "PM")
        elif t2 == "r":
            out.append(
                f"{(h % 12) or 12:02d}:{mi:02d}:{sec:02d} "
                + ("AM" if (h % 24) < 12 else "PM")
            )
        elif t2 == "T":
            out.append(f"{h:02d}:{mi:02d}:{sec:02d}")
        elif t2 == "Y":
            out.append("0000")
        elif t2 == "y":
            out.append("00")
        elif t2 in ("m", "d"):
            out.append("00")
        elif t2 in ("c", "e"):
            out.append("0")
        elif t2 == "%":
            out.append("%")
        elif t2 in "abDjMUuVvWwXx":
            return None  # no TIME rendering exists for these
        else:
            out.append(t2)
    return ("-" if sign < 0 else "") + "".join(out)


def _jsonpath_tokens(path: str):
    """Tokenize a Doris/MySQL JSON path: $, .key, .*, [i], [*], [last],
    leading-dot index (.[i]), and recursive descent **.key."""
    import re as _r

    p = path.strip()
    if not p.startswith("$"):
        return None
    p = p[1:]
    toks = []
    i = 0
    while i < len(p):
        c = p[i]
        if c == ".":
            if p[i : i + 2] == ".[":  # $.[1] — dotted index
                i += 1
                continue
            # quoted member: $."a.b.c" (dots inside the quotes are part
            # of the key — jsonb_document.h parse_member quoted leg)
            m = _r.match(r'\."((?:[^"\\]|\\.)*)"', p[i:])
            if m:
                toks.append(("key", m.group(1).replace('\\"', '"')))
                i += m.end()
                continue
            m = _r.match(r"\.(\*|\*\*|[^.\[\]*]+)", p[i:])
            if not m:
                return None
            toks.append(("key", m.group(1)))
            i += m.end()
        elif c == "[":
            # index forms: [i], [-i], [*], [last], [last-N]
            # (jsonb_document.h: last-N encodes as -N-1, i.e. Nth from end)
            m = _r.match(r"\[\s*(\*|-?\d+|last(?:\s*-\s*\d+)?)\s*\]", p[i:], _r.I)
            if not m:
                return None
            toks.append(("idx", _r.sub(r"\s+", "", m.group(1).lower())))
            i += m.end()
        elif c == "*" and p[i : i + 2] == "**":
            # '$**.k' (no leading dot)
            toks.append(("key", "**"))
            i += 2
        else:
            return None
    return toks


def _jsonpath_match(doc, toks) -> list:
    if toks is None:
        return []
    if not toks:
        return [doc]
    kind, val = toks[0]
    rest = toks[1:]
    out = []
    if kind == "key":
        if val == "**":
            # recursive descent: next token must be a key to collect
            if not rest or rest[0][0] != "key":
                return []
            want = rest[0][1]
            after = rest[1:]

            def walk(node):
                if isinstance(node, dict):
                    for k, v in node.items():
                        if k == want:
                            out.extend(_jsonpath_match(v, after))
                        walk(v)
                elif isinstance(node, list):
                    for v in node:
                        walk(v)

            walk(doc)
            return out
        if val == "*":
            if isinstance(doc, dict):
                for v in doc.values():
                    out.extend(_jsonpath_match(v, rest))
            return out
        if isinstance(doc, dict) and val in doc:
            return _jsonpath_match(doc[val], rest)
        return []
    # index
    if not isinstance(doc, list):
        # MySQL: $[0] on a scalar selects the scalar itself
        if val in ("0", "last", "*"):
            return _jsonpath_match(doc, rest)
        return []
    if val == "*":
        for v in doc:
            out.extend(_jsonpath_match(v, rest))
        return out
    if val.startswith("last"):
        off = int(val[5:]) if len(val) > 4 else 0  # 'last-N'
        idx = len(doc) - 1 - off
        if idx < 0:
            return []
    else:
        idx = int(val)
    if -len(doc) <= idx < len(doc):
        return _jsonpath_match(doc[idx], rest)
    return []


def _jsonb_scalar_one(j, p, mode):
    """Typed jsonb extraction family (util/jsonb_document.h path walk +
    function_jsonb.cpp coercions): returns a STRING rendering the SQL
    wrapper casts to the target type. Modes: string/int/double/bool/
    isnull/exists/type."""
    if _isnull(j) or _isnull(p):
        return None
    try:
        doc = json.loads(str(j))
    except (ValueError, TypeError):
        return None
    toks = _jsonpath_tokens(str(p))
    if toks is None:
        return None
    ms = _jsonpath_match(doc, toks)
    if mode == "exists":
        return "true" if ms else "false"
    if not ms:
        return None
    v = ms[0]
    if mode == "isnull":
        return "1" if v is None else "0"
    if mode == "type":
        if v is None:
            return "null"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, str):
            return "string"
        if isinstance(v, int):
            a = abs(v)
            if a <= 2147483647:
                return "int"
            if a <= 9223372036854775807:
                return "bigint"
            return "largeint"
        if isinstance(v, float):
            return "double"
        return "object" if isinstance(v, dict) else "array"
    if v is None:
        return None
    if mode == "string":
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, str):
            return v
        if isinstance(v, (dict, list)):
            return json.dumps(v, separators=(",", ":"), ensure_ascii=False)
        return repr(v) if isinstance(v, float) else str(v)
    if mode == "int":
        if isinstance(v, bool):
            return "1" if v else "0"
        return str(v) if isinstance(v, int) else None
    if mode == "double":
        if isinstance(v, bool):
            return "1" if v else "0"
        return repr(float(v)) if isinstance(v, (int, float)) else None
    if mode == "bool":
        if isinstance(v, bool):
            return "true" if v else "false"
        return None
    return None


def _json_extract_multi_one(j, paths_packed):
    """Doris json_extract: one path without wildcards -> that value as
    JSON text (NULL on miss); otherwise every match across all paths in
    order, as a JSON array (NULL when nothing matched). A NULL path
    argument (encoded as the __NULL__ sentinel) nulls the whole result."""
    if _isnull(j) or _isnull(paths_packed):
        return None
    try:
        doc = json.loads(str(j))
    except (ValueError, TypeError):
        return None
    # registry_ext.OMIT is "\x01__OMIT__" (control-char-prefixed so user
    # strings can't collide); match by suffix to avoid a module cycle
    all_parts = str(paths_packed).split("\x1f")
    if any(p.endswith("__NULL__") for p in all_parts):
        return None
    paths = [p for p in all_parts if not p.endswith("__OMIT__")]
    wildcarded = any("*" in p for p in paths)
    matches = []
    for p in paths:
        matches.extend(_jsonpath_match(doc, _jsonpath_tokens(p)))
    if not matches:
        return None
    if len(paths) == 1 and not wildcarded:
        return json.dumps(matches[0], separators=(",", ":"), ensure_ascii=False)
    return json.dumps(matches, separators=(",", ":"), ensure_ascii=False)


def register_math_kernels(spark: SparkSession) -> int:
    """Exact-math kernels SQL-UDF bodies reference at CREATE time:
    __normal_cdf (math.erfc — exact where the A&S polynomial missed the
    7th digit) and __doris_round_dyn (decimal-exact round/floor/ceil/
    truncate with a NON-FOLDABLE or precision-critical scale — Spark
    requires a foldable scale; Doris accepts columns:
    math_functions/test_round.groovy floor_dec9...round_dec128)."""
    import math

    def _ncdf(mu: pd.Series, sigma: pd.Series, x: pd.Series) -> pd.Series:
        def one(m, s, v):
            if m is None or s is None or v is None or s <= 0:
                return None
            return 0.5 * math.erfc(-(v - m) / (s * math.sqrt(2.0)))

        return pd.Series(
            [one(m, s, v) for m, s, v in zip(mu, sigma, x)],
            dtype="float64",
        )

    spark.udf.register("__normal_cdf", pandas_udf(_ncdf, "double"))

    def _round_dyn_one(s, d, mode, t):
        if s is None or d is None:
            return None
        import re as _re
        from decimal import (
            ROUND_CEILING,
            ROUND_DOWN,
            ROUND_FLOOR,
            ROUND_HALF_UP,
            Decimal,
            localcontext,
        )

        try:
            v = Decimal(str(s))
            # bound the scale so a degenerate runtime value can't build
            # a 10^huge quantizer (hang/OOM); |d|>100 saturates anyway
            d = max(min(int(d), 100), -100)
            rnd = {
                "round": ROUND_HALF_UP,
                "floor": ROUND_FLOOR,
                "ceil": ROUND_CEILING,
                "truncate": ROUND_DOWN,
            }[mode]
            with localcontext() as ctx:
                ctx.prec = 60
                r = v.quantize(Decimal(1).scaleb(-int(d)), rounding=rnd)
                m = _re.fullmatch(r"decimal\((\d+),(\d+)\)", t or "")
                if m:
                    # Doris keeps the INPUT's decimal scale when the
                    # target scale isn't a literal
                    r = r.quantize(Decimal(1).scaleb(-int(m.group(2))))
                    return format(r, "f")
            if (t or "") in ("double", "float"):
                return repr(float(r))
            return format(r, "f")
        except Exception:
            return None

    def _round_dyn(s: pd.Series, d: pd.Series, mode: pd.Series,
                   t: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _round_dyn_one(a, b, c, e)
                for a, b, c, e in zip(s, d, mode, t)
            ],
            dtype=object,
        )

    spark.udf.register("__doris_round_dyn", pandas_udf(_round_dyn, "string"))

    def _yearweek_one(s, mode):
        """MySQL YEARWEEK(d, mode): the WEEK mode table with the year
        rolling over in BOTH directions (early-January dates can belong
        to the previous year's week 52/53, late-December dates to the
        next year's week 1) — datetime_functions/test_time_lut.groovy
        modes 2/4/6/7."""
        if s is None or mode is None:
            return None
        import datetime as _dt

        try:
            d = _dt.datetime.fromisoformat(str(s)).date()
            mode = int(mode) & 7
        except (ValueError, OverflowError):
            return None
        monday_first = bool(mode & 1)
        full_week = bool(mode & 4)
        if not monday_first:
            full_week = not full_week

        def wk1_start(year):
            jan1 = _dt.date(year, 1, 1)
            wd = (jan1.weekday() if monday_first
                  else (jan1.weekday() + 1) % 7)
            if full_week:
                days_before = 0 if wd == 0 else 7 - wd
            else:
                days_before = -wd if wd <= 3 else 7 - wd
            return jan1 + _dt.timedelta(days=days_before)

        start = wk1_start(d.year)
        if d < start:
            year = d.year - 1
            start = wk1_start(year)
        elif d.year < 9999 and d >= wk1_start(d.year + 1):
            year = d.year + 1
            start = wk1_start(year)
        else:
            year = d.year
        return year * 100 + (d - start).days // 7 + 1

    def _yearweek(s: pd.Series, mode: pd.Series) -> pd.Series:
        return pd.Series(
            [_yearweek_one(a, b) for a, b in zip(s, mode)],
            dtype=object,
        )

    spark.udf.register("__yearweek", pandas_udf(_yearweek, "int"))

    def _initcap(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            out, prev_alnum = [], False
            for i, ch in enumerate(v):
                if ch.isalpha():
                    if prev_alnum:
                        # context-aware lower: Greek capital sigma at a
                        # word end becomes FINAL sigma (ς), which a
                        # per-char .lower() misses
                        if ch == "Σ" and (
                            i + 1 >= len(v) or not v[i + 1].isalpha()
                        ):
                            out.append("ς")
                        else:
                            out.append(ch.lower())
                    else:
                        out.append(ch.upper())
                else:
                    out.append(ch)
                prev_alnum = ch.isalnum()
            return "".join(out)

        return pd.Series([one(v) for v in s], dtype=object)

    spark.udf.register("__doris_initcap", pandas_udf(_initcap, "string"))

    def _split_part(s: pd.Series, sep: pd.Series,
                    n: pd.Series) -> pd.Series:
        def one(v, d, i):
            if v is None or d is None or i is None or i == 0 or d == "":
                return None
            if d not in v:
                # Doris returns NULL when the separator never occurs
                # (scalar_function/S.groovy split_part goldens)
                return None
            parts = v.split(d) if i > 0 else v.rsplit(d)
            i = i if i > 0 else len(parts) + i + 1
            if not 1 <= i <= len(parts):
                return None
            return parts[i - 1]

        return pd.Series(
            [one(v, d, i) for v, d, i in zip(s, sep, n)], dtype=object)

    spark.udf.register("__split_part", pandas_udf(_split_part, "string"))

    # ---- string<->int codec (function_encode_varchar.cpp): reversed
    #      string bytes in the int's high bytes, (len<<1) in the low
    #      byte, the whole value arithmetic-shifted right once with the
    #      sign bit cleared
    def _encode_varchar_one(s, nbytes):
        if s is None:
            return None
        b = str(s).encode("utf-8")
        if len(b) > nbytes - 1:
            return None
        mem = bytearray(nbytes)
        if b:
            mem[nbytes - len(b):] = bytes(reversed(b))
        mem[0] = (len(b) << 1) & 0xFF
        u = int.from_bytes(mem, "little")
        return str((u >> 1) & ((1 << (8 * nbytes - 1)) - 1))

    def _enc_vc(s: pd.Series, n: pd.Series) -> pd.Series:
        return pd.Series(
            [_encode_varchar_one(a, b) for a, b in zip(s, n)],
            dtype=object,
        )

    spark.udf.register("__encode_varchar", pandas_udf(_enc_vc, "string"))

    def _decode_varchar_one(v, t):
        if v is None:
            return None
        t = (t or "").lower()
        nbytes = (2 if t == "smallint" else 4 if t == "int"
                  else 8 if t == "bigint" else 16)
        u = (int(str(v)) << 1) & ((1 << (8 * nbytes)) - 1)
        ln = (u & 0xFF) >> 1 & 0x7F
        if ln >= nbytes:
            return None
        mem = u.to_bytes(nbytes, "little")
        try:
            return bytes(reversed(mem[nbytes - ln:])).decode("utf-8")
        except UnicodeDecodeError:
            return None

    def _dec_vc(v: pd.Series, t: pd.Series) -> pd.Series:
        return pd.Series(
            [_decode_varchar_one(a, b) for a, b in zip(v, t)],
            dtype=object,
        )

    spark.udf.register("__decode_varchar", pandas_udf(_dec_vc, "string"))

    # ---- format_number humanizer (function_format.cpp: /1000 steps,
    #      units K/M/B/T/Q, 2/1/0 decimals by magnitude)
    def _fmt_number_one(x):
        if x is None:
            return None
        import math

        if not math.isfinite(x):
            return "inf" if x > 0 else ("-inf" if x < 0 else "nan")
        units = ["", "K", "M", "B", "T", "Q"]
        a, i = abs(x), 0
        while a >= 1000 and i < 5:
            a /= 1000
            i += 1
        sign = "-" if x < 0 else ""
        if a == 1:
            body = "1"
        elif a < 10:
            body = f"{a:.2f}"
        elif a < 100:
            body = f"{a:.1f}"
        else:
            body = f"{a:.0f}"
        return sign + body + units[i]

    def _fmt_number(x: pd.Series) -> pd.Series:
        return pd.Series([_fmt_number_one(v) for v in x], dtype=object)

    spark.udf.register(
        "__format_number_human", pandas_udf(_fmt_number, "string"))

    # ---- DECIMAL256 shadow render: exact text -> Doris's fixed-scale
    #      decimal form ('-001234.5', scale 6 -> '-1234.500000')
    def _dec256_norm_one(s, scale):
        if s is None or scale is None:
            return None
        from decimal import Decimal, localcontext

        try:
            with localcontext() as ctx:
                ctx.prec = 100
                v = Decimal(str(s)).quantize(
                    Decimal(1).scaleb(-int(scale)))
            return format(v, "f")
        except Exception:
            return None

    def _dec256_norm(s: pd.Series, scale: pd.Series) -> pd.Series:
        return pd.Series(
            [_dec256_norm_one(a, b) for a, b in zip(s, scale)],
            dtype=object,
        )

    spark.udf.register("__dec256_norm", pandas_udf(_dec256_norm, "string"))
    return 10


def register_mysql_datetime(spark: SparkSession) -> int:
    """__mysql_strptime/__mysql_strftime/__mysql_week helpers — must be
    installed before any SQL UDF whose body references them (str_to_date,
    time_format, week): CREATE FUNCTION analyzes the body eagerly.

    __mysql_strptime returns an ISO STRING, not a timestamp: a naive
    datetime handed back through Arrow would be re-keyed by the Python
    worker's zone, which need not match the session zone. The SQL wrapper
    casts JVM-side, which always follows the session timezone."""

    def _strptime(s: pd.Series, fmt: pd.Series) -> pd.Series:
        def iso(a, b):
            v = _mysql_strptime_one(a, b)
            return None if v is None else v.strftime("%Y-%m-%d %H:%M:%S.%f")

        return pd.Series([iso(a, b) for a, b in zip(s, fmt)], dtype=object)

    def _strftime(t: pd.Series, fmt: pd.Series) -> pd.Series:
        return pd.Series(
            [_mysql_strftime_one(a, b) for a, b in zip(t, fmt)], dtype=object
        )

    def _week(t: pd.Series, mode: pd.Series) -> pd.Series:
        return pd.Series(
            [_mysql_week_one(a, b) for a, b in zip(t, mode)], dtype=object
        )

    from doris_spark.functions.locale_names import LOCALE_NAMES

    def _name_lookup(kind: str):
        def look(t: pd.Series, loc: pd.Series) -> pd.Series:
            def one(d, lc):
                if _isnull(d):
                    return None
                tab = LOCALE_NAMES.get((lc or "en_us").lower())
                if tab is None:
                    tab = LOCALE_NAMES["en_us"]
                if kind == "days":
                    return tab["days"][d.weekday()]
                return tab["months"][d.month - 1]

            return pd.Series([one(a, b) for a, b in zip(t, loc)], dtype=object)

        return look

    def _timefmt(t: pd.Series, fmt: pd.Series) -> pd.Series:
        return pd.Series(
            [_mysql_timefmt_one(a, b) for a, b in zip(t, fmt)], dtype=object
        )

    def _jext(j: pd.Series, paths: pd.Series) -> pd.Series:
        return pd.Series(
            [_json_extract_multi_one(a, b) for a, b in zip(j, paths)], dtype=object
        )

    def _jbext(j: pd.Series, p: pd.Series, mode: pd.Series) -> pd.Series:
        return pd.Series(
            [_jsonb_scalar_one(a, b, m) for a, b, m in zip(j, p, mode)],
            dtype=object,
        )

    def _doris_time(s: pd.Series) -> pd.Series:
        """CAST(x AS TIME) / TIME(x): canonical TIME(0) string — fraction
        ROUNDED to seconds, magnitude clamped to 838:59:59 (MySQL cast
        clamp), sign kept. Invalid input -> NULL."""

        def one(v):
            if _isnull(v):
                return None
            p = _parse_time_str(v)
            if p is None:
                return None
            sign, h, mi, sec, micros = p
            if micros >= 500_000:
                sec += 1
                if sec == 60:
                    sec, mi = 0, mi + 1
                    if mi == 60:
                        mi, h = 0, h + 1
            if h > 838:
                h, mi, sec = 838, 59, 59
            return f"{'-' if sign < 0 else ''}{h:02d}:{mi:02d}:{sec:02d}"

        return pd.Series([one(v) for v in s], dtype=object)

    def _doris_time_cast(s: pd.Series, typ: pd.Series) -> pd.Series:
        """CAST(x AS TIME), type-dispatched (the dialect layer passes
        typeof(x)): numeric sources pack digits as ±HHMMSS; datetime
        sources yield the time-of-day part; STRING sources accept
        'H[H..]:MM[:SS]' / digit-packing but a datetime-SHAPED string is
        NULL (reference cast-as-time suite: '2013-01-01 01:02:03' -> \\N,
        while cast(datetime '2013-01-01 01:02:03' as time) = 01:02:03)."""

        def one(v, t):
            if _isnull(v):
                return None
            t = str(t or "")
            if t.startswith(("timestamp", "date")):
                p = _parse_time_str(v)
            elif t in ("string",) or t.startswith(("varchar", "char")):
                import re as _r

                if _r.match(r"^\s*\d{4}-\d{1,2}-\d{1,2}([ T]|$)", str(v)):
                    return None
                p = _parse_time_str(v)
            else:  # numeric
                p = _parse_time_packed(v)
            if p is None:
                return None
            sign, h, mi, sec, micros = p
            if micros >= 500_000:
                sec += 1
                if sec == 60:
                    sec, mi = 0, mi + 1
                    if mi == 60:
                        mi, h = 0, h + 1
            if h > 838:
                h, mi, sec = 838, 59, 59
            return f"{'-' if sign < 0 else ''}{h:02d}:{mi:02d}:{sec:02d}"

        return pd.Series([one(v, t) for v, t in zip(s, typ)], dtype=object)

    def _time_part(part: pd.Series, s: pd.Series) -> pd.Series:
        def one(p, v):
            if _isnull(v) or _isnull(p):
                return None
            t = _parse_time_str(v)
            if t is None:
                return None
            _, h, mi, sec, micros = t
            return {"hour": h, "minute": mi, "second": sec,
                    "microsecond": micros}.get(str(p))

        return pd.Series(
            [one(a, b) for a, b in zip(part, s)], dtype=object
        )


    class _MT19937:
        """std::mt19937 (the reference array_shuffle PRNG,
        function_array_shuffle.cpp:81) — pure python, exact."""

        def __init__(self, seed):
            self.mt = [0] * 624
            self.mt[0] = seed & 0xFFFFFFFF
            for i in range(1, 624):
                self.mt[i] = (
                    1812433253 * (self.mt[i - 1] ^ (self.mt[i - 1] >> 30)) + i
                ) & 0xFFFFFFFF
            self.idx = 624

        def next(self):
            if self.idx >= 624:
                for i in range(624):
                    y = (self.mt[i] & 0x80000000) + (
                        self.mt[(i + 1) % 624] & 0x7FFFFFFF
                    )
                    self.mt[i] = self.mt[(i + 397) % 624] ^ (y >> 1)
                    if y % 2:
                        self.mt[i] ^= 2567483615
                self.idx = 0
            y = self.mt[self.idx]
            self.idx += 1
            y ^= y >> 11
            y ^= (y << 7) & 2636928640
            y ^= (y << 15) & 4022730752
            y ^= y >> 18
            return y

    def _std_shuffle(arr, seed):
        """libstdc++ std::shuffle(first, last, mt19937) — the exact
        permutation the reference produces for a given seed (incl. the
        two-uniform-ints-per-draw optimization for small ranges)."""
        a = list(arr)
        n = len(a)
        if n <= 1:
            return a
        g = _MT19937(int(seed))

        def uni(lo, hi):
            uerange = hi - lo + 1
            scaling = 0xFFFFFFFF // uerange
            past = uerange * scaling
            while True:
                r = g.next()
                if r < past:
                    return lo + r // scaling

        if 0xFFFFFFFF // n >= n:
            i = 1
            if n % 2 == 0:
                d = uni(0, 1)
                a[i], a[d] = a[d], a[i]
                i += 1
            while i < n:
                sr = i + 1
                x = uni(0, sr * (sr + 1) - 1)
                p0, p1 = x // (sr + 1), x % (sr + 1)
                a[i], a[p0] = a[p0], a[i]
                i += 1
                a[i], a[p1] = a[p1], a[i]
                i += 1
            return a
        for i in range(1, n):
            j = uni(0, i)
            a[i], a[j] = a[j], a[i]
        return a

    def _mt_shuffle(arr: pd.Series, seed: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if _isnull(s) or a is None else _std_shuffle(a, s)
                for a, s in zip(arr, seed)
            ],
            dtype=object,
        )

    spark.udf.register("__mt_shuffle", pandas_udf(_mt_shuffle, "array<string>"))

    spark.udf.register("__doris_time", pandas_udf(_doris_time, "string"))
    spark.udf.register("__doris_time_cast", pandas_udf(_doris_time_cast, "string"))
    spark.udf.register("__time_part", pandas_udf(_time_part, "int"))
    spark.udf.register("__mysql_strptime", pandas_udf(_strptime, "string"))
    spark.udf.register("__mysql_strftime", pandas_udf(_strftime, "string"))
    spark.udf.register("__mysql_timefmt", pandas_udf(_timefmt, "string"))
    spark.udf.register("__mysql_week", pandas_udf(_week, "int"))
    spark.udf.register("__json_extract", pandas_udf(_jext, "string"))
    spark.udf.register("__jsonb_ext", pandas_udf(_jbext, "string"))
    spark.udf.register("__locale_dayname", pandas_udf(_name_lookup("days"), "string"))
    spark.udf.register(
        "__locale_monthname", pandas_udf(_name_lookup("months"), "string")
    )
    # 11 registrations above (__mt_shuffle + the 10 datetime/locale names)
    return 11


def register(spark: SparkSession) -> int:
    """Register the python-tier names; returns the count."""
    n = 0

    def reg(name, fn, ret, nondeterministic=False):
        nonlocal n
        u = pandas_udf(fn, ret)
        if nondeterministic:
            u = u.asNondeterministic()
        spark.udf.register(name, u)
        n += 1

    # ---- format_round (function_string_format.h do_format_round):
    #      decimal-exact, HALF-UP away from zero, comma-grouped, fixed
    #      scale. DOUBLE/FLOAT inputs expand their exact binary value
    #      (Decimal(float)) — DBL_MAX renders all 309 digits like the
    #      reference; decimal/int inputs use the rendered text.
    def _wrap(v, bits):
        v &= (1 << bits) - 1
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    def _format_round_one(s, d, t):
        """FormatRound::do_format_round replayed bit-for-bit, INCLUDING
        its native integer widths: the fractional value lives in the
        decimal's backing int (int32/64/128 by precision) and the final
        digit printer casts through int32 — the goldens bake those
        wraparounds (format_round_18's '1.1949288396' IS an int32
        overflow of 2345678900). Doubles follow FormatRoundDoubleImpl:
        my_double_round then {:.{}f} exact binary expansion."""
        if s is None or d is None:
            return None
        import math
        from decimal import Decimal, localcontext

        try:
            d = int(d)
            tm = re.fullmatch(r"decimal\((\d+),(\d+)\)", t or "")
            if not tm:
                # double path: d must be in [0, 1024] (else error -> NULL
                # here); non-finite prints fmt's text form
                if d < 0 or d > 1024:
                    return None
                value = float(s)
                try:
                    tmp = 10.0 ** d
                except OverflowError:
                    tmp = math.inf  # C++ pow(10, 324) = +inf
                vm = value * tmp
                if math.isfinite(vm):
                    value = math.copysign(
                        math.floor(abs(vm) + 0.5), vm) / tmp
                if not math.isfinite(value):
                    return ("inf" if value > 0 else "-inf") \
                        if not math.isnan(value) else "nan"
                body = f"{value:.{d}f}"
                neg = body.startswith("-")
                ip, _, fp = body.lstrip("-").partition(".")
                out = f"{int(ip):,}" if len(ip) > 3 else ip
                if fp:
                    out += "." + fp
                return ("-" if neg else "") + out
            d = max(d, 0)
            p_, scale = int(tm.group(1)), int(tm.group(2))
            width = 32 if p_ <= 9 else 64 if p_ <= 18 else 128
            with localcontext() as ctx:
                ctx.prec = 80
                v = Decimal(str(s))
                neg = v < 0
                i_ = int(v)
                frac = int(
                    (abs(v) - abs(Decimal(i_))).scaleb(scale)
                    .to_integral_value())
            if neg:
                frac = -frac
            # exp10_i32 saturates at INT_MAX past 10^9 (int_exp.h:69) —
            # the goldens bake that too
            def _exp10_i32(x):
                return 0 if x < 0 else (
                    2147483647 if x > 9 else 10 ** x)

            if scale > d > 0:
                mult = 10 ** (scale - (d + 1))
                q = (abs(frac) // mult) * (1 if frac >= 0 else -1)
                frac = abs(_wrap(q, 32)) + 5
                frac //= 10
            elif scale < d and d > 0:
                frac = _wrap(frac * _exp10_i32(d - scale), width)
            if d > 0 and frac == _exp10_i32(d):
                i_ = i_ - 1 if neg else i_ + 1
                frac = 0
            out = f"{i_:,}"
            if neg and i_ == 0:
                out = "-" + out
            if d > 0:
                rem = abs(_wrap(frac, 32))
                digs = []
                for _ in range(d):
                    digs.append(chr(48 + rem % 10))
                    rem //= 10
                out += "." + "".join(reversed(digs))
            return out
        except Exception:
            return None

    def format_round_k(s: pd.Series, d: pd.Series, t: pd.Series) -> pd.Series:
        return pd.Series(
            [_format_round_one(a, b, c) for a, b, c in zip(s, d, t)],
            dtype=object,
        )

    reg("__format_round", format_round_k, "string")

    # ---- IPv6 family (function_ip.cpp). Numeric IPv6 = DECIMAL(38,0)
    #      (uint128 fits; Doris stores LARGEINT).
    def inet6_aton(s: pd.Series) -> pd.Series:
        return s.map(lambda v: _ip6(v).packed.hex() if _ip6(v) else None)

    reg("inet6_aton", inet6_aton, "string")

    def _ip6_bytes_like(v):
        """The engine's IPv6 value spellings -> IPv6Address or None:
        binary16, packed-hex text (this engine's inet6_aton), a
        uint128 decimal string (ipv6_string_to_num), or a 16-char
        text whose BYTES are the address (MySQL INET6_NTOA over
        VARBINARY semantics the IP suites exercise)."""
        try:
            if isinstance(v, (bytes, bytearray)):
                return ipaddress.IPv6Address(bytes(v))
            if isinstance(v, str):
                t = v.strip()
                if re.fullmatch(r"[0-9a-fA-F]{32}", t):
                    return ipaddress.IPv6Address(bytes.fromhex(t))
                if t.isdigit():
                    return ipaddress.IPv6Address(int(t))
                b = v.encode("utf-8", "surrogateescape")
                if len(b) == 16:
                    return ipaddress.IPv6Address(b)
        except (ValueError, TypeError):
            return None
        return None

    def inet6_ntoa(s: pd.Series) -> pd.Series:
        def f(v):
            a = _ip6_bytes_like(v)
            return str(a) if a is not None else None

        return s.map(f)

    reg("inet6_ntoa", inet6_ntoa, "string")

    def ipv6_string_to_num(s: pd.Series) -> pd.Series:
        # BINARY16 like the reference (hex(..) goldens print 32 hex
        # digits; inet6_ntoa consumes the bytes directly)
        def f(v):
            a = _ip_any(v)
            if a is None:
                return None
            if a.version == 4:
                a = ipaddress.IPv6Address("::ffff:" + str(a))
            return a.packed

        return s.map(f)

    for nm in ("ipv6_string_to_num", "ipv6_string_to_num_or_null"):
        reg(nm, ipv6_string_to_num, "binary")

    def ipv6_string_to_num_or_default(s: pd.Series) -> pd.Series:
        def f(v):
            a = _ip_any(v)
            if a is None:
                return b"\x00" * 16
            if a.version == 4:
                a = ipaddress.IPv6Address("::ffff:" + str(a))
            return a.packed

        return s.map(f)

    reg("ipv6_string_to_num_or_default", ipv6_string_to_num_or_default,
        "binary")

    def ipv6_num_to_string(s: pd.Series) -> pd.Series:
        def f(v):
            a = _ip6_bytes_like(v)
            return str(a) if a is not None else None

        return s.map(f)

    reg("ipv6_num_to_string", ipv6_num_to_string, "string")
    reg("ipv6_from_uint128_string_or_null", ipv6_num_to_string, "string")

    def _v4_canon(t: str):
        """Doris IPv4 text parse: trimmed, leading zeros ok, 4 in-range
        decimal parts; canonical dotted render or None."""
        parts = t.split(".")
        if len(parts) != 4:
            return None
        vals = []
        for p in parts:
            if not p or not p.isdigit() or len(p) > 3:
                return None
            v = int(p)
            if v > 255:
                return None
            vals.append(v)
        return ".".join(str(v) for v in vals)

    def _v6_render(a) -> str:
        """Doris IPv6 render: ipv4-mapped and ipv4-compatible addresses
        keep the dotted tail; otherwise RFC 5952 compression."""
        if a.ipv4_mapped is not None:
            return "::ffff:" + str(a.ipv4_mapped)
        iv = int(a)
        if 0xFFFF < iv < (1 << 32):
            return "::" + str(ipaddress.IPv4Address(iv))
        return a.compressed

    def __ip4_canon(s: pd.Series) -> pd.Series:
        def f(v):
            if v is None:
                return None
            t = str(v).strip()
            c = _v4_canon(t)
            if c is not None:
                return c
            try:
                a = ipaddress.IPv6Address(t)
                if a.ipv4_mapped is not None:
                    return str(a.ipv4_mapped)
            except (ValueError, TypeError):
                pass
            return None

        return s.map(f)

    def __ip6_canon(s: pd.Series) -> pd.Series:
        def f(v):
            if v is None:
                return None
            t = str(v).strip()
            c = _v4_canon(t)
            if c is not None:
                return "::ffff:" + c  # ipv4 -> ipv6 maps
            try:
                return _v6_render(ipaddress.IPv6Address(t))
            except (ValueError, TypeError):
                return None

        return s.map(f)

    reg("__ip4_canon", __ip4_canon, "string")
    reg("__ip6_canon", __ip6_canon, "string")

    def __str_to_double(s: pd.Series) -> pd.Series:
        """C-strtod parse keeping the -0.0 sign (Spark's constant
        folder normalizes -0.0 literals to +0.0, which flips
        atan2/copysign results)."""
        def f(v):
            try:
                return float(str(v).strip())
            except (ValueError, TypeError):
                return None

        return s.map(f)

    reg("__str_to_double", __str_to_double, "double")

    def __py_atan2(y: pd.Series, x: pd.Series) -> pd.Series:
        """IEEE atan2 honoring -0.0 (Spark's Atan2 adds +0.0 to both
        operands, collapsing the signed-zero quadrants)."""
        import math as _m

        def f(a, b):
            if a is None or b is None:
                return None
            return _m.atan2(float(a), float(b))

        return pd.Series([f(a, b) for a, b in zip(y, x)], dtype=object)

    reg("__py_atan2", __py_atan2, "double")

    def is_ipv6(s: pd.Series) -> pd.Series:
        return s.map(lambda v: _ip6(v) is not None if v is not None else None)

    reg("is_ipv6", is_ipv6, "boolean")
    reg("is_ipv6_string", is_ipv6, "boolean")

    def _ip6_value(v):
        """IPv6 in ANY of the engine's spellings: binary16, packed-hex
        text, uint128 digits, 16-byte text, or plain IPv6 text."""
        a = _ip6_bytes_like(v)
        if a is not None:
            return a
        return _ip6(v)

    def is_ipv4_compat(s: pd.Series) -> pd.Series:
        # ::x.y.z.w but not ::/::1
        def f(v):
            a = _ip6_value(v)
            if a is None:
                return None
            return a.packed[:12] == b"\x00" * 12 and int(a) > 1

        return s.map(f)

    reg("is_ipv4_compat", is_ipv4_compat, "boolean")

    def is_ipv4_mapped(s: pd.Series) -> pd.Series:
        def f(v):
            a = _ip6_value(v)
            if a is None:
                return None
            return a.ipv4_mapped is not None

        return s.map(f)

    reg("is_ipv4_mapped", is_ipv4_mapped, "boolean")

    def to_ipv6(s: pd.Series) -> pd.Series:
        return s.map(lambda v: str(_ip6(v)) if _ip6(v) else None)

    reg("to_ipv6", to_ipv6, "string")
    reg("to_ipv6_or_null", to_ipv6, "string")

    def to_ipv6_or_default(s: pd.Series) -> pd.Series:
        return s.map(lambda v: str(_ip6(v)) if _ip6(v) else "::")

    reg("to_ipv6_or_default", to_ipv6_or_default, "string")

    def cut_ipv6(s: pd.Series, b6: pd.Series, b4: pd.Series) -> pd.Series:
        # zero the last N bytes (bytes_to_cut_for_ipv6 / _ipv4 per family)
        def f(v, n6, n4):
            a = _ip_any(v)
            if a is None:
                return None
            if a.version == 6 and a.ipv4_mapped is None:
                cut = int(n6)
                packed = a.packed
                kept = packed[: 16 - cut] + b"\x00" * cut
                return str(ipaddress.IPv6Address(kept))
            v4 = a.ipv4_mapped if a.version == 6 else a
            cut = int(n4)
            packed = v4.packed
            kept = packed[: 4 - cut] + b"\x00" * cut
            return str(ipaddress.IPv4Address(kept))

        return pd.Series([f(v, x, y) for v, x, y in zip(s, b6, b4)])

    reg("cut_ipv6", cut_ipv6, "string")

    def ipv6_cidr_to_range(s: pd.Series) -> pd.DataFrame:
        # struct-typed pandas UDFs return a DataFrame, one column per field
        mins, maxs = [], []
        for v in s:
            try:
                if isinstance(v, str) and re.match(
                    r"^[0-9a-fA-F]{32}(/\d+)?$", v
                ):
                    # packed-hex form (this engine's inet6_aton output)
                    addr, _, pre = v.partition("/")
                    v = str(ipaddress.IPv6Address(bytes.fromhex(addr)))
                    if pre:
                        v += "/" + pre
                net = ipaddress.IPv6Network(v, strict=False)
                mins.append(str(net.network_address))
                maxs.append(str(net.broadcast_address))
            except (ValueError, TypeError):
                mins.append(None)
                maxs.append(None)
        return pd.DataFrame({"min": mins, "max": maxs})

    reg("ipv6_cidr_to_range", ipv6_cidr_to_range, "struct<min:string,max:string>")

    # ---- unicode / charsets / binary (function_string.cpp)
    def unicode_normalize(s: pd.Series, form: pd.Series) -> pd.Series:
        return pd.Series(
            [
                unicodedata.normalize((f or "NFC").upper(), v) if v is not None else None
                for v, f in zip(s, form)
            ]
        )

    reg("unicode_normalize", unicode_normalize, "string")

    def convert_to(s: pd.Series, charset: pd.Series) -> pd.Series:
        def f(v, cs):
            if v is None:
                return None
            try:
                return v.encode(cs or "utf-8")
            except (ValueError, LookupError):
                return None

        return pd.Series([f(v, cs) for v, cs in zip(s, charset)])

    reg("convert_to", convert_to, "binary")

    def from_binary(b: pd.Series) -> pd.Series:
        return b.map(lambda v: v.decode("utf-8", "replace") if v is not None else None)

    reg("from_binary", from_binary, "string")

    def sub_binary(b: pd.Series, pos: pd.Series, ln: pd.Series) -> pd.Series:
        def f(v, p, n):
            if v is None or p is None or n is None:
                return None
            p = int(p)
            start = p - 1 if p > 0 else len(v) + p
            if start < 0 or start >= len(v):
                return b""
            return v[start : start + int(n)]

        return pd.Series([f(v, p, n) for v, p, n in zip(b, pos, ln)])

    reg("sub_binary", sub_binary, "binary")

    # ---- hashes
    def murmur_hash3_64(s: pd.Series) -> pd.Series:
        def f(v):
            if v is None:
                return None
            h = _murmur3_x64_128_low64(v.encode("utf-8"))
            return h - (1 << 64) if h >= (1 << 63) else h

        return s.map(f)

    for nm in ("murmur_hash3_64", "murmur_hash3_64_v2", "murmur_hash3_u64_v2"):
        reg(nm, murmur_hash3_64, "long")

    def murmur_hash3_128(s: pd.Series) -> pd.Series:
        def f(v):
            if v is None:
                return None
            lo = _murmur3_x64_128_low64(v.encode("utf-8"))
            return format(lo, "016x")

        return s.map(f)

    for nm in ("murmur_hash3_128", "murmur_hash3_u128"):
        reg(nm, murmur_hash3_128, "string")

    def xxhash_32(s: pd.Series) -> pd.Series:
        def f(v):
            if v is None:
                return None
            h = _xxh32(v.encode("utf-8"))
            return h - (1 << 32) if h >= (1 << 31) else h

        return s.map(f)

    reg("xxhash_32", xxhash_32, "int")
    reg("xxhash3_64", lambda s: s.map(lambda v: None), "long")  # stub: XXH3 not ported

    # ---- uuid <-> int (function_string.cpp uuid_to_int/int_to_uuid)
    def uuid_to_int(s: pd.Series) -> pd.Series:
        def f(v):
            try:
                return str(_uuid.UUID(v).int)
            except (ValueError, TypeError, AttributeError):
                return None

        return s.map(f)

    reg("uuid_to_int", uuid_to_int, "string")

    def int_to_uuid(s: pd.Series) -> pd.Series:
        def f(v):
            try:
                return str(_uuid.UUID(int=int(v)))
            except (ValueError, TypeError):
                return None

        return s.map(f)

    reg("int_to_uuid", int_to_uuid, "string")

    # ---- JSON (function_json.cpp)
    def json_contains(j: pd.Series, cand: pd.Series) -> pd.Series:
        def f(a, b):
            if a is None or b is None:
                return None
            try:
                return _json_contains(json.loads(a), json.loads(b))
            except ValueError:
                return None

        return pd.Series([f(a, b) for a, b in zip(j, cand)])

    reg("json_contains", json_contains, "boolean")

    def normalize_json_numbers_to_double(j: pd.Series) -> pd.Series:
        def f(v):
            if v is None:
                return None
            try:
                return json.dumps(_norm_numbers(json.loads(v)), separators=(",", ":"))
            except ValueError:
                return None

        return j.map(f)

    reg("normalize_json_numbers_to_double", normalize_json_numbers_to_double, "string")
    reg("normalize_jsonb_numbers_to_double", normalize_json_numbers_to_double, "string")

    # ---- compress / uncompress (zlib; internally consistent pair)
    def compress(s: pd.Series) -> pd.Series:
        return s.map(lambda v: zlib.compress(v.encode("utf-8")) if v is not None else None)

    reg("compress", compress, "binary")

    def uncompress(b: pd.Series) -> pd.Series:
        def f(v):
            if v is None:
                return None
            try:
                return zlib.decompress(bytes(v)).decode("utf-8")
            except (zlib.error, ValueError):
                return None

        return b.map(f)

    reg("uncompress", uncompress, "string")

    # ---- misc
    def random_bytes(n_: pd.Series) -> pd.Series:
        return n_.map(lambda v: secrets.token_bytes(int(v)) if v is not None else None)

    reg("random_bytes", random_bytes, "binary", nondeterministic=True)

    def sleep_fn(sec: pd.Series) -> pd.Series:
        def f(v):
            if v is not None:
                time.sleep(min(float(v), 10.0))
            return True

        return sec.map(f)

    reg("sleep", sleep_fn, "boolean", nondeterministic=True)

    def ignore_fn(x: pd.Series) -> pd.Series:
        return pd.Series([False] * len(x))

    reg("ignore", ignore_fn, "boolean")

    return n


def register_apn_helper(spark: SparkSession) -> int:
    """auto_partition_name list-mode value encoder (AutoPartitionName.java):
    ascii alphanumerics verbatim, any other character as the lowercase hex
    of its codepoint, then the value's character count appended."""

    def _apn_encode(s: pd.Series) -> pd.Series:
        def f(v):
            if v is None:
                return None
            enc = "".join(ch if ch.isascii() and ch.isalnum() else format(ord(ch), "x") for ch in v)
            return f"{enc}{len(v)}"

        return s.map(f)

    spark.udf.register("__apn_encode", pandas_udf(_apn_encode, "string"))
    return 1


def register_crc32_internal(spark: SparkSession) -> int:
    """Doris crc32_internal: zlib crc32 chained over the arguments'
    INTERNAL value layouts (be/src/exprs/function/function_string_misc.cpp
    FunctionCrc32Internal -> util/raw_value.h RawValue::zlib_crc32):
    integers little-endian at their storage width, float/double IEEE bytes,
    DATEV2 packed (y<<9|m<<5|d) uint32, DATETIMEV2 packed uint64 with a
    20-bit microsecond field, decimals as little-endian unscaled ints at
    the DECIMAL32/64/128 width, strings utf-8 bytes, NULL as a 4-byte zero
    (HashUtil::zlib_crc_hash_null). The macro layer passes each argument
    as (CAST(x AS STRING), typeof(x)) pairs so one UDF serves every type;
    the string forms round-trip losslessly for all supported layouts."""
    import struct
    import zlib
    from decimal import Decimal

    _dec_t = re.compile(r"decimal\((\d+),\s*(\d+)\)")

    def _enc(v: str, t: str) -> bytes:
        t = t.lower()
        if t == "tinyint":
            return struct.pack("<b", int(v))
        if t == "smallint":
            return struct.pack("<h", int(v))
        if t == "int":
            return struct.pack("<i", int(v))
        if t == "bigint":
            return struct.pack("<q", int(v))
        if t == "boolean":
            return struct.pack("<b", 1 if v == "true" else 0)
        if t == "float":
            import numpy as np

            return np.float32(v).tobytes()
        if t == "double":
            return struct.pack("<d", float(v))
        m = _dec_t.match(t)
        if m:
            p, sc = int(m.group(1)), int(m.group(2))
            unscaled = int(Decimal(v).scaleb(sc))
            width = 4 if p <= 9 else 8 if p <= 18 else 16
            return unscaled.to_bytes(width, "little", signed=True)
        if t == "date":
            y, mo, d = int(v[0:4]), int(v[5:7]), int(v[8:10])
            return struct.pack("<I", (y << 9) | (mo << 5) | d)
        if t.startswith("timestamp"):
            y, mo, d = int(v[0:4]), int(v[5:7]), int(v[8:10])
            h = int(v[11:13]) if len(v) > 12 else 0
            mi = int(v[14:16]) if len(v) > 15 else 0
            sec = int(v[17:19]) if len(v) > 18 else 0
            us = int((v[20:26] + "000000")[:6]) if len(v) > 19 else 0
            packed = (
                (((((y << 4 | mo) << 5 | d) << 5 | h) << 6 | mi) << 6 | sec)
                << 20
            ) | us
            return struct.pack("<Q", packed)
        return v.encode("utf-8")

    def _crc32_internal(vals: pd.Series, typs: pd.Series) -> pd.Series:
        out = []
        for vlist, tlist in zip(vals, typs):
            h = 0
            for v, t in zip(vlist, tlist):
                if v is None:
                    h = zlib.crc32(b"\x00\x00\x00\x00", h)
                else:
                    h = zlib.crc32(_enc(v, t), h)
            out.append(h)
        return pd.Series(out, dtype="int64")

    spark.udf.register(
        "__crc32_internal", pandas_udf(_crc32_internal, "bigint")
    )
    return 1


def register_charset(spark: SparkSession) -> int:
    """CONVERT(x USING charset) collation bytes: Python codecs cover the
    MySQL charsets (gbk, big5, latin1...) that the JVM's encode() SQL
    function refuses."""

    def _charset_bytes(s: pd.Series, cs: pd.Series) -> pd.Series:
        def one(v, c):
            if v is None:
                return None
            try:
                return v.encode(c or "utf-8", errors="replace")
            except LookupError:
                return v.encode("utf-8", errors="replace")

        return pd.Series(
            [one(v, c) for v, c in zip(s, cs)], dtype=object
        )

    spark.udf.register("__charset_bytes", pandas_udf(_charset_bytes, "binary"))
    return 1
