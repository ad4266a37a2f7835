"""Python-UDF tier (functions/pyfns.py): pinned vectors and round trips.

xxhash_32 is pinned to the published XXH32 test vectors; murmur_hash3_64
is checked against the algorithm's empty-input fixed point and for
64-bit dispersion; everything else is exact-value or round-trip.
"""

from __future__ import annotations

import pytest

CASES = [
    # IPv6
    ("inet6_ntoa(inet6_aton('2001:db8::1'))", "2001:db8::1"),
    ("inet6_aton('not-an-ip')", None),
    # BINARY16 semantics (reference: hex(ipv6_string_to_num(..)) goldens
    # print 32 hex digits; the r11-inherited kernel packs the address)
    ("ipv6_string_to_num('::1')", b"\x00" * 15 + b"\x01"),
    ("ipv6_string_to_num('1.2.3.4')", b"\x00" * 10 + b"\xff\xff" + bytes([1, 2, 3, 4])),
    ("ipv6_string_to_num_or_null('bad')", None),
    ("ipv6_string_to_num_or_default('bad')", b"\x00" * 16),
    ("ipv6_num_to_string('1')", "::1"),
    ("is_ipv6('::1')", True),
    ("is_ipv6('1.2.3.4')", False),
    ("is_ipv4_compat(inet6_aton('::1.2.3.4'))", True),
    ("is_ipv4_compat(inet6_aton('::1'))", False),
    ("is_ipv4_mapped(inet6_aton('::ffff:1.2.3.4'))", True),
    ("is_ipv4_mapped(inet6_aton('2001:db8::1'))", False),
    ("to_ipv6('2001:0DB8:0000:0000:0000:0000:0000:0001')", "2001:db8::1"),
    ("to_ipv6_or_default('bad')", "::"),
    ("cut_ipv6('2001:db8:1111:2222:3333:4444:5555:6666', 8, 0)", "2001:db8:1111:2222::"),
    ("cut_ipv6('1.2.3.4', 0, 1)", "1.2.3.0"),
    ("ipv6_cidr_to_range('2001:db8::/32').min", "2001:db8::"),
    ("ipv6_cidr_to_range('2001:db8::/32').max", "2001:db8:ffff:ffff:ffff:ffff:ffff:ffff"),
    # unicode / charset / binary
    ("unicode_normalize('e\\u0301', 'NFC')", "é"),
    ("length(convert_to('ab', 'utf-8'))", 2),
    ("from_binary(convert_to('hi', 'utf-8'))", "hi"),
    ("from_binary(sub_binary(convert_to('hello', 'utf-8'), 2, 3))", "ell"),
    # hashes: XXH32 published vectors (seed 0)
    ("xxhash_32('')", 0x02CC5D05),
    ("murmur_hash3_64('')", 0),
    ("murmur_hash3_64('hello') = murmur_hash3_64('hello')", True),
    ("murmur_hash3_64('hello') <> murmur_hash3_64('hellp')", True),
    ("length(murmur_hash3_128('abc'))", 16),
    # uuid
    ("int_to_uuid(uuid_to_int('6ce4637a-d8d3-4d1b-8c39-3d4a57cba123'))", "6ce4637a-d8d3-4d1b-8c39-3d4a57cba123"),
    ("uuid_to_int('00000000-0000-0000-0000-000000000001')", "1"),
    # json
    ("json_contains('{\"a\": 1, \"b\": 2}', '{\"a\": 1}')", True),
    ("json_contains('{\"a\": 1}', '{\"a\": 2}')", False),
    # MySQL rule: a non-array candidate is contained in an array target if
    # it is contained in SOME element — 4 is inside the nested [3, 4]
    ("json_contains('[1, 2, [3, 4]]', '[2, 4]')", True),
    ("json_contains('[1, 2, [3, 4]]', '[5]')", False),
    ("json_contains('[1, 2, [3, 4]]', '[2, [4]]')", True),
    ("json_contains('[1, 2]', '1')", True),
    ("normalize_json_numbers_to_double('{\"a\": 1, \"b\": [2, \"x\"]}')", '{"a":1.0,"b":[2.0,"x"]}'),
    # compress round trip
    ("uncompress(compress('hello world'))", "hello world"),
    ("uncompress(CAST('junk' AS BINARY))", None),
    # misc
    ("ignore('anything')", False),
    ("length(random_bytes(8))", 8),
]


@pytest.mark.parametrize("call,expected", CASES, ids=[c[0][:60] for c in CASES])
def test_pyfns_pinned(spark, call, expected):
    got = spark.sql("SELECT " + call).collect()[0][0]
    if isinstance(expected, int) and not isinstance(expected, bool):
        assert int(got) == expected, (call, got, expected)
    else:
        assert got == expected, (call, got, expected)


def test_xxh32_known_vector_a(spark):
    # XXH32("a", seed 0) = 0x550D7456
    got = spark.sql("SELECT xxhash_32('a')").collect()[0][0]
    assert got == 0x550D7456


def test_murmur64_dispersion(spark):
    rows = spark.sql(
        "SELECT count(DISTINCT murmur_hash3_64(CAST(id AS STRING))) c FROM range(1000)"
    ).collect()
    assert rows[0][0] == 1000
