"""Property tests of the pure-Python oracle itself (no Spark).

The oracle is the stand-in for the Go reference; these pin its
primitives against independent ground truth (the `ipaddress` stdlib for
the RFC ranges the reference checks) and against hand-derived cases.
"""

import ipaddress

from hypothesis import given, settings
from hypothesis import strategies as st

from logboost_spark import oracle as O

# the reference's private set = stdlib is_private-ish PLUS multicast
# (224/4) and the "255." / "0.0.0.0" string specials, MINUS some ranges
# the reference doesn't check (e.g. 100.64/10 CGNAT, 198.18/15 benchmark,
# 240/4 reserved) — helpers/network.go:29-52,124-142.
_REF_EXTRA = [
    ipaddress.ip_network("224.0.0.0/4"),
    ipaddress.ip_network("255.0.0.0/8"),
    ipaddress.ip_network("192.0.0.0/24"),
]
_REF_MISSING = [
    ipaddress.ip_network("100.64.0.0/10"),
    ipaddress.ip_network("198.18.0.0/15"),
    ipaddress.ip_network("240.0.0.0/4"),
    ipaddress.ip_network("192.31.196.0/24"),
    ipaddress.ip_network("192.52.193.0/24"),
    ipaddress.ip_network("192.88.99.0/24"),
    ipaddress.ip_network("192.175.48.0/24"),
    ipaddress.ip_network("198.51.100.0/24"),
    ipaddress.ip_network("203.0.113.0/24"),
]


@settings(max_examples=400, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_ipv4_privacy_matches_stdlib(n):
    ip = str(ipaddress.ip_address(n))
    a = ipaddress.ip_address(n)
    want = a.is_private or a.is_multicast or a.is_loopback or a.is_link_local
    for net in _REF_MISSING:
        if a in net:
            want = False
    for net in _REF_EXTRA:
        want = want or a in net  # after exclusions: "255." beats 240/4
    # 0.0.0.0 special: reference treats exactly 0.0.0.0 as private, the
    # rest of 0.0.0.0/8 as public
    if a in ipaddress.ip_network("0.0.0.0/8"):
        want = n == 0
    assert O.is_private(ip) == want, ip


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_ipv4_roundtrip(n):
    ip = str(ipaddress.ip_address(n))
    assert O.ipv4_to_int(ip) == n


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**32 - 1), min_size=0, max_size=5
    ),
    st.booleans(),
)
def test_first_public_precedence_property(ns, pad):
    ips = [str(ipaddress.ip_address(n)) for n in ns]
    text = (" lorem " if pad else " ").join(ips)
    got = O.first_public_ip(text)
    if not ips:
        assert got is None
        return
    pubs = [i for i in ips if not O.is_private(i)]
    want = pubs[0] if pubs else ips[0]
    assert got == want
