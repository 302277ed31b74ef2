"""flatten_intervals: longest-prefix-wins sweep vs a per-point oracle."""

import random

from logboost_spark.operators.geo_join import flatten_intervals


def _point_oracle(rows, x):
    """Narrowest interval covering x; ties to input order (mmdb trie)."""
    best = None
    for i, r in enumerate(rows):
        if r[0] <= x <= r[1]:
            key = (r[1] - r[0], i)
            if best is None or key < best[0]:
                best = (key, r[2:])
    return best[1] if best else None


def test_nested_cidr_longest_prefix_wins():
    rows = [
        (0, 255, "wide"),       # /24
        (64, 127, "narrow"),    # /26 inside
        (96, 99, "narrowest"),
    ]
    out = flatten_intervals(rows)
    assert _lookup(out, 50) == ("wide",)
    assert _lookup(out, 70) == ("narrow",)
    assert _lookup(out, 97) == ("narrowest",)
    assert _lookup(out, 200) == ("wide",)
    # disjoint + sorted
    for a, b in zip(out, out[1:]):
        assert a[1] < b[0]


def _lookup(out, x):
    for r in out:
        if r[0] <= x <= r[1]:
            return r[2:]
    return None


def test_property_random_intervals_match_oracle():
    rng = random.Random(42)
    for trial in range(20):
        rows = []
        for i in range(rng.randint(1, 40)):
            s = rng.randint(0, 1000)
            e = s + rng.randint(0, 300)
            rows.append((s, e, f"a{i}", i))
        out = flatten_intervals(rows)
        # disjoint + sorted
        for a, b in zip(out, out[1:]):
            assert a[1] < b[0], (trial, a, b)
        # coverage equals input union; winner = narrowest covering
        for x in range(0, 1350, 7):
            want = _point_oracle(rows, x)
            got = _lookup(out, x)
            assert got == want, (trial, x, got, want)


def test_empty_and_single():
    assert flatten_intervals([]) == []
    assert flatten_intervals([(5, 9, "only")]) == [(5, 9, "only")]
