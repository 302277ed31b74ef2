"""Public-suffix matcher: spec semantics over the embedded rule set
(tldparserr/tld_parser.go:5-46 parity cases)."""

import pytest

from logboost_spark.functions.psl import parse_psl_domain, public_suffix


@pytest.mark.parametrize(
    "fqdn,want",
    [
        # simple gTLD / ccTLD
        ("host.example.com", "example.com"),
        ("example.com", "example.com"),
        ("a.b.c.example.org", "example.org"),
        ("fabrikam.jp", "fabrikam.jp"),
        # multi-label registry suffixes
        ("www.parliament.co.uk", "parliament.co.uk"),
        ("shop.acme.co.za", "acme.co.za"),
        ("x.y.globo.com.br", "globo.com.br"),
        ("host.initech.co.jp", "initech.co.jp"),
        ("foo.ac.uk", "foo.ac.uk"),
        # PRIVATE-section delegated suffixes
        ("myuser.github.io", "myuser.github.io"),
        ("deep.path.myuser.github.io", "myuser.github.io"),
        ("app.herokuapp.com", "app.herokuapp.com"),
        ("bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com"),
        # wildcard rules: *.ck
        ("www.foo.ck", "www.foo.ck"),
        # exception rules: !www.ck
        ("www.ck", "www.ck"),
        ("sub.www.ck", "www.ck"),
        # bare suffix → no registrable domain
        ("com", "none"),
        ("co.uk", "none"),
        ("github.io", "none"),
        ("foo.ck", "none"),  # whole domain IS the wildcard suffix
        # unknown TLD → none (reference map covers the full zone set)
        ("host.example.notatld", "none"),
        ("", "none"),
        ("localhost", "none"),
    ],
)
def test_parse_psl_domain(fqdn, want):
    assert parse_psl_domain(fqdn) == want


def test_public_suffix_longest_wins():
    assert public_suffix("a.b.co.uk") == "co.uk"
    assert public_suffix("a.b.uk") == "uk"
    assert public_suffix("x.github.io") == "github.io"
    assert public_suffix("x.y.io") == "io"


def test_fixture_suffixes_unchanged():
    """Every fixture-generator suffix must parse identically under the
    full list (the committed lookup parquet depends on it)."""
    from logboost_spark.fixtures.lookups import PSL_SUFFIXES

    for s in PSL_SUFFIXES:
        assert parse_psl_domain(f"host1.word.{s}") == f"word.{s}", s
