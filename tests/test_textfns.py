"""Text analysis functions + misc scalar helpers."""

from pyspark.sql import functions as F

from logboost_spark.functions.goformat import go_layout_to_jvm
from logboost_spark.functions.textfns import (
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id,
    quality_score,
    whitespace_token_count,
)


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("a b  c", 3, 3), ("", 0, 0), ("hello, world! 42", 3, 5), ("  x  ", 1, 1)],
        "text string, ws int, bpe int",
    )
    got = df.select(
        "ws", "bpe",
        whitespace_token_count(F.col("text")).alias("g_ws"),
        bpe_ish_token_count(F.col("text")).alias("g_bpe"),
    ).collect()
    for r in got:
        assert r.g_ws == r.ws and r.g_bpe == r.bpe, r


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of the house", "en"),
            ("der hund und die katze ist hier", "de"),
            ("le chat et la maison est grande", "fr"),
            ("xyzzy plugh qwerty", "und"),
        ],
        "text string, want string",
    )
    got = df.select("want", lang_id(F.col("text")).alias("got")).collect()
    for r in got:
        assert r.got == r.want, (r.want, r.got)


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [("the quick brown fox and the lazy dog of doom",), ("!!! ??? ### $$$ %%%",)],
        "text string",
    )
    rows = df.select(quality_score(F.col("text")).alias("q")).collect()
    good, bad = rows[0].q, rows[1].q
    assert 0.0 <= bad < good <= 1.0


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [("alpha beta gamma",), ("gamma beta alpha",), ("alpha beta gamma",)],
        "text string",
    )
    fps = [r.fp for r in df.select(doc_fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[2]
    assert fps[0] != fps[1]


def test_go_layout_translation():
    assert go_layout_to_jvm("2006-01-02 15:04:05") == "yyyy-MM-dd HH:mm:ss"
    assert go_layout_to_jvm("01/02/2006") == "MM/dd/yyyy"
    assert go_layout_to_jvm("Jan 2 15:04:05") == "MMM d HH:mm:ss"
    assert go_layout_to_jvm("2006-01-02T15:04:05.000Z07:00") == "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"


def test_pii_scrub_all_types(spark):
    """Engine scrub vs a Python `re` oracle on synthetic rows covering
    every pattern (the driver fixture exercises only the IP path)."""
    import re

    from pyspark.sql import functions as F

    from logboost_spark.functions.textfns import PII_PATTERNS, pii_counts, pii_scrub

    rows = [
        (0, "contact bob.smith+spam@mail.example.co.uk or root@h.io today"),
        (1, "src 10.0.0.1 dst 203.0.113.77 gw 192.168.1.254"),
        (2, "call +1 (555) 123-4567 or 555 987 6543 now"),
        (3, "mixed a@b.io from 8.8.8.8 phone +44 (020) 794-60958 tail"),
        (4, "nothing to redact here"),
        (5, ""),
        (6, "dial 555-123-4567 or (555) 123-4567 or 555.123.4567 ok"),
    ]
    df = spark.createDataFrame(rows, "id bigint, text string")
    counts = pii_counts(F.col("text"))
    got = {
        r.id: r
        for r in df.select(
            "id",
            pii_scrub(F.col("text")).alias("scrubbed"),
            *[counts[n].alias(n) for n, _, _ in PII_PATTERNS],
        ).collect()
    }

    for rid, text in rows:
        want = text
        for _, pat, repl in PII_PATTERNS:
            want = re.sub(pat, repl, want)
        assert got[rid].scrubbed == want, (rid, got[rid].scrubbed, want)
        for name, pat, _ in PII_PATTERNS:
            assert got[rid][name] == len(re.findall(pat, text)), (rid, name)

    # the typed placeholders actually landed
    assert "<EMAIL>" in got[0].scrubbed and "@" not in got[0].scrubbed
    assert got[1].scrubbed.count("<IP>") == 3
    assert "<PHONE>" in got[2].scrubbed
    # bare 3-3-4 formats: expectations written out INDEPENDENTLY of the
    # pattern (not derived via re.sub), so a prefix-required regression
    # can't hide behind oracle parity again
    assert got[6].scrubbed == "dial <PHONE> or <PHONE> or <PHONE> ok", got[6].scrubbed
    assert got[6].phone == 3
    assert got[2].scrubbed == "call <PHONE> or <PHONE> now", got[2].scrubbed
