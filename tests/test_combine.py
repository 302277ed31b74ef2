"""Combine sink (S9) + fuzzy header resolution (F5) + multimodal plumbing."""

from pyspark.sql import functions as F

from logboost_spark.operators.combine import combine, combine_files, fuzzy_resolve
from logboost_spark.operators.multimodal import extract_features, gen_media_fixture, sample_frames
from logboost_spark.semantics import SOURCE_FILE_COL


def test_combine_union_by_name(spark):
    a = spark.createDataFrame([(1, "x")], "id bigint, a string")
    b = spark.createDataFrame([(2, "y")], "id bigint, b string")
    out = combine([a, b])
    rows = {r.id: (r.a, r.b) for r in out.collect()}
    assert rows[1] == ("x", None)
    assert rows[2] == (None, "y")


def test_combine_files_sourcefile(spark, tmp_path):
    p1, p2 = str(tmp_path / "f1"), str(tmp_path / "f2")
    spark.createDataFrame([(1, "x")], "id bigint, a string").write.parquet(p1)
    spark.createDataFrame([(2, "y")], "id bigint, b string").write.parquet(p2)
    out = combine_files(spark, [p1, p2])
    assert SOURCE_FILE_COL in out.columns
    # match the DIRECTORY component — a bare contains("f1") can collide
    # with the random hex UUID in the other file's part-file name
    assert out.filter(F.col(SOURCE_FILE_COL).contains("/f1/")).count() == 1
    assert out.filter(F.col(SOURCE_FILE_COL).contains("/f2/")).count() == 1


def test_fuzzy_resolve(spark):
    df = spark.createDataFrame([(1, "a", "b")], "id bigint, ClientIpAddress string, other string")
    assert fuzzy_resolve(df, "ClientIpAddress") == "ClientIpAddress"
    assert fuzzy_resolve(df, "ClientIp") == "ClientIpAddress"  # substring containment
    assert fuzzy_resolve(df, "missing") is None


def test_combine_master_reference_direction(spark):
    """Pins helpers.go:988-996/921-930 semantics: each SECONDARY header maps
    into the master list when the quote-stripped MASTER name equals or
    CONTAINS it; first master match wins per secondary; later secondary
    columns overwrite earlier ones on the same master slot (resortRecord
    last-write, helpers.go:1000-1009); unmatched master slots get Go's
    zero value "" for strings / typed NULL for non-strings; secondary
    columns with no master match are dropped."""
    from logboost_spark.operators.combine import combine_master

    master = spark.createDataFrame(
        [(1, "m1", "s1", 10)], "id bigint, message_text_full string, source string, score bigint"
    )
    sec = spark.createDataFrame(
        # 'message_text' and 'message' BOTH map to master 'message_text_full'
        # (master contains each) — the later secondary column must win.
        # 'severity' matches no master name — dropped.
        [(2, "from_mt", "from_m", "high")],
        "id bigint, message_text string, message string, severity string",
    )
    out = combine_master([master, sec])
    assert out.columns == ["id", "message_text_full", "source", "score"]
    rows = {r.id: r for r in out.collect()}
    assert rows[1].message_text_full == "m1"
    assert rows[2].message_text_full == "from_m"  # last write wins
    assert rows[2].source == ""  # Go zero value, not NULL
    assert rows[2].score is None  # non-string master slot → typed NULL
    assert out.schema["score"].dataType.typeName() == "long"


def test_multimodal_features(spark):
    media = gen_media_fixture(spark, 30)
    feats = extract_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r.features) == 16
        assert all(0.0 <= v <= 1.0 for v in r.features)
        assert r.n_bytes > 0
    # determinism: same payload → same features
    again = extract_features(media).collect()
    assert {r.media_id: r.features for r in again} == {r.media_id: r.features for r in feats}


def test_multimodal_frame_sampling(spark):
    media = gen_media_fixture(spark, 30)
    frames = sample_frames(media, every_ms=500)
    per = frames.groupBy("media_id").count().collect()
    assert per  # videos exist
    meta = {r.media_id: r.meta.duration_ms for r in media.filter(F.col("kind") == "video").collect()}
    for r in per:
        want = (meta[r.media_id] - 1) // 500 + 1
        assert r["count"] == want


def test_media_real_wav_decode_branch(spark):
    """The AutoDecoder's audio branch REALLY decodes RIFF/WAVE payloads
    (stdlib wave — always available), while non-WAV payloads in the same
    batch ride the labeled stub; both emit the identical feature schema.
    The loudness-envelope features must match a pure-Python replay and
    reflect actual signal amplitude (silence→0, loud→high), which no
    sha256 stub can fake."""
    import io
    import math
    import struct
    import wave

    from logboost_spark.operators.multimodal import (
        FEATURE_DIM,
        AutoDecoder,
        MEDIA_SCHEMA,
        StubDecoder,
        WavDecoder,
    )

    def make_wav(amplitudes, rate=8000):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            for a in amplitudes:
                w.writeframes(struct.pack("<h", a))
        return buf.getvalue()

    # half silence, half loud square-ish wave -> first 8 windows ~0,
    # last 8 windows ~0.5
    n = 1600
    samples = [0] * (n // 2) + [
        16384 if i % 2 == 0 else -16384 for i in range(n // 2)
    ]
    wav = make_wav(samples)
    sine = make_wav(
        [int(8000 * math.sin(2 * math.pi * 440 * i / 8000)) for i in range(n)]
    )
    rows = [
        (0, "audio", wav, (None, None, 200, "pcm16")),
        (1, "audio", sine, (None, None, 200, "pcm16")),
        (2, "audio", b"not a wav at all....", (None, None, 100, "fake")),
        (3, "image", b"fake image bytes", (4, 4, None, "fake")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r.media_id: r.features for r in extract_features(media).collect()}

    # schema identity across branches: same dim, same float type
    assert all(len(v) == FEATURE_DIM for v in feats.values())

    # real branch: silence-then-loud envelope (float32 storage tolerance)
    got = feats[0]
    assert all(abs(x) < 1e-6 for x in got[:8]), got[:8]
    assert all(abs(x - 0.5) < 0.01 for x in got[8:]), got[8:]
    # matches the decoder run locally
    want = WavDecoder().decode("audio", wav)
    assert all(abs(a - b) < 1e-6 for a, b in zip(got, want))
    # sine envelope: every window ~ mean(|sin|)*8000/32768 ~ 0.1555
    assert all(abs(x - 0.1555) < 0.01 for x in feats[1])

    # stub branch unchanged for non-WAV payloads
    stub = StubDecoder()
    assert all(abs(a - b) < 1e-6 for a, b in zip(feats[2], stub.decode("audio", rows[2][2])))
    auto = AutoDecoder()
    assert auto.decode("image", b"fake image bytes") == stub.decode("image", b"fake image bytes")
