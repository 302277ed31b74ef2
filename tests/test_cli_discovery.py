"""S1 CLI parity: recursive mixed-directory discovery (.csv/.log/.txt +
.gz variants, --getall fall-through) → per-file readers → full pipeline.
Reference findLogsToProcess (main.go:144-171)."""

import gzip
import json
import os

import pytest

from logboost_spark.sources.readers import find_logs_to_process, read_log_directory


@pytest.fixture()
def logdir(tmp_path):
    d = tmp_path / "logs"
    (d / "sub").mkdir(parents=True)
    (d / "a.csv").write_text(
        "ip,action\n8.8.8.8,allow\n10.0.0.5,deny\n1.1.1.1,allow\n"
    )
    (d / "sub" / "b.log").write_text(
        "conn from 93.184.216.34 ok\nconn from 192.168.0.9 refused\n"
    )
    (d / "c.txt").write_text("no address here\nanother line\nthird\n")
    with gzip.open(d / "d.txt.gz", "wt") as f:
        f.write("gz line 203.0.113.9\ngz line two\n")
    (d / "skip.bin").write_bytes(b"\x00\x01binary")
    (d / "note.md").write_text("# not a log\n")
    return str(d)


def test_find_logs_ext_filter_and_getall(logdir):
    found = find_logs_to_process(logdir)
    assert found == sorted(found)  # deterministic full-path order
    assert {os.path.basename(p) for p in found} == {
        "a.csv", "c.txt", "d.txt.gz", "b.log",
    }
    allf = find_logs_to_process(logdir, getall=True)
    assert {os.path.basename(p) for p in allf} == {
        "a.csv", "c.txt", "d.txt.gz", "b.log", "skip.bin", "note.md",
    }


def test_read_log_directory_shape(spark, logdir):
    df = read_log_directory(spark, logdir)
    rows = df.collect()
    # 3 csv rows + 2 log lines + 3 txt lines + 2 gz lines
    assert len(rows) == 10
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append(r)
    # conv_id is the path RELATIVE to the input dir (unique per file)
    assert set(by_conv) == {"a.csv", "sub/b.log", "c.txt", "d.txt.gz"}
    # per-file sequence: contiguous from 0
    for conv, rs in by_conv.items():
        assert sorted(r.turn_idx for r in rs) == list(range(len(rs))), conv
    # csv rows carry their columns as JSON text
    a_texts = [r.text for r in by_conv["a.csv"]]
    assert any('"ip":"8.8.8.8"' in t and '"action":"allow"' in t for t in a_texts)
    # gz read transparently
    assert any("203.0.113.9" in r.text for r in by_conv["d.txt.gz"])
    assert all(r.role == "log" and r.tool == "none" for r in rows)


def test_read_log_directory_basename_collision(spark, tmp_path):
    """Two files with the same basename in different subdirs (and a .log
    beside its .gz twin) must stay distinct conversations with their own
    contiguous turn_idx — the reference processes each file by full path."""
    import gzip

    d = tmp_path / "logs"
    (d / "x").mkdir(parents=True)
    (d / "y").mkdir()
    (d / "x" / "a.log").write_text("x one\nx two\n")
    (d / "y" / "a.log").write_text("y one\ny two\ny three\n")
    (d / "b.log").write_text("plain\n")
    with gzip.open(d / "b.log.gz", "wt") as f:
        f.write("gzipped\n")
    df = read_log_directory(spark, str(d))
    rows = df.collect()
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append(r)
    assert set(by_conv) == {"x/a.log", "y/a.log", "b.log", "b.log.gz"}
    assert sorted(r.turn_idx for r in by_conv["x/a.log"]) == [0, 1]
    assert sorted(r.turn_idx for r in by_conv["y/a.log"]) == [0, 1, 2]
    # no duplicate (conv_id, turn_idx) pairs anywhere
    pairs = [(r.conv_id, r.turn_idx) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_read_log_directory_dominant_file_multisplit(spark, tmp_path):
    """One file dominating the input must fan out across several splits
    (per-split window + offset join), while (conv_id, turn_idx, text)
    stays identical to file line order."""
    d = tmp_path / "logs"
    d.mkdir()
    n = 5000
    lines = [f"line {i:06d} payload {'x' * 40}" for i in range(n)]
    (d / "big.log").write_text("\n".join(lines) + "\n")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 * 1024))
        # prove the conf actually splits the file into multiple tasks
        assert spark.read.text(str(d / "big.log")).rdd.getNumPartitions() > 4
        df = read_log_directory(spark, str(d))
        rows = df.orderBy("turn_idx").collect()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert len(rows) == n
    assert [r.turn_idx for r in rows] == list(range(n))
    # exact per-file sequence: offset + within-split rank == line number
    assert [r.text for r in rows] == lines


def test_cli_intelfile_ingest_e2e(spark, logdir, tmp_path, capsys):
    """Reference -intelfile/-intelname/-inteltype (main.go:516-545): a
    local indicator file merges into the TI table before enrichment, so
    a matching row routes to the threat sink with the custom feed name
    in lb_ThreatFeeds."""
    import main as M
    from logboost_spark.plans.checkpoint import read_sinks

    intel = tmp_path / "custom_intel.txt"
    # d.txt.gz contains 203.0.113.9 (TEST-NET-3, not in the fixture feeds);
    # comment/blank/private lines must be skipped on ingest
    intel.write_text("# custom feed\n\n203.0.113.9\n10.9.9.9\n")
    out = str(tmp_path / "sinks")
    rc = M.main([
        "--input", logdir, "--input-format", "logs", "--rawtxt",
        "--output", out, "--groups", "2",
        "--no-whois", "--no-idb",
        "--intelfile", str(intel), "--intelname", "customfeed",
        "--inteltype", "suspicious",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rows = read_sinks(spark, out).filter("text like '%203.0.113.9%'").collect()
    assert rows, "indicator row must appear in a sink"
    assert any("customfeed" in (r.lb_ThreatFeeds or "") for r in rows)
    assert res["sink_counts"]["threat"] >= 1
    # flags must travel together (reference main.go:107-108)
    assert M.main([
        "--input", logdir, "--input-format", "logs", "--output", out,
        "--intelfile", str(intel),
    ]) == 2


def test_cli_logs_mode_e2e(spark, logdir, tmp_path, capsys):
    import main as M

    out = str(tmp_path / "sinks")
    rc = M.main([
        "--input", logdir, "--input-format", "logs", "--rawtxt",
        "--output", out, "--groups", "2",
        "--no-whois", "--no-idb",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["groups_written"] == 2
    assert sum(res["sink_counts"].values()) == 10
    # public-IP rows with a TI hit route to threat/general; the private
    # 10.0.0.5 and 192.168.0.9 rows route internal; no-IP lines to noip
    assert res["sink_counts"]["internal"] == 2
    assert res["sink_counts"]["noip"] == 4
    # WITHOUT --rawtxt/--getall (reference default, main.go:442):
    # unrecognized raw content is skipped — only the CSV-derived JSON
    # rows survive the parse stage
    out2 = str(tmp_path / "sinks_norawtxt")
    rc = M.main([
        "--input", logdir, "--input-format", "logs",
        "--output", out2, "--groups", "2",
        "--no-whois", "--no-idb",
    ])
    assert rc == 0
    res2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sum(res2["sink_counts"].values()) == 3  # a.csv rows only
    assert res2["sink_counts"]["internal"] == 1  # 10.0.0.5
