"""IO round-trips (partitioned parquet sink + partition pruning on
re-read), the salted-join helper, and the CLI entry point."""

import subprocess
import sys

from pyspark.sql import functions as F

from institutional_fx_etl_spark.functions.skew import salt_join
from institutional_fx_etl_spark.sources.writers import write_parquet


def test_partitioned_parquet_roundtrip_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(s, i, float(i)) for s in ["EURUSD", "USDJPY"] for i in range(10)],
        "symbol string, i int, v double",
    )
    out = str(tmp_path / "part")
    write_parquet(df, out, partition_by=["symbol"])

    back = spark.read.parquet(out).filter(F.col("symbol") == "EURUSD")
    assert back.count() == 10
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter must prune at the source, not post-scan
    assert "PartitionFilters: [isnotnull(symbol" in plan


def test_salt_join_matches_plain_join(spark):
    # skewed large side: one hot key with most rows
    large = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(k, 0) for k in range(2, 12)],
        "k int, payload int",
    )
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 8)], "k int, name string"
    )
    plain = sorted(
        (r["k"], r["payload"], r["name"])
        for r in large.join(small, on="k").collect()
    )
    salted = sorted(
        (r["k"], r["payload"], r["name"])
        for r in salt_join(large, small, on=["k"], factor=4).collect()
    )
    assert salted == plain
    assert len(salted) == 500 + 6  # hot key + keys 2..7


def test_cli_end_to_end(tmp_path):
    m1 = tmp_path / "m1.csv"
    ticks = tmp_path / "ticks.csv"
    m1.write_text(
        "Date,Time,Open,High,Low,Close,TickVol\n"
        "2024.01.01,09:58:00,1.1990,1.1995,1.1985,1.1992,10\n"
    )
    ticks.write_text(
        "datetime,ask,bid,av,bv\n"
        "2024-01-01 10:00:05,1.2002,1.2000,1,1\n"
        "2024-01-01 10:02:40,1.2004,1.2002,1,1\n"
    )
    out = tmp_path / "out.csv"
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "institutional_fx_etl_spark",
            str(m1),
            str(ticks),
            str(out),
            "--spike-threshold",
            "10.0",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "rows_written=5" in proc.stdout  # 09:58..10:02 inclusive
    assert "audit.gap_bridged_flat=2" in proc.stdout  # 09:59 and 10:01
    assert (out / "_SUCCESS").exists()

    # the same run forced through the fused engine must emit identical
    # counts (the --engine flag is the crossover's manual override)
    out2 = tmp_path / "out_fused.csv"
    proc2 = subprocess.run(
        [
            sys.executable,
            "-m",
            "institutional_fx_etl_spark",
            str(m1),
            str(ticks),
            str(out2),
            "--spike-threshold",
            "10.0",
            "--engine",
            "fused",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    assert "rows_written=5" in proc2.stdout
    assert "audit.gap_bridged_flat=2" in proc2.stdout
    body = sorted((out / "part-00000-" ).parent.glob("part*.csv"))
    body2 = sorted((out2 / "part-00000-").parent.glob("part*.csv"))
    text_a = "".join(p.read_text() for p in body)
    text_b = "".join(p.read_text() for p in body2)
    assert text_a == text_b, "fused CLI output differs from vanilla"


def test_jsonl_corpus_roundtrip_and_corrupt_capture(spark, tmp_path):
    """JSONL scan: valid lines land typed, a torn line degrades to one
    auditable _corrupt row, and the relation feeds the text operators
    unchanged."""
    import json

    from institutional_fx_etl_spark.operators.text import token_entropy
    from institutional_fx_etl_spark.sources.readers import read_jsonl_corpus

    p = tmp_path / "docs.jsonl"
    lines = [
        json.dumps({"id": 1, "text": "alpha beta beta", "lang": "en",
                    "source": "s1"}),
        json.dumps({"id": 2, "text": "gamma", "lang": "fr", "source": "s2"}),
        '{"id": 3, "text": "torn',  # corrupt line
    ]
    p.write_text("\n".join(lines) + "\n")
    df = read_jsonl_corpus(spark, str(p))
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[1]["text"] == "alpha beta beta" and rows[1]["lang"] == "en"
    corrupt = [r for r in rows.values() if r["_corrupt"] is not None]
    assert len(corrupt) == 1 and "torn" in corrupt[0]["_corrupt"]
    ent = {
        r["doc_id"]: r["n_types"]
        for r in token_entropy(df.filter("_corrupt IS NULL")).collect()
    }
    assert ent[1] == 2


def test_orc_roundtrip_partition_pruned(spark, tmp_path):
    """ORC sink/scan round-trip preserves types and values; the
    partition filter prunes to one directory (plan-visible)."""
    from institutional_fx_etl_spark.sources.readers import read_orc
    from institutional_fx_etl_spark.sources.writers import write_orc

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "a", 3.5)],
        "id long, part string, v double",
    )
    path = str(tmp_path / "orc")
    write_orc(df, path, partition_cols=["part"])
    back = read_orc(spark, path)
    assert sorted((r["id"], r["v"]) for r in back.collect()) == [
        (1, 1.5), (2, 2.5), (3, 3.5)
    ]
    pruned = back.filter("part = 'a'")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(part" in plan
    assert pruned.count() == 2


def test_swap_dataset_chaos_every_crash_point(tmp_path):
    """Kill the three-rename swap at EVERY filesystem op (each
    os.rename / shutil.rmtree raises in turn) and assert the
    live-copy-at-every-instant claim: after each simulated crash a
    COMPLETE copy of the data (all-old or all-new, never a mix)
    exists, and recover_dataset() restores a readable table at the
    primary path (round-8 verdict ask #6)."""
    import os as _os
    import shutil as _shutil

    from institutional_fx_etl_spark.sources.writers import (
        _swap_dataset,
        recover_dataset,
    )

    def build(base, leftover_old):
        path = str(base / "tbl")
        tmp = str(base / "tbl__rewrite")
        _os.makedirs(path)
        _os.makedirs(tmp)
        with open(_os.path.join(path, "part-0"), "w") as f:
            f.write("old")
        with open(_os.path.join(tmp, "part-0"), "w") as f:
            f.write("new")
        if leftover_old:
            _os.makedirs(path + "__old")
            with open(_os.path.join(path + "__old", "part-0"), "w") as f:
                f.write("stale")
        return path, tmp

    def read_table(p):
        with open(_os.path.join(p, "part-0")) as f:
            return f.read()

    class Boom(RuntimeError):
        pass

    # with a leftover __old the op sequence is rmtree, rename, rename,
    # rmtree; without it the first rmtree is skipped
    for leftover_old in (False, True):
        n_ops = 4 if leftover_old else 3
        for crash_at in range(1, n_ops + 1):
            base = tmp_path / f"c{int(leftover_old)}_{crash_at}"
            base.mkdir()
            path, tmp = build(base, leftover_old)
            calls = {"n": 0}
            real_rename, real_rmtree = _os.rename, _shutil.rmtree

            def counted(realf, *a, **kw):
                calls["n"] += 1
                if calls["n"] == crash_at:
                    raise Boom(f"op {crash_at}")
                return realf(*a, **kw)

            _os.rename = lambda *a, **kw: counted(real_rename, *a, **kw)
            _shutil.rmtree = lambda *a, **kw: counted(real_rmtree, *a, **kw)
            try:
                try:
                    _swap_dataset(path, tmp)
                    crashed = False
                except Boom:
                    crashed = True
            finally:
                _os.rename, _shutil.rmtree = real_rename, real_rmtree
            assert crashed, f"op {crash_at} never fired ({leftover_old})"

            # invariant 1: a complete old or new copy survives somewhere
            copies = [
                read_table(p)
                for p in (path, path + "__old", tmp)
                if _os.path.exists(_os.path.join(p, "part-0"))
            ]
            assert any(c in ("old", "new") for c in copies), (
                leftover_old,
                crash_at,
                copies,
            )
            # invariant 2: one-call recovery yields a live table with
            # a complete (never mixed/stale-only) copy
            assert recover_dataset(path), (leftover_old, crash_at)
            assert read_table(path) in ("old", "new")

    # control: no crash — swap completes and recovery is a no-op
    base = tmp_path / "clean"
    base.mkdir()
    path, tmp = build(base, leftover_old=True)
    _swap_dataset(path, tmp)
    assert read_table(path) == "new"
    assert recover_dataset(path)
    assert read_table(path) == "new"
