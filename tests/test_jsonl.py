"""JSONL corpus ingestion (sources/jsonl.py): per-row damage
tolerance, the ingest ledger, and round-trip fidelity."""

from __future__ import annotations

from pyspark.sql import functions as F

from chroma_rs_spark.sources.jsonl import (
    jsonl_ingest_report,
    read_jsonl_corpus,
)


def _write_lines(tmp_path, lines: list[str]) -> str:
    p = tmp_path / "corpus"
    p.mkdir()
    (p / "part-0.jsonl").write_text("\n".join(lines) + "\n")
    return str(p)


def test_corrupt_lines_cost_rows_not_the_job(spark, tmp_path):
    path = _write_lines(
        tmp_path,
        [
            '{"doc_id": 1, "text": "alpha"}',
            "CORRUPT not json at all",
            '{"doc_id": 2, "text": "beta with \\"quotes\\" and \\n newline"}',
            '{"doc_id": 3}',          # valid JSON, null text
            "{truncated",             # damaged mid-object
        ],
    )
    df = read_jsonl_corpus(spark, path, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in df.collect() if r["doc_id"] is not None}
    assert rows[1]["text"] == "alpha" and rows[1]["_corrupt_record"] is None
    assert rows[2]["text"] == 'beta with "quotes" and \n newline'
    assert rows[3]["text"] is None and rows[3]["_corrupt_record"] is None
    bad = [r for r in df.collect() if r["_corrupt_record"] is not None]
    assert sorted(r["_corrupt_record"] for r in bad) == [
        "CORRUPT not json at all",
        "{truncated",
    ]
    # every damaged row keeps NULL data columns (no partial-parse leak)
    assert all(r["doc_id"] is None and r["text"] is None for r in bad)

    rep = jsonl_ingest_report(df).collect()[0]
    assert (rep["n_lines"], rep["n_valid"], rep["n_corrupt"]) == (5, 3, 2)
    # per-field parse health: doc 3 is valid JSON with no text field
    assert (rep["n_doc_id_parsed"], rep["n_text_parsed"]) == (3, 2)


def test_round_trip_from_to_json(spark, tmp_path):
    src = spark.createDataFrame(
        [(i, f"doc {i} text with unicode é中 and tab\there")
         for i in range(50)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "rt")
    src.select(
        F.to_json(F.struct("doc_id", "text")).alias("value")
    ).write.text(path)
    back = read_jsonl_corpus(spark, path, "doc_id long, text string")
    assert jsonl_ingest_report(back).collect()[0]["n_corrupt"] == 0
    got = sorted((r["doc_id"], r["text"]) for r in back.collect())
    want = sorted(tuple(r) for r in src.collect())
    assert got == want


def test_empty_and_all_corrupt(spark, tmp_path):
    path = _write_lines(tmp_path, ["garbage", "more garbage"])
    df = read_jsonl_corpus(spark, path, "doc_id long, text string")
    rep = jsonl_ingest_report(df).collect()[0]
    assert (rep["n_lines"], rep["n_valid"], rep["n_corrupt"]) == (2, 0, 2)
