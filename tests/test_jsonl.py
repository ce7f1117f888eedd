"""JSONL corpus source/sink: quarantine semantics and shard round-trip
(pytest-only: no fixture dump exists; the op is source-layer)."""

from __future__ import annotations

from lakehouse_adventureworks2022_spark.sources.jsonl import (
    read_jsonl_corpus,
    write_jsonl_shards,
)


def test_read_jsonl_quarantines_bad_lines(spark, tmp_path):
    lines = [
        '{"doc_id": 1, "text": "good row", "lang": "en", "source": "web"}',
        "this is not json at all",
        '{"doc_id": "NOT_A_NUMBER", "text": "type mismatch"}',
        '{"doc_id": 2, "text": "also good", "lang": "de", "source": "books"}',
        '{"doc_id": 3}',  # missing fields parse as nulls — still good
        '{broken json',
    ]
    src = tmp_path / "dump.jsonl"
    src.write_text("\n".join(lines) + "\n")
    good, quarantine = read_jsonl_corpus(spark, str(src))

    good_rows = {r["doc_id"]: r for r in good.collect()}
    assert set(good_rows) == {1, 2, 3}
    assert good_rows[1]["text"] == "good row"
    assert good_rows[3]["text"] is None  # missing field, valid JSON
    assert "_corrupt_record" not in good.columns

    bad = sorted(r["raw_line"] for r in quarantine.collect())
    assert len(bad) == 3
    assert "this is not json at all" in bad
    assert "{broken json" in bad
    assert any("NOT_A_NUMBER" in line for line in bad)


def test_jsonl_shard_roundtrip_balanced_and_deterministic(spark, tmp_path):
    df = spark.range(2_000).selectExpr(
        "id AS doc_id",
        "concat('text-', id) AS text",
        "'en' AS lang",
        "'web' AS source",
    )
    out = tmp_path / "shards"
    write_jsonl_shards(df, str(out), n_shards=8)

    def shard_lines(base):
        dirs = sorted(p for p in base.iterdir() if p.name.startswith("shard="))
        return {
            d.name: sorted(
                line
                for p in d.iterdir()
                if p.name.startswith("part-")
                for line in p.open().read().splitlines()
            )
            for d in dirs
        }

    shards = shard_lines(out)
    assert len(shards) == 8
    counts = [len(v) for v in shards.values()]
    assert sum(counts) == 2_000
    assert min(counts) > 2_000 / 8 * 0.7  # hash-uniform balance

    back, quarantine = read_jsonl_corpus(spark, str(out))
    assert quarantine.count() == 0
    assert back.count() == 2_000
    assert {r["doc_id"] for r in back.collect()} == set(range(2_000))

    # deterministic re-shard: same rows land in the same shard dirs
    out2 = tmp_path / "shards2"
    write_jsonl_shards(df, str(out2), n_shards=8)
    assert shard_lines(out2) == shards
