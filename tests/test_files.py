"""JSONL ingestion: round-trip fidelity and malformed-line quarantine."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from sql_autoloader_spark.connectors.files import (
    CORRUPT_COL,
    read_jsonl,
    split_quarantine,
    write_jsonl,
)

SCHEMA = "doc_id bigint, text string, n long"


def test_jsonl_roundtrip_exact(spark: SparkSession, tmp_path: Path) -> None:
    rows = [
        (1, "plain", 10),
        (2, 'quotes " and \\ backslash', 20),
        (3, "unicode é中文 and\nnewline", 30),
        (4, None, None),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = str(tmp_path / "corpus")
    write_jsonl(df, out, partitions=2)
    back = read_jsonl(spark, out, SCHEMA)
    clean, bad = split_quarantine(back)
    assert bad.count() == 0
    assert sorted(map(tuple, clean.collect())) == sorted(rows)


def test_jsonl_quarantines_malformed_lines(
    spark: SparkSession, tmp_path: Path
) -> None:
    src = tmp_path / "raw"
    src.mkdir()
    (src / "part-0.jsonl").write_text(
        '{"doc_id": 1, "text": "ok", "n": 5}\n'
        "this is not json at all\n"
        '{"doc_id": "NOT_A_NUMBER", "text": "bad type", "n": 1}\n'
        '{"doc_id": 2, "text": "also ok", "n": 7}\n'
    )
    back = read_jsonl(spark, str(src), SCHEMA)
    clean, bad = split_quarantine(back)
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
    raws = sorted(r[CORRUPT_COL] for r in bad.collect())
    assert len(raws) == 2
    assert "not json at all" in raws[1] or "not json at all" in raws[0]
    # the type-violating line is quarantined VERBATIM, not coerced
    assert any("NOT_A_NUMBER" in r for r in raws)


def test_jsonl_schema_collision_rejected(spark: SparkSession) -> None:
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl(spark, "/nonexistent", f"a long, {CORRUPT_COL} string")


def test_jsonl_clean_filter_no_shuffle(
    spark: SparkSession, tmp_path: Path
) -> None:
    """The clean-side split is filter+project only — no exchange."""
    df = spark.createDataFrame([(1, "x", 2)], SCHEMA)
    out = str(tmp_path / "c")
    write_jsonl(df, out)
    clean, _ = split_quarantine(read_jsonl(spark, out, SCHEMA))
    plan = clean._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_csv_quarantines_malformed_lines(
    spark: SparkSession, tmp_path: Path
) -> None:
    from sql_autoloader_spark.connectors.files import read_csv

    src = tmp_path / "csv"
    src.mkdir()
    (src / "part-0.csv").write_text(
        "doc_id,text,n\n"
        '1,"ok",5\n'
        '2,"quoted, comma",7\n'
        "NOT_A_NUMBER,bad,1\n"
        '3,"fine",9\n'
    )
    back = read_csv(spark, str(src), SCHEMA)
    clean, bad = split_quarantine(back)
    rows = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert rows == {1: "ok", 2: "quoted, comma", 3: "fine"}
    raws = [r[CORRUPT_COL] for r in bad.collect()]
    assert len(raws) == 1 and "NOT_A_NUMBER" in raws[0]


def test_orc_roundtrip_exact(spark: SparkSession, tmp_path: Path) -> None:
    """ORC round trip is lossless for text (unicode, newlines, quotes)
    and nulls; the pinned read schema is honored."""
    from sql_autoloader_spark.connectors.files import read_orc, write_orc

    rows = [
        (1, "plain", 10),
        (2, 'quotes " and \\ backslash', 20),
        (3, "unicode é中文 and\nnewline", 30),
        (4, None, None),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = str(tmp_path / "orc")
    write_orc(df, out, bloom_filter_cols=["doc_id"], partitions=2)
    back = read_orc(spark, out, SCHEMA)
    assert sorted(map(tuple, back.collect())) == sorted(rows)
    # self-describing read (no schema) agrees
    assert read_orc(spark, out).count() == 4


def test_orc_predicate_pushdown_reaches_scan(
    spark: SparkSession, tmp_path: Path
) -> None:
    """A selective doc_id predicate lands in the ORC scan's
    PushedFilters — stripe skipping / bloom probing territory at
    scale — and filters exactly."""
    from sql_autoloader_spark.connectors.files import read_orc, write_orc

    df = spark.range(0, 1000).selectExpr(
        "id AS doc_id", "CAST(id AS STRING) AS text", "id AS n"
    )
    out = str(tmp_path / "orcp")
    write_orc(df, out, bloom_filter_cols=["doc_id"])
    probe = read_orc(spark, out, SCHEMA).where(F.col("doc_id") == 421)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "doc_id" in plan.split(
        "PushedFilters"
    )[1].split("]")[0]
    assert [r["doc_id"] for r in probe.collect()] == [421]


def test_csv_roundtrip_preserves_surrounding_whitespace(
    spark: SparkSession, tmp_path: Path
) -> None:
    """Spark's CSV WRITER trims surrounding whitespace unless the
    ignore*WhiteSpace options are pinned false (round 10: caught by the
    docs_csv_roundtrip oracle as a 4-char length loss) — the write
    settings the registered query uses must round-trip exactly."""
    from sql_autoloader_spark.connectors.files import read_csv

    df = spark.createDataFrame(
        [(1, "ends with space ", 5), (2, " leading", 7)], SCHEMA
    )
    out = str(tmp_path / "ws")
    (
        df.write.option("header", "false")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(out)
    )
    back, bad = split_quarantine(read_csv(spark, out, SCHEMA, header=False))
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == {1: "ends with space ", 2: " leading"}
    assert bad.count() == 0


def test_partitioned_corpus_write_prunes_at_read(
    spark: SparkSession, tmp_path: Path
) -> None:
    """partition_by lands a Hive layout whose columns prune whole
    directories at read time (PartitionFilters in the scan), for both
    ORC and JSONL writers; values round-trip from the paths."""
    from sql_autoloader_spark.connectors.files import read_orc, write_orc

    df = spark.createDataFrame(
        [(i, f"t{i}", ["en", "fr", "de"][i % 3]) for i in range(30)],
        "doc_id long, text string, lang string",
    )
    out = str(tmp_path / "part_orc")
    write_orc(df, out, partition_by=["lang"])
    back = read_orc(spark, out).where(F.col("lang") == "fr")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    assert back.count() == 10
    assert {r["lang"] for r in back.collect()} == {"fr"}

    from sql_autoloader_spark.connectors.files import (
        read_jsonl,
        split_quarantine,
        write_jsonl,
    )

    out2 = str(tmp_path / "part_jsonl")
    write_jsonl(df, out2, partition_by=["lang"])
    got = read_jsonl(spark, out2, "doc_id long, text string, lang string")
    clean, bad = split_quarantine(got)
    assert bad.count() == 0
    # read real columns: a bare count() of a partition-only filter
    # references just the corrupt column file-side, which Spark
    # refuses outright (QUERY_ONLY_CORRUPT_RECORD_COLUMN — the same
    # caveat split_quarantine documents for the quarantine side)
    de = {r["doc_id"] for r in clean.where("lang = 'de'").collect()}
    assert de == {i for i in range(30) if i % 3 == 2}
