"""Pin the events.ts parquet time-unit sniff (catalog._events_ts_unit).

The driver's data generator has shipped `events.ts` as TIMESTAMP(NANOS)
and as TIMESTAMP(MICROS) across dataset revisions (the r4 regeneration
switched ns → µs and silently mass-failed 10 events queries until the
footer sniff landed). These fixtures freeze BOTH physical layouts so the
next regeneration cannot regress the read plan unnoticed.
"""

import datetime
import warnings

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_data_pipeline_spark import catalog

INSTANTS = [
    datetime.datetime(2026, 1, 1, 0, 0, 0, 123456),
    datetime.datetime(2026, 1, 2, 13, 45, 59, 999999),
    datetime.datetime(2026, 2, 28, 23, 59, 59, 7),
]


def _write_events(path, unit: str) -> None:
    ts_type = pa.timestamp(unit)
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(INSTANTS, ts_type),
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["view", "cart", "purchase"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["a=1", "b=2", "c=3"]),
        }
    )
    pq.write_table(table, str(path))


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_ts_unit_sniff(tmp_path, unit):
    _write_events(tmp_path / "events.parquet", unit)
    assert catalog._events_ts_unit(str(tmp_path / "events.parquet")) == unit


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_load_events_reads_identical_instants_either_unit(spark, tmp_path, unit):
    """Both physical layouts must decode to the SAME µs instants (ns is
    truncated toward zero, matching DuckDB's conversion, so the oracle
    comparison agrees)."""
    _write_events(tmp_path / "events.parquet", unit)
    rows = (
        catalog.load_table(spark, str(tmp_path), "events")
        .orderBy("event_id")
        .collect()
    )
    assert [r["ts"] for r in rows] == INSTANTS
    assert [r["event_id"] for r in rows] == [1, 2, 3]


def test_ns_precision_truncates_not_rounds(spark, tmp_path):
    # 999,999,999 ns within the second must floor to 999,999 µs (DuckDB
    # semantics), not round up into the next second
    base = datetime.datetime(2026, 3, 1, 12, 0, 0)
    epoch_ns = int(base.timestamp()) * 10**9 + 999_999_999
    table = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([epoch_ns], pa.timestamp("ns")),
            "user_id": pa.array([10], pa.int64()),
            "event_type": pa.array(["view"]),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["x"]),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    got = catalog.load_table(spark, str(tmp_path), "events").first()["ts"]
    assert got.microsecond == 999_999
    assert got.second == base.second


def test_sniff_failure_warns_instead_of_silently_assuming_us(tmp_path):
    """A broken footer must WARN (pointing at the sniff), not silently
    select the µs plan — the r4 drift cost hours because the eventual
    failure surfaced far from this cause."""
    bad = tmp_path / "events.parquet"
    bad.write_bytes(b"not a parquet file")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert catalog._events_ts_unit(str(bad)) is None
    assert any("time unit" in str(x.message) for x in w)


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_documents_corpus_is_pure_ascii(sf):
    """The media_features_md5 oracle truncates text by CHARACTER
    (substr(t,1,64)) while the operator truncates the UTF-8 payload by
    BYTE — byte-identical only while the corpus is pure ASCII. This is
    the guard the oracle's comment cites: a future non-ASCII
    regeneration fails HERE, not as an inscrutable value-hash mismatch."""
    import duckdb

    path = f"/root/testdata/{sf}/documents.parquet"
    bad, total = duckdb.sql(
        "SELECT COUNT(*) FILTER (octet_length(encode(text)) <> length(text)), "
        f"COUNT(*) FROM read_parquet('{path}') WHERE text IS NOT NULL"
    ).fetchone()
    assert total > 0
    assert bad == 0, (
        f"{bad} non-ASCII documents in {sf}: the character-based substr in "
        "_O_MEDIA_FEATURES_MD5 no longer matches the operator's byte slice"
    )
