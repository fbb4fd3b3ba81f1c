"""Every declared query vs its DuckDB oracle — the local replica of the
driver's CORRECTNESS gate, run at sf0.001 for speed (the driver uses
sf0.01; set SPARKSYNC_TEST_SF to widen)."""

from __future__ import annotations

import pytest

from sparksync.queries import ORACLES, QUERIES

from .conftest import SF_CORRECT, compare_query_vs_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    compare_query_vs_oracle(spark, duck, QUERIES[name], ORACLES[name], SF_CORRECT)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_CORRECT)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_q208_q209_null_text_gate_parity(spark, duck, tmp_path):
    """ADVICE r11 #4: the trim-family oracles must mirror the engine's
    NULL-text contract (coalesce to zero tokens). The shipped fixtures
    carry no NULL text, so this builds a corpus that does and replays
    the full gate compare on it."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparksync.queries import ORACLES, QUERIES

    from .conftest import TABLES

    sf = tmp_path / "sfnull"
    sf.mkdir()
    for t in TABLES:
        os.symlink(f"{SF_CORRECT}/{t}.parquet", sf / f"{t}.parquet")
    os.unlink(sf / "documents.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": [
                    "q w e r t y u i o p a s d f g h",  # benchmark doc
                    None,  # the NULL-text row the oracles must survive
                    "n1 n2 q w e r t y u i o p a s d f g h n3 n4",
                    "a b c a b c a b c d e f",
                ],
                "lang": ["en"] * 4,
                "source": ["src0", "src1", "src1", "src2"],
                "n_chars": pa.array([31, None, 40, 23], pa.int64()),
            }
        ),
        str(sf / "documents.parquet"),
    )
    for name in ("q208_decontaminate_trim", "q209_self_trim_repeats"):
        compare_query_vs_oracle(
            spark, duck, QUERIES[name], ORACLES[name], str(sf)
        )
