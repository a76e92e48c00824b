"""Driver-gate regression: every queries() entry with an oracle_sql()
matches DuckDB exactly at sf0.001 (the driver runs the same comparison
at sf0.01)."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as m

    return m


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings", "events", "lineitem", "orders",
              "customer", "part", "supplier", "nation", "region"):
        c.sql(
            "create view %s as select * from read_parquet('%s/%s.parquet')"
            % (t, SF_DIR, t)
        )
    return c


def _to_df(x):
    import pyarrow as pa

    import ray.data as rd

    if isinstance(x, rd.Dataset):
        return x.to_pandas()
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_all_sql_checked_queries_match(entrymod, con):
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    assert set(sqls) <= set(qs)
    # golden-parquet-backed oracles are pinned to sf0.01 (the driver's
    # grading scale) — they are verified in test_goldens.py instead
    golden_backed = set(entrymod._golden_sql())
    failures = []
    for name, sql in sqls.items():
        if name in golden_backed:
            continue
        mine = _canon(_to_df(qs[name](SF_DIR)))
        want = _canon(con.sql(sql).df())
        if list(mine.columns) != list(want.columns):
            failures.append((name, "schema", list(mine.columns), list(want.columns)))
            continue
        if len(mine) != len(want):
            failures.append((name, "rows", len(mine), len(want)))
            continue
        mm = mine.astype(object).where(pd.notna(mine), None).values.tolist()
        ww = want.astype(object).where(pd.notna(want), None).values.tolist()
        if mm != ww:
            failures.append((name, "values", mm[:2], ww[:2]))
    assert not failures, failures


def test_rows_only_queries_run(entrymod):
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    for name in set(qs) - set(sqls):
        res = _to_df(qs[name](SF_DIR))
        assert len(res) >= 0, name


def test_phrase_candidate_join_tier_matches_broadcast(entrymod, monkeypatch):
    """doc_phrase/doc_proximity with a forced partitioned-semi-join
    candidate tier (broadcast limit 0 — every candidate set counts as
    'too big for the driver') must equal the default broadcast tier:
    the high-df-phrase scale path is result-identical."""
    from textindex_ray.pipelines import documents as D

    base_phrase = D.doc_phrase(SF_DIR).to_pandas()
    base_prox = D.doc_proximity(SF_DIR).to_pandas()
    monkeypatch.setattr(D, "CAND_BROADCAST_LIMIT", 0)
    pd.testing.assert_frame_equal(D.doc_phrase(SF_DIR).to_pandas(), base_phrase)
    pd.testing.assert_frame_equal(D.doc_proximity(SF_DIR).to_pandas(), base_prox)


def test_entry_smoke(entrymod):
    res = entrymod.entry()
    df = _to_df(res)
    assert len(df) >= 0
    assert list(df.columns)
