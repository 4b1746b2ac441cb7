"""Fast pytest mirror of the driver's correctness gate: a subset of
queries()/oracle_sql() pairs compared via DuckDB at sf0.001 (the full
sweep at sf0.01 runs via scripts/check_queries.py)."""

import duckdb
import numpy as np
import pytest

from pytod_spark.queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
FAST = [
    "knn_scores",
    "ecod_scores",
    "hbos_events",
    "lof_scores",
    "stats_profile",
    "uniqueness_lineitem",
    "ri_orders_customer",
    "token_entropy",
    "dedup_exact",
    "multimodal_metadata",
    "drift_verdicts",
    # round-3 pipeline/validation rows
    "contamination_check",
    "repetition_signals",
    "token_shards",
    "chunk_docs",
    "chunk_dedup",
    "vocab_topk",
    "bpe_merge_candidates",
    "training_shuffle",
    "mix_weights",
    "doc_logprob",
    "quantize_embeddings",
    "winnow_pairs",
    "psi_events",
    "ks_events",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            try:
                df[c] = df[c].astype("float64")
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("name", FAST)
def test_query_matches_duckdb_oracle(spark, duck, name):
    spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = duck.sql(ORACLES[name]).df()
    assert len(spark_pdf) == len(duck_pdf)
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
    s, d = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if sv.dtype.kind == "f":
            np.testing.assert_allclose(sv, dv, rtol=1e-9, atol=1e-9, err_msg=f"col {c}")
        else:
            np.testing.assert_array_equal(sv, dv, err_msg=f"col {c}")


def test_all_oracle_keys_have_queries():
    assert set(ORACLES) <= set(QUERIES)
    # since round 5 the catalogue has NO rows-only queries: even the
    # sketch row ships a bounded-error oracle (in-plan verdicts vs the
    # exact twin, asserted by the DuckDB SQL)
    assert set(QUERIES) - set(ORACLES) == set()
