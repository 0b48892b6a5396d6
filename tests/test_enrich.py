"""Batched external enrichment (SURVEY §2.1 S7): sources/enrich.py —
the reference's batched-RPC fan-out plumbing with deterministic fake
clients (the external client itself is the caller's, like the
multimodal decode boundary)."""

import pandas as pd
import pytest

from cryptowalletcommunitydetection_spark.sources.enrich import batched_enrich


def _addresses(spark, n=25):
    return spark.createDataFrame(
        [(i, f"0xaddr{i:04d}") for i in range(n)], "pair_id long, address string"
    )


def fake_client(pdf):
    """Deterministic stand-in for the reference's batched eth_call
    (token0/getReserves fan-out): one output row per input row, the
    'reserve' derived from the pair id, plus the observed batch size
    so tests can assert the slicing contract."""
    return pd.DataFrame(
        {
            "pair_id": pdf["pair_id"],
            "reserve": pdf["pair_id"] * 10 + 1,
            "batch_rows": len(pdf),
        }
    )


SCHEMA = "pair_id long, reserve long, batch_rows int"


def test_enriches_every_row_in_bounded_batches(spark):
    df = _addresses(spark, 25).repartition(3)
    out = batched_enrich(df, fake_client, SCHEMA, batch_size=4).collect()
    assert len(out) == 25
    got = {r["pair_id"]: r["reserve"] for r in out}
    assert got == {i: i * 10 + 1 for i in range(25)}
    # the client NEVER sees more than batch_size rows
    assert max(r["batch_rows"] for r in out) <= 4


def test_retry_recovers_flaky_batches(spark):
    """A client that fails on first contact with every batch: the
    per-batch retry (reference retry_handler semantics) must absorb it
    with no lost or duplicated rows. Failure memory lives in a
    per-executor-process global (tasks retry in the same worker)."""
    df = _addresses(spark, 12).coalesce(1)

    def flaky(pdf):
        import builtins

        seen = getattr(builtins, "_enrich_seen", set())
        key = int(pdf["pair_id"].iloc[0])
        if key not in seen:
            seen.add(key)
            builtins._enrich_seen = seen
            raise ConnectionError("transient")
        return fake_client(pdf)

    out = batched_enrich(
        df, flaky, SCHEMA, batch_size=5, tries=3, max_sleep=0.01
    ).collect()
    assert sorted(r["pair_id"] for r in out) == list(range(12))


def test_exhausted_retries_fail_the_task(spark):
    df = _addresses(spark, 3).coalesce(1)

    def dead(pdf):
        raise ConnectionError("down")

    with pytest.raises(Exception, match="down"):
        batched_enrich(
            df, dead, SCHEMA, batch_size=2, tries=2, max_sleep=0.01
        ).collect()


def test_client_may_drop_or_expand_rows(spark):
    """Output cardinality is the client's (the reference's deployer
    lookup drops txs it cannot resolve and logs them — S11; expansion
    covers one-to-many RPC results)."""
    df = _addresses(spark, 10).coalesce(1)

    def halver(pdf):
        keep = pdf[pdf["pair_id"] % 2 == 0]
        return pd.DataFrame(
            {
                "pair_id": keep["pair_id"],
                "reserve": keep["pair_id"],
                "batch_rows": len(pdf),
            }
        )

    out = batched_enrich(df, halver, SCHEMA, batch_size=3).collect()
    assert sorted(r["pair_id"] for r in out) == [0, 2, 4, 6, 8]


def test_plan_is_arrow_not_per_row_python(spark):
    df = _addresses(spark, 5)
    plan = (
        batched_enrich(df, fake_client, SCHEMA, batch_size=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan


def test_validation(spark):
    with pytest.raises(ValueError):
        batched_enrich(_addresses(spark, 2), fake_client, SCHEMA, batch_size=0)
