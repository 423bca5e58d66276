"""Temperature corpus mixing (training/mixing.py): weight math,
flattening direction, cap water-filling, deterministic sampling."""

from __future__ import annotations

import pytest

from open_source_search_engine_spark.training.mixing import (
    mix_summary, source_token_counts, temperature_rates,
    temperature_sample)

_PPM = 1_000_000


def _docs(spark, spec):
    """spec: {source: (n_docs, words_per_doc)} — deterministic corpus."""
    rows, did = [], 0
    for src, (n, w) in sorted(spec.items()):
        for i in range(n):
            rows.append((did, " ".join(f"w{did}x{j}" for j in range(w)), src))
            did += 1
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_alpha_one_is_identity(spark):
    docs = _docs(spark, {"big": (40, 10), "small": (5, 10)})
    counts = source_token_counts(docs).collect()
    total = sum(r["n_tokens"] for r in counts)
    rates = temperature_rates(counts, alpha=1.0, budget_tokens=total)
    assert rates == {"big": _PPM, "small": _PPM}


def test_alpha_zero_equalizes_token_budgets(spark):
    docs = _docs(spark, {"big": (40, 10), "small": (10, 10)})
    counts = source_token_counts(docs).collect()
    total = sum(r["n_tokens"] for r in counts)      # 500
    rates = temperature_rates(counts, alpha=0.0, budget_tokens=total)
    # each source gets total/2 tokens: big 250/400 = 0.625, small 250/100 = 2.5
    assert rates["big"] == 625_000
    assert rates["small"] == 2_500_000


def test_flattening_direction_and_budget_conservation(spark):
    docs = _docs(spark, {"mega": (100, 10), "mid": (20, 10), "tiny": (4, 10)})
    counts = source_token_counts(docs).collect()
    tok = {r["source"]: r["n_tokens"] for r in counts}
    total = sum(tok.values())
    rates = temperature_rates(counts, alpha=0.5, budget_tokens=total)
    # alpha<1 downsamples the mega-source, upsamples the tail
    assert rates["mega"] < _PPM < rates["tiny"]
    assert rates["tiny"] > rates["mid"] > rates["mega"]
    # expected token total == budget (to ppm rounding)
    got = sum(rates[s] * tok[s] for s in tok) / _PPM
    assert got == pytest.approx(total, rel=1e-4)


def test_cap_water_filling_redistributes(spark):
    docs = _docs(spark, {"mega": (1000, 10), "tiny": (2, 10)})
    counts = source_token_counts(docs).collect()
    tok = {r["source"]: r["n_tokens"] for r in counts}
    total = sum(tok.values())
    rates = temperature_rates(counts, alpha=0.0, budget_tokens=total,
                              max_upsample=3)
    # alpha=0 wants tiny at total/2 / 20 = 250x -> capped at 3x; the
    # shortfall flows back to the uncapped mega-source
    assert rates["tiny"] == 3 * _PPM
    assert rates["mega"] == round((total - 3 * tok["tiny"]) / tok["mega"]
                                  * _PPM)


def test_sample_deterministic_and_bounded(spark):
    docs = _docs(spark, {"mega": (200, 10), "tiny": (5, 10)})
    s1 = temperature_sample(docs, alpha=0.2, seed=7)
    s2 = temperature_sample(docs, alpha=0.2, seed=7)
    rows1 = sorted(tuple(r) for r in s1.collect())
    assert rows1 == sorted(tuple(r) for r in s2.collect())
    # copies bounded by ceil(factor): copy < factor_ppm/1e6 + 1
    # (row tuple = doc_id, source, copy, factor_ppm)
    assert all(copy * _PPM <= factor_ppm
               for _, _, copy, factor_ppm in rows1)
    # a different seed flips some downsample coins
    rows3 = sorted(tuple(r) for r in
                   temperature_sample(docs, alpha=0.2, seed=8).collect())
    assert rows1 != rows3


def test_sample_hits_token_budget(spark):
    docs = _docs(spark, {"a": (300, 10), "b": (60, 10), "c": (12, 10)})
    total = 3720
    out = mix_summary(temperature_sample(docs, alpha=0.3, seed=1), docs)
    mixed = {r["source"]: r["mixed_tokens"] for r in out.collect()}
    # hash-coin realization lands within a few percent of the budget
    assert sum(mixed.values()) == pytest.approx(total, rel=0.08)
    nat = {r["source"]: r["n_tokens"]
           for r in source_token_counts(docs).collect()}
    assert mixed["c"] > nat["c"]          # tail upsampled
    assert mixed["a"] < nat["a"]          # mega downsampled


def test_no_python_in_data_path(spark):
    docs = _docs(spark, {"a": (5, 4), "b": (3, 4)})
    plan = (temperature_sample(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "ArrowEval" not in plan
    assert "BroadcastHashJoin" in plan     # the rate table never shuffles
