"""PII profile + redaction (training/pii.py)."""

from __future__ import annotations

from open_source_search_engine_spark.training.pii import (pii_profile,
                                                          pii_redact)


def _one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    prof = pii_profile(df).collect()[0].asDict()
    red = pii_redact(df).collect()[0]["text"]
    return prof, red


def test_email_and_ip(spark):
    prof, red = _one(spark, "mail Bob.Smith+x@sub.Example.org at 10.0.0.255")
    assert prof["n_email"] == 1 and prof["n_ipv4"] == 1
    assert prof["n_pii"] == 2
    assert red == "mail [EMAIL] at [IP]"


def test_ssn_vs_phone_precedence(spark):
    prof, red = _one(spark, "ssn 123-45-6789 phone 555-123-4567")
    assert prof["n_ssn"] == 1 and prof["n_phone"] == 1
    # SSN redacts first, so the phone match is untouched by it
    assert red == "ssn [SSN] phone [PHONE]"


def test_clean_text_untouched(spark):
    prof, red = _one(spark, "plain words, versions 1.2 and 3-4, no pii")
    assert prof["n_pii"] == 0
    assert red == "plain words, versions 1.2 and 3-4, no pii"


def test_no_shuffle_no_udf(spark):
    """Linear scan: the profile plan must contain no exchange and no
    Python eval node."""
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = pii_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
