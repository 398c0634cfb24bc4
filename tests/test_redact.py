"""PII redaction (operators/text.py redact_pii): pinned rules, counts on
the original text, sequential replacement (the contract twin covers the
DuckDB parity; this covers the semantics)."""

from __future__ import annotations

from search_engine_spark.operators.text import redact_pii


def _one(spark, text: str):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return redact_pii(df).collect()[0]


def test_redact_email_ip_idnum(spark):
    r = _one(
        spark,
        "reach a.b+c@sub.ex.io or 10.20.30.40, acct 123456789, pin 1234",
    )
    assert r["n_email"] == 1 and r["n_ipv4"] == 1 and r["n_idnum"] == 1
    assert r["text"] == "reach <EMAIL> or <IP>, acct <ID>, pin 1234"


def test_redact_counts_are_pre_replacement(spark):
    """An email's host digits must not double-count as ipv4/idnum, and a
    9-digit run counts even though the email rule runs first."""
    r = _one(spark, "x1@e2.io and 999999999")
    assert (r["n_email"], r["n_ipv4"], r["n_idnum"]) == (1, 0, 1)
    assert r["text"] == "<EMAIL> and <ID>"


def test_redact_boundaries(spark):
    r = _one(spark, "12345678 is short, 1.2.3.4.5 has a tail")
    assert r["n_idnum"] == 0  # 8 digits: below the 9-digit floor
    # leading 4 octets match; the trailing .5 survives
    assert r["n_ipv4"] == 1 and "<IP>.5" in r["text"]


def test_redact_multiple_and_no_pii(spark):
    r = _one(spark, "a@b.co c@d.io 1.1.1.1 2.2.2.2")
    assert r["n_email"] == 2 and r["n_ipv4"] == 2
    assert r["text"] == "<EMAIL> <EMAIL> <IP> <IP>"
    clean = _one(spark, "no pii here at all")
    assert (clean["n_email"], clean["n_ipv4"], clean["n_idnum"]) == (0, 0, 0)
    assert clean["text"] == "no pii here at all"
