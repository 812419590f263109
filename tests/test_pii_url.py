"""PII detection + URL canonicalization operators (round-12).

Direct operator evidence under crafted inputs — known Luhn vectors,
each normalization hazard separately — plus the cross-engine agreement
spot-check (the gated queries' value hashes are the full-corpus form).
"""

from __future__ import annotations

import duckdb
import pytest

from pipegen_spark.functions import dialect as dl


@pytest.fixture(scope="module")
def spark():
    from pipegen_spark.session import get_spark

    s = get_spark(
        "pii-url-tests",
        cpus="4",
        extra_conf={"spark.ui.enabled": "false",
                    "spark.sql.shuffle.partitions": "4"},
    )
    yield s


LUHN_VECTORS = [
    ("4532015112830366", 1),  # the canonical Luhn-valid test PAN
    ("4532015112830367", 0),
    ("1234567812345670", 1),
    ("1234567812345678", 0),
    ("0000000000000000", 1),
]


def test_luhn16_both_engines():
    con = duckdb.connect()
    for card, want in LUHN_VECTORS:
        got = con.execute(
            f"SELECT {dl.luhn16('c', dl.DUCK)} FROM (SELECT '{card}' AS c)"
        ).fetchone()[0]
        assert got == want, ("duck", card)


def test_luhn16_spark(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(LUHN_VECTORS, "c string, want int")
    rows = df.select(
        "want", F.expr(dl.luhn16("c", dl.SPARK)).alias("got")
    ).collect()
    for r in rows:
        assert r.got == r.want


def test_pii_stats_operator(spark):
    from pipegen_spark.operators.curation import pii_stats

    rows = [
        (1, "mail me at a.b+c@ex-ample.org or 10.0.0.1 thanks"),
        (2, "ssn 123-45-6789 card 4532015112830366 end"),
        (3, "card 4532015112830367 only"),  # luhn-invalid
        (4, None),
        (5, "two mails: x@y.io and z@w.co plus 1.2.3.4 5.6.7.8"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.asDict()
        for r in pii_stats(df).collect()
    }
    assert out[1]["n_emails"] == 1 and out[1]["n_ipv4"] == 1
    assert out[1]["n_ssn"] == 0 and out[1]["n_cards"] == 0
    assert out[2]["n_ssn"] == 1 and out[2]["n_cards"] == 1
    assert out[2]["card_luhn_ok"] == 1
    assert out[3]["card_luhn_ok"] == 0 and out[3]["n_cards"] == 1
    assert out[4] == {
        "doc_id": 4, "n_emails": 0, "n_ipv4": 0, "n_ssn": 0,
        "n_cards": 0, "card_luhn_ok": 0, "redacted_len": 0,
    }
    assert out[5]["n_emails"] == 2 and out[5]["n_ipv4"] == 2
    # redaction: every hit replaced by the fixed token
    src = rows[4][1]
    expect = (
        src.replace("x@y.io", "[PII]")
        .replace("z@w.co", "[PII]")
        .replace("1.2.3.4", "[PII]")
        .replace("5.6.7.8", "[PII]")
    )
    assert out[5]["redacted_len"] == len(expect)


URL_CASES = [
    ("HTTP://WWW.SiTe7.COM:80/p/7?utm_source=s9&id=7#f9",
     "http://site7.com/p/7?id=7"),
    ("http://www.site7.com/p/7/?id=7", "http://site7.com/p/7?id=7"),
    ("https://Site7.com:443/p/7?id=7", "https://site7.com/p/7?id=7"),
    ("http://site7.com/p/7?id=7&utm_x=1", "http://site7.com/p/7?id=7"),
    ("http://site7.com/", "http://site7.com"),
    ("https://a.org:8443/x?q=1", "https://a.org:8443/x?q=1"),  # non-default port kept
    ("http://b.net/path?UTM_up=1", "http://b.net/path?UTM_up=1"),  # case-sensitive param kept
]


def test_url_canon_both_engines(spark):
    from pyspark.sql import functions as F

    con = duckdb.connect()
    for raw, want in URL_CASES:
        got = con.execute(
            f"SELECT {dl.url_canon('u', dl.DUCK)} FROM (SELECT ? AS u)",
            [raw],
        ).fetchone()[0]
        assert got == want, ("duck", raw, got)
    df = spark.createDataFrame([(r,) for r, _ in URL_CASES], "u string")
    got = [r[0] for r in df.select(
        F.expr(dl.url_canon("u", dl.SPARK))
    ).collect()]
    for (raw, want), g in zip(URL_CASES, got):
        assert g == want, ("spark", raw, g)


def test_gated_queries_have_no_python_stage(spark):
    """Both new queries must stay JVM-side (regexp inside codegen) —
    no Arrow/Python stages in the physical plan."""
    from pipegen_spark.queries.training_data import (
        curate_pii_stats,
        dedup_url_canonical,
    )

    for fn in (curate_pii_stats, dedup_url_canonical):
        plan = fn(
            spark, "/root/testdata/sf0.001"
        )._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
