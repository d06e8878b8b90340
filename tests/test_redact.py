"""PII redaction: rule coverage, ordering, and clean-text passthrough."""

from pyspark.sql import functions as F

from rabitq_spark.functions.redact import pii_count, redact_pii


def test_redact_rules_and_counts(spark):
    rows = [
        ("a@b.com and c.d-e@f.org.uk", "[EMAIL] and [EMAIL]", 2, 0, 0),
        ("server 192.168.0.1 or 10.0.0.255", "server [IP] or [IP]", 0, 2, 0),
        ("call 555-1234 then 555-0000", "call [PHONE] then [PHONE]", 0, 0, 2),
        ("mix a@b.io 1.2.3.4 555-9999", "mix [EMAIL] [IP] [PHONE]", 1, 1, 1),
        ("no pii here at all", "no pii here at all", 0, 0, 0),
    ]
    df = spark.createDataFrame(
        [(t,) for t, *_ in rows], ["text"]
    ).select(
        "text",
        redact_pii("text").alias("red"),
        pii_count("text", "email").alias("ne"),
        pii_count("text", "ipv4").alias("ni"),
        pii_count("text", "phone").alias("np"),
    )
    got = {r["text"]: r for r in df.collect()}
    for text, red, ne, ni, np_ in rows:
        r = got[text]
        assert r["red"] == red, (text, r["red"])
        assert (r["ne"], r["ni"], r["np"]) == (ne, ni, np_), text


def test_email_rule_consumes_before_ip_rule(spark):
    # a dotted-quad inside an email's local part must become [EMAIL], not [IP]
    df = spark.createDataFrame([("x 1.2.3.4@host.com y",)], ["t"]).select(
        redact_pii("t").alias("red")
    )
    assert df.first()["red"] == "x [EMAIL] y"
