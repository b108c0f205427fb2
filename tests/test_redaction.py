"""PII redaction (operators/redaction.py) against constructed rows —
the fixture corpus is verified digit-free, so truth is built here."""

from __future__ import annotations

from web3_flight_rpc_server_spark.operators.redaction import (
    redaction_report,
)


def _report(spark, rows):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )
    return {r.doc_id: r for r in redaction_report(df).collect()}


def test_each_class_redacts_and_counts(spark):
    out = _report(spark, [
        "contact bob.smith+x@example.co.uk for details",
        "server at 192.168.1.254 timed out",
        "card 4111 1111 1111 1111 declined",
        "ssn 078-05-1120 on file",
        "call +1 555 867 5309 or (555) 867-5309",
        "no pii here at all",
    ])
    assert out[0].redacted == "contact <EMAIL> for details"
    assert out[0].n_email == 1 and not out[0].clean
    assert out[1].redacted == "server at <IP> timed out"
    assert out[1].n_ip == 1
    assert out[2].redacted == "card <CARD> declined"
    assert out[2].n_card == 1
    assert out[3].redacted == "ssn <SSN> on file"
    assert out[3].n_ssn == 1
    assert out[4].redacted == "call <PHONE> or <PHONE>"
    assert out[4].n_phone == 2
    assert out[5].redacted == "no pii here at all"
    assert out[5].clean
    assert all(
        out[5][f"n_{c}"] == 0
        for c in ("email", "ip", "card", "ssn", "phone")
    )


def test_class_precedence_card_and_ip_before_phone(spark):
    """A card number must not be half-eaten by the phone pattern, and
    a dotted quad must not be mistaken for digits of a phone."""
    out = _report(spark, [
        "pay 4111-1111-1111-1111 now",
        "ping 10.0.0.1 then dial 555-867-5309",
    ])
    assert out[0].redacted == "pay <CARD> now"
    assert out[0].n_card == 1 and out[0].n_phone == 0
    assert out[1].redacted == "ping <IP> then dial <PHONE>"
    assert out[1].n_ip == 1 and out[1].n_phone == 1


def test_card_length_range_13_to_19(spark):
    """Card coverage spans real PAN lengths: 13-digit Visa through
    19-digit Maestro/UnionPay, with or without separators; a 20-digit
    run is not a PAN and must pass through."""
    out = _report(spark, [
        "visa 4222222222222 ok",                     # 13 digits
        "maestro 6759 6498 2643 8453 983 ok",        # 19 digits
        "counter 12345678901234567890 ok",           # 20 digits: not a card
    ])
    assert out[0].redacted == "visa <CARD> ok"
    assert out[0].n_card == 1
    assert out[1].redacted == "maestro <CARD> ok"
    assert out[1].n_card == 1
    assert out[2].redacted == "counter 12345678901234567890 ok"
    assert out[2].clean


def test_surrounding_text_preserved(spark):
    out = _report(spark, ["a@b.io;c@d.io, end"])
    assert out[0].redacted == "<EMAIL>;<EMAIL>, end"
    assert out[0].n_email == 2


def test_fixture_corpus_is_clean(spark, sf_dir):
    from web3_flight_rpc_server_spark.sources import tables

    docs = tables.load_table(spark, sf_dir, "documents")
    rep = redaction_report(docs)
    assert rep.where(~rep.clean).count() == 0


def test_long_digit_runs_not_half_redacted(spark):
    """Blockchain-ish numbers (uint256 values, tx-hash digit spans,
    order ids) must pass through untouched: the phone pattern pins its
    start to a non-digit context so it cannot eat a 13-digit suffix of
    a longer run."""
    rows = [
        "block 18446744073709551615 mined",
        "tx 0x1234567890123456789 pending",
        "order 99999999999999999999 shipped",
    ]
    out = _report(spark, rows)
    for i, t in enumerate(rows):
        assert out[i].redacted == t, out[i].redacted
        assert out[i].clean
