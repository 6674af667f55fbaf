"""Mail sink (S9): compose + deliver_mbox roundtrip.

Hash-exactness of the composed messages vs DuckDB is the registered
oracle (test_oracle_parity); here the DELIVERY surface is exercised:
the mbox parts must parse back with the stdlib mailbox reader into
exactly the composed messages, separator-looking body lines must be
quoted, and the SMTP stub must refuse loudly."""

from __future__ import annotations

import glob
import mailbox
import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_mbox_roundtrip_matches_composed_messages(spark, tmp_path):
    from realparse_spark.sinks.mail import deliver_mbox, q_report_mail

    msgs = q_report_mail(spark, SF)
    expected = {
        r.to_addr: (r.subject, r.body) for r in msgs.collect()
    }
    out = str(tmp_path / "outbox")
    deliver_mbox(msgs, out)

    # concatenate the distributed parts (mbox is concatenable by design)
    combined = str(tmp_path / "all.mbox")
    with open(combined, "w") as dst:
        for part in sorted(glob.glob(os.path.join(out, "part-*"))):
            with open(part) as src:
                dst.write(src.read())
    got = {}
    for m in mailbox.mbox(combined):
        body = m.get_payload().rstrip("\n")
        # the reader does NOT undo >From quoting; reverse it here
        body = "\n".join(
            line[1:] if line.startswith(">From ") else line
            for line in body.split("\n")
        )
        got[m["To"]] = (m["Subject"], body)
    assert got == expected


def test_mbox_quotes_separator_lines(spark, tmp_path):
    from realparse_spark.sinks.mail import deliver_mbox

    msgs = spark.createDataFrame(
        [("a@example.com", "s", "line one\nFrom the archive\nlast")],
        "to_addr string, subject string, body string",
    )
    out = str(tmp_path / "outbox")
    deliver_mbox(msgs, out)
    text = "".join(
        open(p).read() for p in sorted(glob.glob(os.path.join(out, "part-*")))
    )
    assert ">From the archive" in text
    # exactly one real separator: the quoted body line doesn't split the msg
    assert sum(1 for ln in text.split("\n") if ln.startswith("From ")) == 1
    parsed = list(mailbox.mbox(_write(tmp_path, text)))
    assert len(parsed) == 1


def _write(tmp_path, text: str) -> str:
    p = str(tmp_path / "one.mbox")
    with open(p, "w") as fh:
        fh.write(text)
    return p


def test_smtp_transport_is_a_loud_stub(spark):
    from realparse_spark.sinks.mail import smtp_transport

    with pytest.raises(NotImplementedError, match="deliver_mbox"):
        smtp_transport(spark.range(0).select(F.lit("x").alias("to_addr")), "localhost")
