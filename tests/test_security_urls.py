"""Password add/remove state ops and URL/domain pipeline ops."""

from __future__ import annotations

import pyspark.sql.functions as F

from stirling_pdf_spark.operators.pageops import (
    add_password,
    remove_password,
)
from stirling_pdf_spark.operators.textstats import domain_caps, extract_urls

DOCS_SCHEMA = ("doc_id string, spans array<struct<kind:string,text:string,"
               "media_ref:string,offset:int>>")


def _doc_with_meta(spark):
    spans = [
        dict(kind="meta", text="title|T", media_ref="", offset=0),
        dict(kind="meta", text="is_encrypted|true", media_ref="", offset=1),
        dict(kind="meta", text="encrypt_algorithm|AESV3", media_ref="",
             offset=2),
        dict(kind="meta", text="encrypt_keylen|256", media_ref="",
             offset=3),
        dict(kind="meta", text="perm_can_print|false", media_ref="",
             offset=4),
    ]
    return spark.createDataFrame([("doc-a", spans)], DOCS_SCHEMA)


def _metas(row):
    return dict(s["text"].split("|", 1) for s in row["spans"]
                if s["kind"] == "meta")


def test_add_password_with_password_sets_aes(spark):
    out = add_password(_doc_with_meta(spark), user_password="u",
                       key_length=256, prevent_printing=True)
    m = _metas(out.collect()[0])
    assert m["is_encrypted"] == "true"
    assert m["encrypt_algorithm"] == "AESV3"
    assert m["encrypt_keylen"] == "256"
    assert m["encrypt_revision"] == "6"
    assert m["perm_can_print"] == "false"
    assert m["perm_can_modify"] == "true"
    assert m["title"] == "T"          # Info-dict untouched


def test_add_password_permissions_only_branch(spark):
    # both passwords empty -> protect() still runs, PDFBox default
    # 40-bit security (the '_permissions.pdf' branch)
    out = add_password(_doc_with_meta(spark), key_length=256)
    m = _metas(out.collect()[0])
    assert (m["encrypt_algorithm"], m["encrypt_keylen"],
            m["encrypt_revision"]) == ("RC4", "40", "2")


def test_remove_password_wipes_security_state(spark):
    out = remove_password(_doc_with_meta(spark), password="u")
    m = _metas(out.collect()[0])
    assert m["is_encrypted"] == "false"
    assert "encrypt_algorithm" not in m
    assert "encrypt_keylen" not in m
    assert "perm_can_print" not in m
    assert m["title"] == "T"


def _doc_with_sig_field(spark):
    spans = [
        dict(kind="text", text="1|72.0|72.0|11.0|Helvetica\thello",
             media_ref="", offset=0),
        dict(kind="formfield", text="sig0|signature|", media_ref="",
             offset=1),
        dict(kind="formfield", text="f0|text|v", media_ref="", offset=2),
    ]
    return spark.createDataFrame([("doc-a", spans)], DOCS_SCHEMA)


def test_add_cert_sign_appends_field_and_dict(spark):
    from stirling_pdf_spark.operators.pageops import add_cert_sign

    out = add_cert_sign(_doc_with_sig_field(spark), signer="CN=Me",
                        date="2026-01-02", reason="ok", location="HQ")
    [row] = out.collect()
    texts = [s["text"] for s in row["spans"]]
    # one signature field already present -> new field named sig1
    assert "sig1|signature|" in texts
    assert ("sig_1|CN=Me|2026-01-02|ok|HQ|ETSI.CAdES.detached|true"
            in texts)
    assert [s["offset"] for s in row["spans"]] == list(range(5))


def test_remove_cert_sign_drops_fields_and_dicts_only(spark):
    from stirling_pdf_spark.operators.pageops import (
        add_cert_sign, remove_cert_sign,
    )

    signed = add_cert_sign(_doc_with_sig_field(spark), signer="CN=Me",
                           date="d", reason="", location="")
    [row] = remove_cert_sign(signed).collect()
    kinds_texts = [(s["kind"], s["text"]) for s in row["spans"]]
    assert kinds_texts == [
        ("text", "1|72.0|72.0|11.0|Helvetica\thello"),
        ("formfield", "f0|text|v"),   # non-signature field survives
    ]
    assert [s["offset"] for s in row["spans"]] == [0, 1]


def test_validate_signatures_rows_and_validity(spark):
    from stirling_pdf_spark.operators.pageops import validate_signatures

    rows = [
        ("doc-a", [dict(
            kind="meta",
            text="sig_0|CN=A|2026-02-03|approve|NYC|adbe.pkcs7.detached|true",
            media_ref="", order=0)]),
        # malformed: missing slots -> valid=false
        ("doc-b", [dict(kind="meta", text="sig_0|CN=B|d",
                        media_ref="", order=0)]),
        ("doc-c", [dict(kind="meta", text="title|T", media_ref="",
                        order=0)]),
    ]
    schema = ("doc_id string, spans array<struct<kind:string,text:string,"
              "media_ref:string,order:int>>")
    df = spark.createDataFrame(rows, schema)
    got = {r["doc_id"]: r for r in validate_signatures(df).collect()}
    assert set(got) == {"doc-a", "doc-b"}     # doc-c: no signatures
    a = got["doc-a"]
    assert (a["sig_no"], a["signer_name"], a["signature_date"],
            a["reason"], a["location"], a["subfilter"]) == (
        0, "CN=A", "2026-02-03", "approve", "NYC", "adbe.pkcs7.detached")
    assert a["covers_document"] is True and a["valid"] is True
    b = got["doc-b"]
    assert b["valid"] is False and b["covers_document"] is False


def test_extract_urls_positions_and_domains(spark):
    df = spark.createDataFrame(
        [("d1", "pre https://a.example.com/x?q=1 mid www.b.org end"),
         ("d2", "no urls here"),
         ("d3", "https://c.net")],
        "doc_id string, text string")
    rows = {(r["id"], r["pos"]): (r["url"], r["domain"])
            for r in extract_urls(df).collect()}
    assert rows[("d1", 0)] == ("https://a.example.com/x?q=1",
                               "a.example.com")
    assert rows[("d1", 1)] == ("www.b.org", "www.b.org")
    assert rows[("d3", 0)] == ("https://c.net", "c.net")
    assert not any(k[0] == "d2" for k in rows)


def test_domain_caps_keeps_n_per_domain_and_passes_urlless(spark):
    rows = [(f"d{i}", f"x https://dom{i % 2}.com/p{i}") for i in range(10)]
    rows.append(("d-none", "plain text"))
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = domain_caps(df, max_per_domain=3).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r["id"])
    assert len(by_dom[None]) == 1         # URL-less passes uncapped
    assert len(by_dom["dom0.com"]) == 3
    assert len(by_dom["dom1.com"]) == 3
    # deterministic: same result on rerun
    out2 = domain_caps(df, max_per_domain=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_domain_caps_rank_matches_md5_order(spark):
    import hashlib

    ids = [f"d{i}" for i in range(6)]
    df = spark.createDataFrame(
        [(i, "z https://one.com/") for i in ids],
        "doc_id string, text string")
    kept = sorted(r["id"] for r in domain_caps(df, 2).collect())
    want = sorted(sorted(ids, key=lambda s: (
        hashlib.md5(s.encode()).hexdigest(), s))[:2])
    assert kept == want
