"""Form fill/delete/unlock and add-comments operators."""

from __future__ import annotations

from stirling_pdf_spark.kernel import wire
from stirling_pdf_spark.kernel.model import TextRun

DOCS_SCHEMA = ("doc_id string, spans array<struct<kind:string,text:string,"
               "media_ref:string,offset:int>>")


def _form_doc(spark):
    spans = [
        dict(kind="formfield", text="name0|text|old", media_ref="",
             offset=0),
        dict(kind="formfield", text="cb0|checkbox|Off", media_ref="",
             offset=1),
        dict(kind="formfield", text="sig0|signature|", media_ref="",
             offset=2),
        dict(kind="formfield", text="locked0|text|v|ro", media_ref="",
             offset=3),
        dict(kind="meta", text="title|T", media_ref="", offset=4),
    ]
    return spark.createDataFrame([("doc-a", spans)], DOCS_SCHEMA)


def _texts(row, kind="formfield"):
    return [s["text"] for s in row["spans"] if s["kind"] == kind]


def test_fill_form_by_name_checkbox_and_signature_skip(spark):
    from stirling_pdf_spark.operators.forms import fill_form

    [row] = fill_form(_form_doc(spark), {
        "name0": "new", "cb0": "true", "sig0": "evil",
        "absent": "x", "locked0": None,
    }).collect()
    assert _texts(row) == [
        "name0|text|new",
        "cb0|checkbox|Yes",
        "sig0|signature|",        # signature fields are skipped
        "locked0|text||ro",       # null -> '' like setValue(null->'')
    ]
    assert _texts(row, "meta") == ["title|T"]


def test_fill_form_checkbox_falsy_unchecks(spark):
    from stirling_pdf_spark.operators.forms import fill_form

    [row] = fill_form(_form_doc(spark), {"cb0": "nope"}).collect()
    assert "cb0|checkbox|Off" in _texts(row)


def test_delete_fields_reindexes(spark):
    from stirling_pdf_spark.operators.forms import delete_fields

    [row] = delete_fields(_form_doc(spark), ["cb0", "sig0"]).collect()
    assert _texts(row) == ["name0|text|old", "locked0|text|v|ro"]
    assert [s["offset"] for s in row["spans"]] == [0, 1, 2]


def test_unlock_forms_clears_ro_and_sets_need_appearances(spark):
    from stirling_pdf_spark.operators.forms import unlock_forms

    [row] = unlock_forms(_form_doc(spark)).collect()
    assert "locked0|text|v" in _texts(row)
    assert not any(t.endswith("|ro") for t in _texts(row))
    assert "need_appearances|true" in _texts(row, "meta")


def _page_doc(spark):
    runs = [TextRun(1, 72.0, 100.0, 11.0, "F", "Total Revenue."),
            TextRun(1, 72.0, 114.0, 11.0, "F", "amount $215,000 due"),
            TextRun(2, 72.0, 100.0, 11.0, "F", "second page line")]
    spans = [dict(kind="text", text=wire.encode_text_run(r),
                  media_ref="", offset=i) for i, r in enumerate(runs)]
    return spark.createDataFrame([("doc-a", spans)], DOCS_SCHEMA)


def _annots(row):
    return [s["text"] for s in row["spans"] if s["kind"] == "annotation"]


def test_add_comments_anchor_tolerant_match(spark):
    from stirling_pdf_spark.operators.comments import add_comments

    # '215000' must match '$215,000' (punctuation-stripped), icon at
    # the matched LINE's top-left, 20x20
    [row] = add_comments(_page_doc(spark), [
        {"pageIndex": 0, "anchorText": "215000", "x": 1.0, "y": 2.0,
         "width": 3.0, "height": 4.0, "text": "check this",
         "author": "alice", "subject": "fin"},
    ]).collect()
    assert _annots(row) == [
        "1|72.0|114.0|20.0|20.0\tText|check this|alice|fin"]


def test_add_comments_fallback_coords_and_positional_page(spark):
    from stirling_pdf_spark.operators.comments import add_comments

    [row] = add_comments(_page_doc(spark), [
        {"pageIndex": 1, "anchorText": "absent needle", "x": 10.0,
         "y": 700.0, "width": 30.0, "height": 40.0, "text": "n",
         "author": "a", "subject": "s"},
        {"pageIndex": 5, "x": 0.0, "y": 0.0, "width": 1.0,
         "height": 1.0, "text": "skipped", "author": "", "subject": ""},
    ]).collect()
    # fallback: screen y = 792 - 700 - 40 = 52, on positional page 2
    assert _annots(row) == ["2|10.0|52.0|30.0|40.0\tText|n|a|s"]


def test_add_comments_first_matching_line_wins(spark):
    from stirling_pdf_spark.operators.comments import add_comments

    [row] = add_comments(_page_doc(spark), [
        {"pageIndex": 0, "anchorText": "TOTAL revenue", "x": 0.0,
         "y": 0.0, "width": 1.0, "height": 1.0, "text": "t",
         "author": "a", "subject": "s"},
    ]).collect()
    assert _annots(row)[0].startswith("1|72.0|100.0|20.0|20.0\t")


def test_fields_csv_quoting_and_fill_first(spark):
    from stirling_pdf_spark.operators.forms import fields_csv

    [row] = fields_csv(_form_doc(spark),
                       values={"name0": 'a,"b"'}).collect()
    assert row["csv"] == (
        '"Field Name","Value"\n'
        '"name0","a,""b"""\n'
        '"cb0","Off"\n'
        '"sig0",""\n'
        '"locked0","v"\n')


def test_fields_csv_without_fill(spark):
    from stirling_pdf_spark.operators.forms import fields_csv

    [row] = fields_csv(_form_doc(spark)).collect()
    assert '"name0","old"' in row["csv"]
