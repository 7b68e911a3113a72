"""Notion source (S6): golden parity vs the live reference
(fixtures/golden_notion.json ← tools/gen_notion_goldens.mjs), block
flattening, paginated fetch orchestration, page/db autodetect, and the
Spark path into the normal extract stage."""

from __future__ import annotations

import json
import os

import pytest

from src_to_kb_spark.sources.notion import (
    NotionAPIError,
    blocks_to_text,
    fetch_all_blocks,
    fetch_by_url,
    flatten_block_tree,
    get_page_title,
    notion_pages_df,
    page_to_document,
)

FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "fixtures", "golden_notion.json"
)
with open(FIXTURE, encoding="utf-8") as f:
    GOLD = json.load(f)


@pytest.mark.parametrize("case", list(GOLD["blocks_to_text"].keys()))
def test_blocks_to_text_golden_parity(case):
    g = GOLD["blocks_to_text"][case]
    assert blocks_to_text(g["blocks"]) == g["expected"], case


def test_page_title_golden_parity():
    for g in GOLD["page_titles"]:
        assert get_page_title(g["page"]) == g["expected"]


def test_page_id_golden_parity():
    from src_to_kb_spark.functions.misc import (
        extract_notion_page_id,
        format_notion_page_id,
    )

    for g in GOLD["page_ids"]:
        assert extract_notion_page_id(g["url"]) == g["extracted"]
    for g in GOLD["format_ids"]:
        assert format_notion_page_id(g["id"]) == g["formatted"]


def test_flatten_is_depth_first_preorder():
    tree = [
        {"id": "a", "children": [
            {"id": "a1"},
            {"id": "a2", "children": [{"id": "a2x"}]},
        ]},
        {"id": "b"},
    ]
    assert [b["id"] for b in flatten_block_tree(tree)] == [
        "a", "a1", "a2", "a2x", "b"
    ]


def test_fetch_all_blocks_pagination_and_recursion():
    """Injected lister with 2 result pages and a nested child — flat
    order must interleave children right after their parent, exactly
    like the reference's fetchAllBlocks loop."""
    store = {
        ("root", None): {
            "results": [
                {"id": "r1", "has_children": True},
                {"id": "r2"},
            ],
            "has_more": True,
            "next_cursor": "c1",
        },
        ("root", "c1"): {"results": [{"id": "r3"}], "has_more": False},
        ("r1", None): {"results": [{"id": "r1a"}], "has_more": False},
    }
    calls = []

    def lister(block_id, cursor):
        calls.append((block_id, cursor))
        return store[(block_id, cursor)]

    got = fetch_all_blocks("root", lister)
    assert [b["id"] for b in got] == ["r1", "r1a", "r2", "r3"]
    assert calls == [("root", None), ("r1", None), ("root", "c1")]


def test_fetch_by_url_autodetect():
    url = "https://notion.so/X-0123456789abcdef0123456789abcdef"
    fid = "01234567-89ab-cdef-0123-456789abcdef"

    # database detected
    got = fetch_by_url(
        url,
        retrieve_database=lambda i: {"object": "database"},
        fetch_database=lambda i: [{"db_page": i}],
        fetch_page=lambda i: {"page": i},
    )
    assert got == [{"db_page": fid}]

    # object_not_found -> page fallback
    def nf(i):
        raise NotionAPIError("object_not_found")

    got = fetch_by_url(
        url, retrieve_database=nf,
        fetch_database=lambda i: [], fetch_page=lambda i: {"page": i},
    )
    assert got == [{"page": fid}]

    # auth failure -> fail fast, NO page fallback
    def unauthorized(i):
        raise NotionAPIError("unauthorized")

    with pytest.raises(NotionAPIError, match="Invalid Notion API key"):
        fetch_by_url(
            url, retrieve_database=unauthorized,
            fetch_database=lambda i: [], fetch_page=lambda i: {"page": i},
        )

    with pytest.raises(ValueError, match="Could not extract ID"):
        fetch_by_url(
            "https://notion.so/nope", retrieve_database=nf,
            fetch_database=lambda i: [], fetch_page=lambda i: {},
        )


def test_page_to_document_shape_and_determinism():
    page = {
        "id": "01234567-89ab-cdef-0123-456789abcdef",
        "url": "https://notion.so/X",
        "last_edited_time": "2024-03-01T10:00:00.000Z",
        "created_time": "2024-01-01T00:00:00.000Z",
        "properties": {"title": {"title": [{"plain_text": "T"}]}},
    }
    blocks = GOLD["blocks_to_text"]["headings_and_paragraphs"]["blocks"]
    d1 = page_to_document(page, blocks)
    d2 = page_to_document(page, blocks)
    assert d1 == d2  # deterministic id (divergence from randomBytes)
    assert d1["relativePath"] == f"notion/{page['id']}"
    assert d1["metadata"]["language"] == "markdown"
    assert d1["size"] == len(d1["content"].encode("utf-8"))
    assert d1["title"] == "T"


def test_notion_rows_enter_extract_stage(spark):
    """Rendered Notion pages flow through the NORMAL extract stage —
    the connector emits the standard pages schema."""
    from src_to_kb_spark.operators.extract import extract_pages

    page = {
        "id": "01234567-89ab-cdef-0123-456789abcdef",
        "last_edited_time": "2024-03-01T10:00:00.000Z",
        "properties": {"Name": {"title": [{"plain_text": "Doc"}]}},
    }
    tree = [
        {"type": "heading_1", "heading_1": {"rich_text": [{"plain_text": "H"}]},
         "children": [
             {"type": "paragraph",
              "paragraph": {"rich_text": [{"plain_text": "nested body"}]}},
         ]},
        {"type": "bulleted_list_item",
         "bulleted_list_item": {"rich_text": [{"plain_text": "item"}]}},
    ]
    pages = notion_pages_df(spark, [(page, tree)])
    docs = extract_pages(pages).collect()
    assert len(docs) == 1
    row = docs[0]
    assert row["url"] == f"notion/{page['id']}"
    assert row["lang"] == "markdown"
    # flattened child paragraph made it into the rendered text
    assert "nested body" in row["text"] and row["text"].startswith("# H")
    exp = blocks_to_text(flatten_block_tree(tree))
    assert row["text"] == exp


def test_fetch_by_url_page_path_error_mapping():
    """The page-path fallback maps Notion error codes to the
    reference's friendly page-flavored messages (fetchPage,
    notion-source.js:108-127)."""
    url = "https://notion.so/X-0123456789abcdef0123456789abcdef"

    def nf(i):
        raise NotionAPIError("object_not_found")

    def page_denied(i):
        raise NotionAPIError("restricted_resource")

    with pytest.raises(
        NotionAPIError,
        match="Access denied. Make sure the page is shared",
    ):
        fetch_by_url(
            url, retrieve_database=nf,
            fetch_database=lambda i: [], fetch_page=page_denied,
        )
