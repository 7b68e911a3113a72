"""Notion source connector (S6) — the reference's second ingest
source, hermetically re-expressed.

The reference (/root/reference/notion-source.js) fetches a page or
database over the Notion API, flattens the block tree depth-first
(fetchAllBlocks, notion-source.js:58-88), renders the 24-way
block-type→markdown conversion (blocksToText, :234-322), and emits KB
documents (pageToDocument, :337-360) with page/database autodetect
(fetchByUrl, :366-408).

Everything network-shaped is an injected callable (the same hermetic
pattern as sinks/rest.py); everything else is a pure function, pinned
byte-identical to the reference by goldens generated from the live
reference (tools/gen_notion_goldens.mjs → fixtures/golden_notion.json).

Scale shape: one page's payload (page JSON + flat block list) is one
row; the render is a batched Arrow UDF; the output rows enter the
normal ``pages`` schema and flow through the standard extract stage —
the connector adds ZERO new distributed machinery.

Deliberate divergence: the reference's ``pageToDocument`` draws a
RANDOM doc id (crypto.randomBytes, notion-source.js:341) — here the id
is md5(page id) so runs are deterministic (SURVEY.md §7.4 hard-part 3).
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.textproc import JS_WHITESPACE
from ..functions.misc import extract_notion_page_id, format_notion_page_id


class NotionAPIError(RuntimeError):
    """Carries the Notion error ``code`` the reference switches on."""

    def __init__(self, code: str, message: str = "") -> None:
        super().__init__(message or code)
        self.code = code


# ---------------------------------------------------------------------------
# pure functions (golden-pinned)
# ---------------------------------------------------------------------------

def extract_rich_text(rich) -> str:
    """notion-source.js:224-229 — join plain_text over the array;
    non-arrays and missing plain_text collapse to ''."""
    if not isinstance(rich, list):
        return ""
    return "".join(
        (rt.get("plain_text") or "") if isinstance(rt, dict) else ""
        for rt in rich
    )


def _js_truthy(v) -> bool:
    """JS truthiness for JSON values: null/false/0/NaN/'' are falsy;
    arrays and objects are truthy EVEN WHEN EMPTY (unlike Python)."""
    if v is None or v is False:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return v != 0 and v == v  # 0 and NaN are falsy
    if isinstance(v, str):
        return v != ""
    return True


def blocks_to_text(blocks: list[dict]) -> str:
    """notion-source.js:234-322 — the 24-way block→markdown switch,
    byte-identical (incl. the always-'1.' numbered-list quirk and the
    JS-falsy '' fallbacks)."""
    text = ""
    for block in blocks:
        btype = block.get("type")
        data = block.get(btype) if btype else None
        if not isinstance(data, dict):
            continue
        # notion-source.js:245-250 picks the content source by JS
        # TRUTHINESS (a present-but-null rich_text falls through to
        # caption/title), not key presence — mirror that exactly.
        if _js_truthy(data.get("rich_text")):
            content = extract_rich_text(data.get("rich_text"))
        elif _js_truthy(data.get("caption")):
            content = extract_rich_text(data.get("caption"))
        elif _js_truthy(data.get("title")):
            content = extract_rich_text(data.get("title"))
        else:
            content = ""

        if btype == "heading_1":
            text += f"\n# {content}\n\n"
        elif btype == "heading_2":
            text += f"\n## {content}\n\n"
        elif btype == "heading_3":
            text += f"\n### {content}\n\n"
        elif btype == "paragraph":
            text += f"{content}\n\n"
        elif btype == "bulleted_list_item":
            text += f"- {content}\n"
        elif btype == "numbered_list_item":
            text += f"1. {content}\n"  # reference quirk: literal '1.'
        elif btype == "to_do":
            checked = "✅" if data.get("checked") else "☐"
            text += f"{checked} {content}\n"
        elif btype == "toggle":
            text += f"▶ {content}\n"
        elif btype == "quote":
            text += f"> {content}\n\n"
        elif btype == "callout":
            icon = (data.get("icon") or {}).get("emoji") or "\U0001f4a1"
            text += f"{icon} {content}\n\n"
        elif btype == "code":
            language = data.get("language") or ""
            text += f"```{language}\n{content}\n```\n\n"
        elif btype == "divider":
            text += "---\n\n"
        elif btype == "table":
            text += f"[Table: {content or 'Table content'}]\n\n"
        elif btype in ("image", "file", "video", "pdf"):
            caption = (
                extract_rich_text(data.get("caption"))
                if data.get("caption")
                else ""
            )
            url = (
                (data.get("file") or {}).get("url")
                or (data.get("external") or {}).get("url")
                or ""
            )
            text += f"[{btype}: {caption or url}]\n\n"
        elif btype == "bookmark":
            burl = data.get("url") or ""
            bcap = (
                extract_rich_text(data.get("caption"))
                if data.get("caption")
                else ""
            )
            text += f"\U0001f516 {bcap or burl}\n{burl}\n\n"
        elif btype == "equation":
            text += f"${content}$\n\n"
        else:
            if content:
                text += f"{content}\n\n"
    return text.strip(JS_WHITESPACE)  # JS String.trim (ECMA ws set)


def get_page_title(page: dict) -> str:
    """notion-source.js:327-335 — properties.title / properties.Name /
    'Untitled'."""
    props = page.get("properties") or {}
    for key in ("title", "Name"):
        arr = ((props.get(key) or {}).get("title")) or []
        if arr and isinstance(arr[0], dict) and arr[0].get("plain_text"):
            return arr[0]["plain_text"]
    return "Untitled"


def flatten_block_tree(blocks: list[dict]) -> list[dict]:
    """Depth-first pre-order flattening — the pure twin of
    fetchAllBlocks' recursion (notion-source.js:58-88): each block,
    then its entire subtree, then the next sibling.  Fixture trees
    carry children under a ``children`` key."""
    out: list[dict] = []
    for b in blocks:
        out.append(b)
        kids = b.get("children")
        if kids:
            out.extend(flatten_block_tree(kids))
    return out


def page_to_document(page: dict, blocks: list[dict]) -> dict:
    """notion-source.js:337-360 (deterministic id divergence noted in
    the module docstring)."""
    content = blocks_to_text(blocks)
    page_id = page.get("id", "")
    return {
        "id": hashlib.md5(f"notion:{page_id}".encode()).hexdigest()[:16],
        "title": get_page_title(page),
        "content": content,
        "relativePath": f"notion/{page_id}",
        "size": len(content.encode("utf-8")),
        "metadata": {
            "source": "notion",
            "notionPageId": page_id,
            "notionUrl": page.get("url"),
            "lastEditedTime": page.get("last_edited_time"),
            "createdTime": page.get("created_time"),
            "language": "markdown",
        },
    }


# ---------------------------------------------------------------------------
# injected-I/O orchestration (hermetic twins of the fetch paths)
# ---------------------------------------------------------------------------

def fetch_all_blocks(
    block_id: str, list_children: Callable[[str, str | None], dict]
) -> list[dict]:
    """notion-source.js:58-88 — paginated depth-first fetch.
    ``list_children(block_id, cursor)`` returns the API page shape
    {results, has_more, next_cursor}; blocks with ``has_children``
    recurse before the next sibling."""
    all_blocks: list[dict] = []
    cursor: str | None = None
    has_more = True
    while has_more:
        resp = list_children(block_id, cursor) or {}
        for block in resp.get("results") or []:
            all_blocks.append(block)
            if block.get("has_children"):
                all_blocks.extend(
                    fetch_all_blocks(block["id"], list_children)
                )
        has_more = bool(resp.get("has_more"))
        cursor = resp.get("next_cursor")
    return all_blocks


_PAGE_ERRORS = {
    "unauthorized": "Invalid Notion API key. Please check your integration token.",
    "restricted_resource": "Access denied. Make sure the page is shared with your integration.",
    "object_not_found": "Page not found. Make sure the page is shared with your integration.",
    "validation_error": "Invalid page ID format.",
}

_DB_ERRORS = {
    "unauthorized": "Invalid Notion API key. Please check your integration token.",
    "restricted_resource": "Database access denied. Make sure the database is shared with your integration.",
    "validation_error": "Invalid database ID format.",
}


def fetch_by_url(
    url: str,
    retrieve_database: Callable[[str], dict],
    fetch_database: Callable[[str], list[dict]],
    fetch_page: Callable[[str], dict],
) -> list[dict]:
    """notion-source.js:366-408 — page/database autodetect: try the id
    as a database first; ONLY object_not_found falls back to the page
    path; auth/permission/validation errors fail fast."""
    page_id = extract_notion_page_id(url)
    if not page_id:
        raise ValueError("Invalid Notion URL. Could not extract ID")
    formatted = format_notion_page_id(page_id)
    try:
        response = retrieve_database(formatted)
    except NotionAPIError as e:
        if e.code == "object_not_found":
            # page path: apply the page-flavored error mapping
            # (notion-source.js:108-127) around the injected fetcher
            try:
                return [fetch_page(formatted)]
            except NotionAPIError as pe:
                if pe.code in _PAGE_ERRORS:
                    raise NotionAPIError(
                        pe.code, _PAGE_ERRORS[pe.code]
                    ) from pe
                raise NotionAPIError(
                    pe.code, f"Notion API error: {pe}"
                ) from pe
        if e.code in _DB_ERRORS:
            raise NotionAPIError(e.code, _DB_ERRORS[e.code]) from e
        raise NotionAPIError(
            e.code, f"Notion API error: {e}"
        ) from e
    if (response or {}).get("object") == "database":
        return fetch_database(formatted)
    raise NotionAPIError("unknown", "Unable to determine resource type")


# ---------------------------------------------------------------------------
# Spark integration: payload rows → pages-shape DataFrame
# ---------------------------------------------------------------------------

_RENDER_SCHEMA = (
    "struct<url: string, title: string, text: string, size: long,"
    " notion_page_id: string, last_edited_time: string>"
)


def make_notion_render_udf():
    """pandas UDF: (page_json, blocks_json) → rendered document struct.
    One Arrow batch renders many pages; the block flatten + markdown
    conversion is plain Python string work — exactly the kind of
    per-row logic that belongs in a vectorized batch, not a join."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_RENDER_SCHEMA)
    def render_udf(page_json: pd.Series, blocks_json: pd.Series) -> pd.DataFrame:
        rows = []
        for pj, bj in zip(page_json, blocks_json):
            page = json.loads(pj) if pj else {}
            blocks = flatten_block_tree(json.loads(bj) if bj else [])
            doc = page_to_document(page, blocks)
            rows.append(
                (
                    doc["relativePath"],
                    doc["title"],
                    doc["content"],
                    doc["size"],
                    doc["metadata"]["notionPageId"],
                    doc["metadata"]["lastEditedTime"],
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "url", "title", "text", "size", "notion_page_id",
                "last_edited_time",
            ],
        )

    return render_udf


def notion_payloads_to_pages(payloads: DataFrame) -> DataFrame:
    """payloads(page_json string, blocks_json string) → the standard
    ``pages`` schema (url, warc_ts, html, text, lang) so Notion pages
    enter the normal extract stage unchanged downstream."""
    udf = make_notion_render_udf()
    rendered = payloads.select(
        udf(F.col("page_json"), F.col("blocks_json")).alias("d")
    )
    return rendered.select(
        F.col("d.url").alias("url"),
        F.to_timestamp(F.col("d.last_edited_time")).alias("warc_ts"),
        F.encode(F.col("d.text"), "UTF-8").alias("html"),
        F.col("d.text").alias("text"),
        F.lit("markdown").alias("lang"),
    )


def notion_pages_df(
    spark: SparkSession, page_payloads: list[tuple[dict, list[dict]]]
) -> DataFrame:
    """Driver-side convenience: [(page, block_tree)] → pages DataFrame
    (test scale; at volume the payloads land as a JSON table first)."""
    rows = [
        (json.dumps(page), json.dumps(blocks))
        for page, blocks in page_payloads
    ]
    payloads = spark.createDataFrame(
        rows, "page_json string, blocks_json string"
    )
    return notion_payloads_to_pages(payloads)
