"""Pure-Python reference implementation of the whole KG pipeline —
the triple P/R oracle (SURVEY.md §5.4).

Independent of Spark: plain dicts/sets/hashlib over the documents
parquet (read via duckdb), sharing only core/textproc (itself pinned
byte-identical to the reference by goldens).  The P/R harness compares
this oracle's triple set to the Spark pipeline's output; the binding
target is P/R ≥ 0.95 (BASELINE.json) and we assert exact agreement.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import duckdb

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from src_to_kb_spark.core.textproc import clean_content, create_chunks
from src_to_kb_spark.functions.classify import LANG_MAP, TYPE_CODE, TYPE_CONFIG, TYPE_TEXT, TYPE_WEB
from src_to_kb_spark.sources.gazetteer import GAZ_ROWS
from src_to_kb_spark.sources.pages import PAGE_EXTS


def load_documents(sf_dir: str) -> list[dict]:
    rows = duckdb.sql(
        f"SELECT doc_id, text, lang, source FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    return [
        {"doc_id": d, "text": t, "lang": lg, "source": s}
        for d, t, lg, s in rows
    ]


def url_of(doc: dict) -> str:
    ext = PAGE_EXTS[doc["doc_id"] % 8]
    return (
        f"https://{doc['source']}.example.com/{doc['lang']}/doc-"
        f"{doc['doc_id']}{ext}"
    )


def ext_of(url: str) -> str:
    m = re.search(r"(\.[^./]+)$", url)
    return m.group(1).lower() if m else ""


def type_of(ext: str) -> str:
    if ext in TYPE_CODE:
        return "code"
    if ext in TYPE_TEXT:
        return "text"
    if ext in TYPE_CONFIG:
        return "config"
    if ext in TYPE_WEB:
        return "web"
    return "other"


def sha256(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def tokens_of(text: str) -> list[str]:
    # pinned ASCII tokenization — must match core/tokenize.ascii_tokens
    # (Python \s+/strip() would add Unicode whitespace semantics)
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", text.lower()) if w]


def best_entity(norm: str, n_mentions: int):
    cands = [(eid, canon, prior) for eid, canon, alias, nm, prior in GAZ_ROWS
             if nm == norm]
    if not cands:
        return None
    # score desc, entity_id asc
    return sorted(
        cands, key=lambda c: (-c[2] * n_mentions, c[0])
    )[0]


def shingle_set(text: str) -> set[str]:
    toks = tokens_of(text)
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def minhash_bands(sh: set[str], n_hashes: int = 8, n_bands: int = 2):
    sigs = []
    for i in range(n_hashes):
        sigs.append(
            min(hashlib.md5(f"{i}|{s}".encode()).hexdigest()[:16] for s in sh)
        )
    rpb = n_hashes // n_bands
    return [",".join(sigs[b * rpb : (b + 1) * rpb]) for b in range(n_bands)]


def neardup_pairs_py(docs: list[dict], threshold: float) -> set[tuple[str, str]]:
    sh = {url_of(d): shingle_set(clean_content(d["text"])) for d in docs}
    sh = {k: v for k, v in sh.items() if v}
    buckets: dict[tuple[int, str], list[str]] = {}
    for k, s in sh.items():
        for b, sig in enumerate(minhash_bands(s)):
            buckets.setdefault((b, sig), []).append(k)
    cands = set()
    for ks in buckets.values():
        ks = sorted(ks)
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                cands.add((ks[i], ks[j]))
    out = set()
    for a, b in cands:
        inter = len(sh[a] & sh[b])
        jac = inter / (len(sh[a]) + len(sh[b]) - inter)
        if round(jac, 6) >= threshold:
            out.add((a, b))
    return out


def components_py(pairs: set[tuple[str, str]], nodes: set[str]) -> dict[str, str]:
    parent: dict[str, str] = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups: dict[str, list[str]] = {}
    for n in nodes:
        groups.setdefault(find(n), []).append(n)
    out = {}
    for members in groups.values():
        canon = min(members)
        for m in members:
            out[m] = canon
    return out


def kg_triples_py(
    sf_dir: str,
    neardup_threshold: float = 0.6,
    include_chunk_triples: bool = True,
) -> set[tuple[str, str, str]]:
    docs = load_documents(sf_dir)
    triples: set[tuple[str, str, str]] = set()
    gaz_norms = {nm for _, _, _, nm, _ in GAZ_ROWS}

    for d in docs:
        url = url_of(d)
        text = clean_content(d["text"])
        ext = ext_of(url)
        triples.add((url, "has_language", d["lang"]))
        triples.add((url, "has_type", type_of(ext)))
        triples.add((url, "has_checksum", sha256(text)))

        counts = Counter(t for t in tokens_of(text) if t in gaz_norms)
        for norm, n in counts.items():
            triples.add((url, "mentions", norm))
            best = best_entity(norm, n)
            triples.add((url, "linked_to", best[1]))

        if include_chunk_triples:
            doc_uid = "doc_" + sha256(url)
            for c in create_chunks(text, 1000, 200):
                triples.add((url, "has_chunk", f"{doc_uid}_chunk_{c['index']}"))

    pairs = neardup_pairs_py(docs, neardup_threshold)
    comp = components_py(pairs, {url_of(d) for d in docs})
    for k, canon in comp.items():
        if k != canon:
            triples.add((k, "same_as", canon))

    return triples
