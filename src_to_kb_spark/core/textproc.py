"""Pure-Python reference semantics for text cleaning and chunking.

These two functions are the single source of truth for the per-row
semantics of the extract and chunk stages.  They are shared by

* the vectorized Arrow/pandas UDFs in ``src_to_kb_spark.operators``
  (the Spark execution path), and
* the pytest oracle / golden-fixture harness (the correctness path).

The semantics replicate the reference engine exactly
(``/root/reference/kb-generator.js:340-361`` ``cleanContent`` and
``/root/reference/kb-generator.js:363-417`` ``createChunks``), including
its quirks.  Byte-identical output per input string is a binding
invariant (BASELINE.json ``input_hint``) and is pinned by golden
fixtures produced by running the reference implementation itself
(``tools/gen_goldens.mjs`` -> ``fixtures/golden_textproc.json``).

JavaScript/Python regex and whitespace divergences that matter here:

* JS ``\\s`` = ECMA-262 WhiteSpace + LineTerminator =
  ``[\\t\\v\\f \\xa0\\ufeff\\u1680\\u2000-\\u200a\\u202f\\u205f\\u3000\\n\\r\\u2028\\u2029]``.
  Python's ``\\s`` additionally matches ``\\x1c-\\x1f\\x85`` and does
  NOT match ``\\ufeff`` -- so we always use the explicit class below.
* JS ``.`` excludes all four LineTerminators (``\\n\\r\\u2028\\u2029``);
  Python's ``.`` excludes only ``\\n``.
* JS multiline ``^``/``$`` anchor around any LineTerminator; Python's
  ``re.M`` anchors only around ``\\n``.  We desugar anchors explicitly.
* ``String.prototype.trimEnd``/``trim`` strip the same JS set.

Both ``String.prototype.replace`` (global) and ``re.sub`` are
single-pass, non-overlapping, resuming after each replacement -- so the
"5+ newlines are not fully collapsed" quirk of the blank-line collapse
(``kb-generator.js:355``) reproduces for free.
"""

from __future__ import annotations

import math
import re
from typing import TypedDict

# JS LineTerminator set (ECMA-262).
_LT_CHARS = "\n\r  "
# ECMA-262 WhiteSpace: TAB VT FF SP NBSP ZWNBSP + Unicode Zs.
_ZS = " " + "".join(chr(c) for c in range(0x2000, 0x200B)) + "  　"
_WS_CHARS = "\t\x0b\x0c \xa0﻿" + _ZS
# JS regex \s = WhiteSpace + LineTerminator; also what trim/trimEnd strip.
JS_WHITESPACE = _WS_CHARS + _LT_CHARS

_WS = re.escape(JS_WHITESPACE)  # char-class body for JS \s
_LT = re.escape(_LT_CHARS)

# Java-regex-safe character class equivalent to JS \s, for use inside
# Spark's regexp_replace/rlike (Java and Python agree on these escapes).
JS_WS_CLASS = "[" + "".join(f"\\u{ord(c):04x}" for c in JS_WHITESPACE) + "]"

# /\/\/.*$/gm -- `.` excludes LineTerminators; the `$` anchor is then
# always satisfied by greediness, so it desugars away.
_RE_LINE_COMMENT = re.compile(r"//[^" + _LT + r"]*")
# /\/\*[\s\S]*?\*\//g -- [\s\S] is "any char".
_RE_BLOCK_COMMENT = re.compile(r"/\*.*?\*/", re.DOTALL)
# /^\s*#.*$/gm -- JS multiline ^ matches at string start or after ANY
# LineTerminator (including between \r and \n of a CRLF pair).
_RE_HASH_COMMENT = re.compile(
    r"(?:(?<=[" + _LT + r"])|\A)[" + _WS + r"]*#[^" + _LT + r"]*"
)
# /\n\s*\n\s*\n/g -> '\n\n'  (single pass, not a fixpoint)
_RE_BLANK_COLLAPSE = re.compile(r"\n[" + _WS + r"]*\n[" + _WS + r"]*\n")


def clean_content(content: str, include_comments: bool = True) -> str:
    """Reference-equal ``cleanContent`` (kb-generator.js:340-361).

    ``include_comments=True`` (the reference default) skips comment
    stripping; the whitespace normalization always runs.
    """
    cleaned = content
    if not include_comments:
        cleaned = _RE_LINE_COMMENT.sub("", cleaned)
        cleaned = _RE_BLOCK_COMMENT.sub("", cleaned)
        cleaned = _RE_HASH_COMMENT.sub("", cleaned)
    cleaned = _RE_BLANK_COLLAPSE.sub("\n\n", cleaned)
    cleaned = "\n".join(line.rstrip(JS_WHITESPACE) for line in cleaned.split("\n"))
    return cleaned.strip(JS_WHITESPACE)


class Chunk(TypedDict):
    index: int
    content: str
    start_line: int
    end_line: int
    size: int


def create_chunks(
    content: str, chunk_size: int = 1000, overlap: int = 200
) -> list[Chunk]:
    """Reference-equal ``createChunks`` (kb-generator.js:363-417).

    Greedy line-packing with character budget ``chunk_size`` counting
    ``len(line)+1`` per line, tail-overlap carry of
    ``ceil(overlap / (current_size / n_lines))`` lines (float division,
    then ceil -- kb-generator.js:390), and the reference's
    size-accounting quirk: after an overlap carry ``current_size`` is
    recomputed as ``len('\\n'.join(carry))`` (kb-generator.js:395),
    which differs by one per carried line from the running ``len+1``
    sum, so the recorded ``size`` of a chunk is NOT ``len(content)``.

    The chunk ``id`` (``{doc_id}_chunk_{index}`` -- kb-generator.js:381)
    is derived by callers from ``index`` so this function stays
    id-agnostic and cacheable.

    Always emits the final partial chunk; an empty string still yields
    one chunk (JS ``''.split('\\n') == ['']``), matching the reference.
    """
    chunks: list[Chunk] = []
    lines = content.split("\n")

    current_chunk: list[str] = []
    current_size = 0
    chunk_index = 0
    start_line = 0

    for i, line in enumerate(lines):
        line_size = len(line) + 1  # +1 for newline, per reference

        if current_size + line_size > chunk_size and current_chunk:
            chunks.append(
                Chunk(
                    index=chunk_index,
                    content="\n".join(current_chunk),
                    start_line=start_line,
                    end_line=i - 1,
                    size=current_size,
                )
            )
            # Overlap carry -- float division then ceil (kb-generator.js:390).
            overlap_lines = math.ceil(overlap / (current_size / len(current_chunk)))
            overlap_start = max(0, len(current_chunk) - overlap_lines)
            current_chunk = current_chunk[overlap_start:]
            current_size = len("\n".join(current_chunk))
            start_line = i - (len(current_chunk) - 1)
            chunk_index += 1

        current_chunk.append(line)
        current_size += line_size

    if current_chunk:
        chunks.append(
            Chunk(
                index=chunk_index,
                content="\n".join(current_chunk),
                start_line=start_line,
                end_line=len(lines) - 1,
                size=current_size,
            )
        )

    return chunks
