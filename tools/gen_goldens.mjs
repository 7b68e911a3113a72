#!/usr/bin/env node
// Golden-fixture generator: runs the REFERENCE implementation
// (/root/reference/kb-generator.js, read-only) on adversarial inputs and
// records its exact cleanContent/createChunks outputs as JSON.  The pytest
// suite asserts our pure-Python reimplementation
// (src_to_kb_spark/core/textproc.py) is byte-identical.
//
// Run from a scratch cwd (the reference constructor mkdirs ./knowledge-base):
//   cd /tmp && node /root/repo/tools/gen_goldens.mjs > /root/repo/fixtures/golden_textproc.json
//
// This script only INVOKES the reference to capture behavior; no reference
// code is copied into the repo.

import { createRequire } from 'module';
const require = createRequire(import.meta.url);
const { KnowledgeBaseGenerator } = require('/root/reference/kb-generator.js');

// Mute the reference's console chatter so stdout is pure JSON.
const log = console.log;
console.log = () => {};
const gen = new KnowledgeBaseGenerator({ outputPath: '/tmp/_golden_kb' });
const genNoComments = new KnowledgeBaseGenerator({
  outputPath: '/tmp/_golden_kb',
  includeComments: false,
});
console.log = log;

// Deterministic pseudo-random word soup (mulberry32, seed 42).
function mulberry32(a) {
  return function () {
    let t = (a += 0x6d2b79f5);
    t = Math.imul(t ^ (t >>> 15), t | 1);
    t ^= t + Math.imul(t ^ (t >>> 7), t | 61);
    return ((t ^ (t >>> 14)) >>> 0) / 4294967296;
  };
}
const rnd = mulberry32(42);
const VOCAB = ('spark join filter group sort merge hash scan shuffle batch ' +
  'stream window row column table index key value query plan stage task ' +
  'node edge graph entity link triple chunk page host').split(' ');
function words(n) {
  const out = [];
  for (let i = 0; i < n; i++) out.push(VOCAB[Math.floor(rnd() * VOCAB.length)]);
  return out.join(' ');
}

const cases = [
  { name: 'empty', text: '' },
  { name: 'one_line', text: 'hello world' },
  { name: 'trailing_ws', text: 'a  \t\nb  \nc   \n' },
  { name: 'nbsp_feff', text: '\u{feff}\u{a0} lead\nmid\u{a0}\nend \u{feff}' },
  { name: 'crlf', text: 'line1\r\nline2\r\n\r\nline3\r\n' },
  { name: 'blank_runs_3', text: 'a\n\n\nb' },
  { name: 'blank_runs_5', text: 'a\n\n\n\n\nb' },
  { name: 'blank_runs_7_ws', text: 'a\n \n\t\n \n\n \n\nb' },
  { name: 'u2028', text: 'a\u{2028}b\nc\u{2029}d\n\u{2028}\n\ne' },
  { name: 'comments_js', text: 'code(); // trailing\n// full line\nkeep\n/* block\nspans */tail\n' },
  { name: 'comments_hash', text: '  # hash\nkeep # inline stays\n\t#tab\nx\n' },
  { name: 'comments_crlf', text: 'a // c\r\n# h\r\nb\r\n' },
  { name: 'url_not_comment', text: 'see https://example.com/x and keep\n' },
  { name: 'long_single_line', text: words(400) },
  { name: 'many_short_lines', text: Array.from({ length: 120 }, (_, i) => `${i}: ${words(6)}`).join('\n') },
  { name: 'chunk_stress_large', text: Array.from({ length: 100 }, (_, i) => `== section ${i} ==\n${words(30)}\n${words(25)}\n`).join('\n') },
  { name: 'uneven_lines', text: Array.from({ length: 60 }, (_, i) => words(1 + Math.floor(rnd() * 40))).join('\n') },
  { name: 'line_exact_1000', text: 'x'.repeat(999) + '\n' + 'y'.repeat(999) },
  { name: 'line_over_1000', text: 'x'.repeat(1500) + '\nshort\n' + 'y'.repeat(2500) },
  { name: 'overlap_edge_tiny_lines', text: Array.from({ length: 300 }, (_, i) => 'ab') .join('\n') },
  { name: 'mixed_ws_soup', text: 'a\u{3000}\u{2009}b\n \u{205f}\n\n\n c\td\u{1680}\n' },
];

const out = [];
for (const c of cases) {
  for (const [mode, g] of [['with_comments', gen], ['no_comments', genNoComments]]) {
    const cleaned = g.cleanContent(c.text);
    const chunks = g.createChunks(cleaned, 'DOC').map((ch) => ({
      index: ch.index,
      content: ch.content,
      startLine: ch.startLine,
      endLine: ch.endLine,
      size: ch.size,
    }));
    out.push({ name: c.name, mode, input: c.text, cleaned, chunks });
    // Also pin chunking at a second (small) chunk geometry.
    const g2 = (() => {
      const l = console.log; console.log = () => {};
      const x = new KnowledgeBaseGenerator({ outputPath: '/tmp/_golden_kb', chunkSize: 120, chunkOverlap: 40 });
      console.log = l; return x;
    })();
    out.push({
      name: c.name + '@120/40', mode, input: c.text, cleaned,
      chunks: g2.createChunks(cleaned, 'DOC').map((ch) => ({
        index: ch.index, content: ch.content, startLine: ch.startLine,
        endLine: ch.endLine, size: ch.size,
      })),
    });
  }
}
log(JSON.stringify(out, null, 1));
