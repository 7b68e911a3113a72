#!/usr/bin/env node
// Golden-fixture generator for the Notion source (S6): runs the
// REFERENCE implementation (/root/reference/notion-source.js, read-only)
// on a fixture of block-tree JSONs covering every branch of its 24-way
// blocksToText switch plus title/page-id helpers, and records the exact
// outputs.  pytest asserts our pure-Python reimplementation
// (src_to_kb_spark/sources/notion.py) is byte-identical.
//
// The reference hard-requires '@notionhq/client' (network SDK we never
// call) — stub it first:
//   mkdir -p /tmp/notion_stub/node_modules/@notionhq/client
//   (index.js: `class Client{}; module.exports={Client}`, plus package.json)
// then:
//   NODE_PATH=/tmp/notion_stub/node_modules \
//     node tools/gen_notion_goldens.mjs > fixtures/golden_notion.json
//
// This script only INVOKES the reference to capture behavior; no
// reference code is copied into the repo.

import { createRequire } from 'module';
const require = createRequire(import.meta.url);
const { NotionSource } = require('/root/reference/notion-source.js');

const ns = new NotionSource({ apiKey: 'golden-dummy' });

const rt = (...texts) => texts.map((t) => ({ plain_text: t }));

const CASES = {
  headings_and_paragraphs: [
    { type: 'heading_1', heading_1: { rich_text: rt('Title') } },
    { type: 'heading_2', heading_2: { rich_text: rt('Sub', 'title') } },
    { type: 'heading_3', heading_3: { rich_text: rt('Deep') } },
    { type: 'paragraph', paragraph: { rich_text: rt('Body text.') } },
    { type: 'paragraph', paragraph: { rich_text: [] } },
  ],
  lists_todo_toggle: [
    { type: 'bulleted_list_item', bulleted_list_item: { rich_text: rt('a') } },
    { type: 'bulleted_list_item', bulleted_list_item: { rich_text: rt('b') } },
    { type: 'numbered_list_item', numbered_list_item: { rich_text: rt('one') } },
    { type: 'numbered_list_item', numbered_list_item: { rich_text: rt('two') } },
    { type: 'to_do', to_do: { rich_text: rt('done'), checked: true } },
    { type: 'to_do', to_do: { rich_text: rt('open'), checked: false } },
    { type: 'toggle', toggle: { rich_text: rt('expand me') } },
  ],
  quote_callout_code: [
    { type: 'quote', quote: { rich_text: rt('wise words') } },
    { type: 'callout', callout: { rich_text: rt('note'), icon: { emoji: '⚠️' } } },
    { type: 'callout', callout: { rich_text: rt('no icon') } },
    { type: 'code', code: { rich_text: rt('print(1)'), language: 'python' } },
    { type: 'code', code: { rich_text: rt('x') } },
  ],
  divider_table_equation: [
    { type: 'divider', divider: {} },
    { type: 'table', table: { rich_text: rt('3x2') } },
    { type: 'table', table: {} },
    { type: 'equation', equation: { rich_text: rt('E=mc^2') } },
  ],
  media_and_bookmark: [
    { type: 'image', image: { caption: rt('a chart'), file: { url: 'https://f/img.png' } } },
    { type: 'image', image: { file: { url: 'https://f/img2.png' } } },
    { type: 'file', file: { external: { url: 'https://e/doc.bin' } } },
    { type: 'video', video: { caption: rt('clip') } },
    { type: 'pdf', pdf: {} },
    { type: 'bookmark', bookmark: { url: 'https://b.example', caption: rt('bm') } },
    { type: 'bookmark', bookmark: { url: 'https://b2.example' } },
    { type: 'bookmark', bookmark: {} },
  ],
  unknown_and_degenerate: [
    { type: 'synced_block', synced_block: { rich_text: rt('synced text') } },
    { type: 'mystery', mystery: {} },
    { type: 'child_page', child_page: { title: rt('Child title') } },
    { type: 'nodata' },
    { type: 'paragraph', paragraph: { rich_text: [{ no_plain: 1 }, { plain_text: 'ok' }] } },
    { type: 'paragraph', paragraph: { rich_text: 'not-an-array' } },
  ],
  empty: [],
};

const TITLE_PAGES = [
  { properties: { title: { title: [{ plain_text: 'Via title prop' }] } } },
  { properties: { Name: { title: [{ plain_text: 'Via Name prop' }] } } },
  { properties: { title: { title: [] }, Name: { title: [{ plain_text: 'Name fallback' }] } } },
  { properties: {} },
  {},
];

const out = {
  blocks_to_text: Object.fromEntries(
    Object.entries(CASES).map(([k, blocks]) => [
      k,
      { blocks, expected: ns.blocksToText(blocks) },
    ])
  ),
  page_titles: TITLE_PAGES.map((p) => ({ page: p, expected: ns.getPageTitle(p) })),
  page_ids: [
    'https://notion.so/My-Page-0123456789abcdef0123456789abcdef',
    'https://notion.so/nope',
  ].map((u) => ({ url: u, extracted: ns.extractPageId(u) })),
  format_ids: ['0123456789abcdef0123456789abcdef', '0123-4567', 'short'].map(
    (id) => ({ id, formatted: ns.formatPageId(id) })
  ),
};
process.stdout.write(JSON.stringify(out, null, 1));
