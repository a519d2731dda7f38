"""Paragraph grouping / merging / chunking for document workflows.

Capability parity with ``/root/reference/utils/text/paragraphs_processing.py``
(`chunks_from_paragraphs:24`, `group_paragraphs:120`, `merge_paragraphs:130`,
`paragraph_to_text:155`).  Paragraphs are the dict rows produced by
``text.parsers.parse_document`` ({'text', 'section', ...}); these helpers
turn them into bounded-length chunks for synthesis or retrieval while
carrying the metadata along.
"""

import logging

from .processing import split_text

logger = logging.getLogger(__name__)

#: metadata keys never merged across paragraphs (content-bearing / geometric)
_SKIP_KEYS = ('text', 'box', 'items', 'rows')


def paragraph_to_text(paragraph):
    """Extract displayable text from a paragraph dict (or pass a str through).

    Typed paragraphs render as text ('list' → bullet lines, 'table' → row
    lines); media types ('document'/'image'/'audio'/'video') yield None.
    """
    if isinstance(paragraph, str):
        return paragraph
    if not isinstance(paragraph, dict):
        raise TypeError('expected str or dict paragraph, got {!r}'.format(paragraph))
    if 'text' in paragraph:
        return paragraph['text']
    ptype = paragraph.get('type')
    if ptype is None:
        raise ValueError('paragraph without "type" must have a "text" entry: {}'
                         .format(paragraph))
    if ptype == 'list':
        return '\n- ' + '\n- '.join(str(it) for it in paragraph['items'])
    if ptype == 'table':
        return '\n- ' + '\n- '.join(str(r) for r in paragraph['rows'])
    if ptype in ('document', 'image', 'audio', 'video'):
        return None
    raise ValueError('unknown paragraph type {!r}'.format(ptype))


def group_paragraphs(paragraphs, key):
    """Group consecutive-or-not paragraphs sharing the same value(s) for
    `key` (a metadata key or list of keys, e.g. 'section' or 'filename').
    Returns a list of groups (insertion-ordered)."""
    if isinstance(key, str):
        key = [key]

    def _hashable(v):
        return tuple(v) if isinstance(v, list) else v

    groups = {}
    for para in paragraphs:
        group = tuple(_hashable(para.get(k)) for k in key)
        groups.setdefault(group, []).append(para)
    return list(groups.values())


def merge_paragraphs(paragraphs, mismatch_mode = 'ignore', skip = None):
    """Merge the metadata of several paragraphs into one dict.

    Keys listed in `skip` are never merged.  When two paragraphs disagree on
    a key, `mismatch_mode` decides: 'ignore' drops the key silently, 'skip'
    drops it with a warning, 'first' keeps the first value, 'error' raises.
    Array-valued entries (anything with `.shape`) are kept from the first
    paragraph only.
    """
    if not skip:
        skip = set()
    elif isinstance(skip, str):
        skip = {skip}
    else:
        skip = set(skip)

    merged = {k: v for k, v in paragraphs[0].items() if k not in skip}
    for para in paragraphs[1:]:
        for k, v in para.items():
            if k in skip:
                continue
            if hasattr(v, 'shape') or hasattr(merged.get(k), 'shape'):
                continue
            if k not in merged:
                merged[k] = v
            elif merged[k] == v or mismatch_mode == 'first':
                continue
            elif mismatch_mode == 'error':
                raise RuntimeError('values for key {!r} mismatch: {!r} vs {!r}'
                                   .format(k, merged[k], v))
            else:
                if mismatch_mode == 'skip':
                    logger.warning('values for key %r mismatch: %r vs %r',
                                   k, merged[k], v)
                merged.pop(k)
                skip.add(k)
    return merged


def chunks_from_paragraphs(paragraphs,
                           max_length,
                           *,
                           group_by = None,
                           mismatch_mode = 'ignore',
                           separator = '\n\n',
                           tokenizer = None,
                           max_overlap = 0,
                           max_overlap_len = 0.2,
                           ** kwargs):
    """Split-then-merge `paragraphs` into chunks of at most `max_length`
    units, preserving per-paragraph metadata on each chunk.

    - `group_by` first concatenates paragraphs sharing the given metadata
      key(s) (e.g. 'section'), merging their metadata with `mismatch_mode`.
    - Each (grouped) paragraph's text is then chunked with `split_text`;
      `max_overlap`/`max_overlap_len` add trailing-sentence overlap between
      consecutive chunks.
    - `max_length` falsy returns the (grouped) paragraphs unchanged.
    """
    out = []
    for para in paragraphs:
        if isinstance(para, str):
            para = {'text': para}
        elif 'text' not in para:
            para = {** para, 'text': paragraph_to_text(para)}
        if para['text']:
            out.append(para)
    paragraphs = out

    group_keys = [group_by] if isinstance(group_by, str) else (group_by or [])
    if group_keys and all(all(k in p for k in group_keys) for p in paragraphs):
        groups = group_paragraphs(paragraphs, group_keys)
        paragraphs = []
        for group in groups:
            para = merge_paragraphs(group, mismatch_mode, skip = _SKIP_KEYS)
            para['text'] = separator.join(p['text'] for p in group)
            paragraphs.append(para)

    if not max_length:
        return paragraphs

    chunks = []
    for para in paragraphs:
        for text in split_text(para['text'], max_length, tokenizer = tokenizer,
                               max_overlap = max_overlap,
                               max_overlap_len = max_overlap_len, ** kwargs):
            chunks.append({** para, 'text': text})
    return chunks
