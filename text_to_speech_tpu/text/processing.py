"""Long-text chunking for bounded-length synthesis.

Capability parity with ``/root/reference/utils/text/text_processing.py:34,146,228``
(`split_text` recursive splitting, `split_sentences`, `merge_texts`,
`format_text`).  Long inputs are recursively split (paragraph → sentence →
clause → word) into chunks of at most `max_length` units, then greedily
merged back so chunks are as large as possible — larger chunks mean fewer
autoregressive decoder launches on device.
"""

import re

_SENTENCE_SPLIT_RE = re.compile(r'(?<=[.!?…])\s+|\n+')
_CLAUSE_SPLIT_RE = re.compile(r'(?<=[,;:])\s+')
_WORD_SPLIT_RE = re.compile(r'\s+')


def _measure(text, tokenizer = None):
    if tokenizer is not None:
        return len(tokenizer.encode(text))
    return len(text)


def split_sentences(text):
    """Split on sentence boundaries (punctuation + whitespace, newlines)."""
    return [s.strip() for s in _SENTENCE_SPLIT_RE.split(text) if s and s.strip()]


def split_paragraphs(text):
    return [p.strip() for p in re.split(r'\n\s*\n', text) if p.strip()]


def merge_texts(parts, max_length, sep = ' ', tokenizer = None,
                max_overlap = 0, max_overlap_len = 0.2,
                return_indices = False):
    """Greedily merge consecutive `parts` while staying under `max_length`.

    When `max_overlap > 0`, each new chunk is prefixed with up to
    `max_overlap` trailing parts of the previous chunk whose cumulated
    length stays under `max_overlap_len` (absolute, or relative to
    `max_length` when a float) — overlapping context for retrieval /
    document chunking (reference ``text_processing.py:146-217``).

    `return_indices` additionally returns, per merged chunk, the list of
    input part indices it was built from (overlapped parts repeat).
    """
    if isinstance(max_overlap_len, float):
        max_overlap_len = int(max_overlap_len * max_length)
    lens = [_measure(p, tokenizer) for p in parts]
    sep_len = len(sep) if tokenizer is None else 0

    groups, indices = [], []
    cur, cur_idx, cur_len = [], [], 0
    for i, (part, n) in enumerate(zip(parts, lens)):
        extra = n if not cur else n + sep_len
        if not cur or cur_len + extra <= max_length:
            cur.append(part); cur_idx.append(i); cur_len += extra
        else:
            groups.append(cur); indices.append(cur_idx)
            prev, prev_idx = cur, cur_idx
            cur, cur_idx, cur_len = [part], [i], n
            if max_overlap > 0 and n < max_length:
                budget = min(max_overlap_len, max_length - n)
                overlap_len = 0
                for k in range(1, 1 + min(max_overlap, len(prev))):
                    ln = lens[prev_idx[-k]] + sep_len
                    if overlap_len + ln > budget: break
                    cur.insert(0, prev[-k]); cur_idx.insert(0, prev_idx[-k])
                    overlap_len += ln; cur_len += ln
    if cur:
        groups.append(cur); indices.append(cur_idx)
    merged = [sep.join(g) for g in groups]
    return (merged, indices) if return_indices else merged


def _split_level(parts, max_length, splitters, tokenizer):
    """Recursively split any part exceeding `max_length` with the next splitter."""
    if not splitters:
        return parts
    splitter, *rest = splitters
    out = []
    for part in parts:
        if _measure(part, tokenizer) <= max_length:
            out.append(part)
        else:
            sub = [s.strip() for s in splitter(part) if s and s.strip()]
            if len(sub) <= 1:
                out.extend(_split_level(sub or [part], max_length, rest, tokenizer))
            else:
                out.extend(_split_level(sub, max_length, rest, tokenizer))
    return out


def split_text(text, max_length = 150, tokenizer = None, ** merge_kwargs):
    """Split `text` into chunks of at most `max_length` units (characters, or
    tokens when a `tokenizer` is given), breaking at the largest possible
    linguistic boundary and merging back greedily.  Extra kwargs
    (`max_overlap`, `max_overlap_len`) are forwarded to `merge_texts`."""
    if _measure(text, tokenizer) <= max_length:
        stripped = text.strip()
        return [stripped] if stripped else []

    splitters = [
        split_paragraphs,
        _SENTENCE_SPLIT_RE.split,
        _CLAUSE_SPLIT_RE.split,
        _WORD_SPLIT_RE.split,
    ]
    parts = _split_level([text], max_length, splitters, tokenizer)
    return merge_texts(parts, max_length, tokenizer = tokenizer, ** merge_kwargs)


def format_text(text, title = None, max_line_length = None):
    """Light formatting helper: optional title header + line wrapping."""
    out = '{}\n\n{}'.format(title, text) if title else text
    if max_line_length:
        lines = []
        for line in out.split('\n'):
            while len(line) > max_line_length:
                cut = line.rfind(' ', 0, max_line_length)
                if cut <= 0: cut = max_line_length
                lines.append(line[:cut])
                line = line[cut:].lstrip()
            lines.append(line)
        out = '\n'.join(lines)
    return out


# -- byte-pair-encoding helpers (BPE tokenizer support) -----------------------

def bytes_to_unicode():
    """GPT-2-style reversible byte→unicode mapping (standard published table)."""
    bs = (
        list(range(ord('!'), ord('~') + 1))
        + list(range(ord('¡'), ord('¬') + 1))
        + list(range(ord('®'), ord('ÿ') + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


def bpe(token, merge_ranks, cache = None, end_of_word = None):
    """Apply byte-pair merges to `token` given a {pair: rank} table.

    `end_of_word` (CLIP-style, e.g. ``'</w>'``) is appended to the last
    unit before merging so word-final merges are distinct from word-internal
    ones and decode can restore spaces.
    """
    if cache is not None and token in cache:
        return cache[token]
    if end_of_word and token:
        word = tuple(token[:-1]) + (token[-1] + end_of_word,)
    else:
        word = tuple(token)
    pairs = get_pairs(word)
    if not pairs:
        word = (token + end_of_word,) if end_of_word and token else (token,)
        if cache is not None:
            cache[token] = word
        return word
    while True:
        best = min(pairs, key = lambda p: merge_ranks.get(p, float('inf')))
        if best not in merge_ranks:
            break
        first, second = best
        new_word = []
        i = 0
        while i < len(word):
            try:
                j = word.index(first, i)
            except ValueError:
                new_word.extend(word[i:])
                break
            new_word.extend(word[i:j])
            if j < len(word) - 1 and word[j + 1] == second:
                new_word.append(first + second)
                i = j + 2
            else:
                new_word.append(word[j])
                i = j + 1
        word = tuple(new_word)
        if len(word) == 1:
            break
        pairs = get_pairs(word)
    if cache is not None:
        cache[token] = word
    return word
