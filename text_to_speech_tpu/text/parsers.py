"""Document parsers: extension-dispatched text extraction.

Capability parity with ``/root/reference/utils/text/parsers/``
(pdf/docx/md/html/txt/py/java extraction + `parse_document` combination) —
self-contained: docx via zip+XML, html via html.parser, pdf via pypdf when
present with a minimal built-in fallback for simple text PDFs.
"""

import io
import os
import re
import logging
import zipfile

from html.parser import HTMLParser

logger = logging.getLogger(__name__)

_PARSERS = {}


def register_parser(*exts):
    def deco(fn):
        for e in exts: _PARSERS[e] = fn
        return fn
    return deco


def parse_document(filename, ** kwargs):
    """Extract text (list of paragraph dicts: {'text', 'section'?}) from any
    supported document."""
    ext = os.path.splitext(filename)[1].lstrip('.').lower()
    if ext not in _PARSERS:
        raise ValueError('Unsupported document type {!r} (known: {})'.format(
            ext, sorted(_PARSERS)))
    return _PARSERS[ext](filename, ** kwargs)


def parse_text(filename, ** kwargs):
    """Plain-text content of the whole document."""
    return '\n\n'.join(p['text'] for p in parse_document(filename, ** kwargs))


def list_parsers():
    return sorted(_PARSERS)


@register_parser('txt')
def parse_txt(filename, encoding = 'utf-8', ** kwargs):
    with open(filename, 'r', encoding = encoding, errors = 'replace') as f:
        content = f.read()
    return [{'text': p.strip()} for p in re.split(r'\n\s*\n', content) if p.strip()]


@register_parser('md')
def parse_md(filename, encoding = 'utf-8', ** kwargs):
    with open(filename, 'r', encoding = encoding) as f:
        content = f.read()
    paragraphs, section = [], None
    for block in re.split(r'\n\s*\n', content):
        block = block.strip()
        if not block: continue
        header = re.match(r'^(#{1,6})\s+(.*)', block)
        if header:
            section = header.group(2).strip()
            rest = block[header.end():].strip()
            if rest:
                paragraphs.append({'text': _strip_md(rest), 'section': section})
            continue
        paragraphs.append({'text': _strip_md(block), 'section': section})
    return paragraphs


def _strip_md(text):
    text = re.sub(r'```.*?```', '', text, flags = re.DOTALL)
    text = re.sub(r'`([^`]*)`', r'\1', text)
    text = re.sub(r'\*\*([^*]*)\*\*', r'\1', text)
    text = re.sub(r'\*([^*]*)\*', r'\1', text)
    text = re.sub(r'\[([^\]]*)\]\([^)]*\)', r'\1', text)
    return text.strip()


@register_parser('py', 'java', 'c', 'cpp', 'js')
def parse_code(filename, *, keep_comments = True, ** kwargs):
    """Code files: module docstring + comments + structure summary."""
    with open(filename, 'r', encoding = 'utf-8', errors = 'replace') as f:
        content = f.read()
    paragraphs = []
    docstrings = re.findall(r'"""(.*?)"""|\'\'\'(.*?)\'\'\'', content, re.DOTALL)
    for a, b in docstrings:
        text = (a or b).strip()
        if text: paragraphs.append({'text': text, 'section': 'docstring'})
    if keep_comments:
        comments = re.findall(r'(?:^|\s)(?:#|//)\s*(.+)', content)
        if comments:
            paragraphs.append({'text': '\n'.join(c.strip() for c in comments),
                               'section': 'comments'})
    defs = re.findall(r'^\s*(?:def|class|function|public|private)\s+(\w+)',
                      content, re.MULTILINE)
    if defs:
        paragraphs.append({'text': 'Definitions: ' + ', '.join(defs),
                           'section': 'structure'})
    return paragraphs


class _HTMLTextExtractor(HTMLParser):
    _SKIP = {'script', 'style', 'head', 'noscript'}
    _BLOCK = {'p', 'div', 'br', 'h1', 'h2', 'h3', 'h4', 'h5', 'h6', 'li',
              'tr', 'section', 'article'}

    def __init__(self):
        super().__init__()
        self.parts = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP: self._skip_depth += 1
        if tag in self._BLOCK: self.parts.append('\n')

    def handle_endtag(self, tag):
        if tag in self._SKIP: self._skip_depth = max(0, self._skip_depth - 1)
        if tag in self._BLOCK: self.parts.append('\n')

    def handle_data(self, data):
        if self._skip_depth == 0:
            self.parts.append(data)


@register_parser('html', 'htm')
def parse_html(filename, ** kwargs):
    if os.path.exists(str(filename)):
        with open(filename, 'r', encoding = 'utf-8', errors = 'replace') as f:
            content = f.read()
    else:
        content = filename            # raw html string
    extractor = _HTMLTextExtractor()
    extractor.feed(content)
    text = ''.join(extractor.parts)
    return [{'text': re.sub(r'[ \t]+', ' ', p).strip()}
            for p in re.split(r'\n\s*\n|\n', text) if p.strip()]


@register_parser('docx')
def parse_docx(filename, ** kwargs):
    """docx = zip of XML; paragraphs are <w:p>, runs are <w:t>."""
    with zipfile.ZipFile(filename) as z:
        xml = z.read('word/document.xml').decode('utf-8')
    paragraphs = []
    for para in re.findall(r'<w:p[ >].*?</w:p>', xml, re.DOTALL):
        runs = re.findall(r'<w:t[^>]*>(.*?)</w:t>', para, re.DOTALL)
        text = ''.join(runs).strip()
        if text:
            text = text.replace('&amp;', '&').replace('&lt;', '<') \
                       .replace('&gt;', '>').replace('&quot;', '"')
            paragraphs.append({'text': text})
    return paragraphs


@register_parser('pdf')
def parse_pdf(filename, method = None, ** kwargs):
    """Multi-engine pdf text extraction (the reference dispatches between
    engines at ``utils/text/parsers/pdf_parser.py:265``):

      - 'pypdf':   the library, when installed;
      - 'flate':   self-contained — inflates FlateDecode content streams
                   (zlib is stdlib) and walks the text operators;
      - 'minimal': raw Tj/TJ scan of uncompressed streams.

    Default tries each in that order and returns the first non-empty
    result."""
    engines = [method] if method else ['pypdf', 'flate', 'minimal']
    for engine in engines:
        try:
            result = _PDF_ENGINES[engine](filename)
        except ImportError:
            continue
        except Exception:
            logger.exception('pdf engine %s failed on %s', engine, filename)
            continue
        if result:
            return result
    return []


def _parse_pdf_pypdf(filename):
    import pypdf
    reader = pypdf.PdfReader(filename)
    return [
        {'text': page.extract_text().strip(), 'page': i}
        for i, page in enumerate(reader.pages) if page.extract_text().strip()
    ]


def _pdf_decode_string(raw):
    """PDF literal string bytes → text (escapes + octal per the spec)."""
    out, i = [], 0
    while i < len(raw):
        b = raw[i]
        if b == 0x5C and i + 1 < len(raw):          # backslash
            nxt = raw[i + 1]
            esc = {0x6E: '\n', 0x72: '\r', 0x74: '\t', 0x62: '\b',
                   0x66: '\f', 0x28: '(', 0x29: ')', 0x5C: '\\'}
            if nxt in esc:
                out.append(esc[nxt]); i += 2; continue
            if 0x30 <= nxt <= 0x37:                  # octal \ddd
                j = i + 1
                digits = ''
                while j < len(raw) and len(digits) < 3 and 0x30 <= raw[j] <= 0x37:
                    digits += chr(raw[j]); j += 1
                out.append(chr(int(digits, 8) & 0xFF)); i = j; continue
            i += 1; continue                          # line continuation etc.
        out.append(chr(b))
        i += 1
    return ''.join(out)


def _pdf_text_from_content(content):
    """Walk a (decompressed) content stream's text operators: () and <hex>
    strings consumed by Tj / ' / " / TJ; Td/TD/T* line moves → newlines."""
    lines, line = [], []

    def endline():
        if line:
            lines.append(''.join(line))
            del line[:]

    token_re = re.compile(
        rb'\(((?:[^()\\]|\\.)*)\)\s*(Tj|\x27|\x22)'    # (string) Tj/'/"
        rb"|<([0-9A-Fa-f\s]+)>\s*Tj"                   # <hex> Tj
        rb'|\[((?:[^\[\]\\]|\\.)*)\]\s*TJ'             # [array] TJ
        rb'|(T\*|TD|Td|ET|BT)', re.DOTALL)
    for m in token_re.finditer(content):
        if m.group(5):                                 # positioning operator
            endline()
            continue
        if m.group(1) is not None:
            if m.group(2) in (b"'", b'"'):
                endline()
            line.append(_pdf_decode_string(m.group(1)))
        elif m.group(3) is not None:
            hx = re.sub(rb'\s', rb'', m.group(3))
            if len(hx) % 2: hx += b'0'
            raw = bytes.fromhex(hx.decode('ascii'))
            # heuristics: 2-byte identity CID text shows as \x00c pairs
            if raw[:1] == b'\x00' and len(raw) % 2 == 0:
                raw = raw[1::2]
            line.append(raw.decode('latin-1'))
        elif m.group(4) is not None:
            parts = re.findall(rb'\(((?:[^()\\]|\\.)*)\)', m.group(4))
            line.append(''.join(_pdf_decode_string(p) for p in parts))
    endline()
    return [l.strip() for l in lines if l.strip()]


def _parse_pdf_flate(filename):
    """Self-contained engine: inflate every FlateDecode stream object and
    extract the text operators (handles the compressed content streams the
    minimal engine cannot)."""
    import zlib
    with open(filename, 'rb') as f:
        raw = f.read()

    paragraphs = []
    stream_re = re.compile(rb'<<(.*?)>>\s*stream\r?\n(.*?)\r?\nendstream',
                           re.DOTALL)
    for m in stream_re.finditer(raw):
        header, body = m.group(1), m.group(2)
        if b'Image' in header or b'XObject' in header and b'Form' not in header:
            continue
        if b'FlateDecode' in header:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue
        elif b'Filter' in header:
            continue                         # other filters unsupported
        for text in _pdf_text_from_content(body):
            paragraphs.append({'text': text})
    return paragraphs


def _parse_pdf_minimal(filename):
    with open(filename, 'rb') as f:
        raw = f.read()
    return [{'text': t} for t in _pdf_text_from_content(raw)]


_PDF_ENGINES = {
    'pypdf': _parse_pdf_pypdf,
    'flate': _parse_pdf_flate,
    'minimal': _parse_pdf_minimal,
}


@register_parser('json')
def parse_json_doc(filename, text_keys = ('text', 'content', 'body'), ** kwargs):
    import json
    with open(filename, 'r', encoding = 'utf-8') as f:
        data = json.load(f)
    paragraphs = []

    def walk(node, section = None):
        if isinstance(node, dict):
            for key, value in node.items():
                if key in text_keys and isinstance(value, str):
                    paragraphs.append({'text': value, 'section': section})
                else:
                    walk(value, section = key)
        elif isinstance(node, list):
            for item in node: walk(item, section)
        elif isinstance(node, str) and section in text_keys:
            paragraphs.append({'text': node, 'section': section})

    walk(data)
    return paragraphs
