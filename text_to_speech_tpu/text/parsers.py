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
def parse_pdf(filename, ** kwargs):
    try:
        import pypdf
        reader = pypdf.PdfReader(filename)
        return [
            {'text': page.extract_text().strip(), 'page': i}
            for i, page in enumerate(reader.pages) if page.extract_text().strip()
        ]
    except ImportError:
        return _parse_pdf_minimal(filename)


def _parse_pdf_minimal(filename):
    """Very small fallback: extracts text from uncompressed Tj/TJ operators
    of simple PDFs (enough for programmatically-generated text PDFs)."""
    with open(filename, 'rb') as f:
        raw = f.read()
    texts = []
    for match in re.finditer(rb'\(((?:[^()\\]|\\.)*)\)\s*Tj', raw):
        texts.append(match.group(1).decode('latin-1'))
    for match in re.finditer(rb'\[(.*?)\]\s*TJ', raw, re.DOTALL):
        parts = re.findall(rb'\(((?:[^()\\]|\\.)*)\)', match.group(1))
        texts.append(''.join(p.decode('latin-1') for p in parts))
    text = '\n'.join(t for t in texts if t.strip())
    if not text:
        logger.warning('minimal pdf parser found no text in %s '
                       '(compressed streams need pypdf)', filename)
    return [{'text': p.strip()} for p in text.split('\n') if p.strip()]


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
