"""Web search + page-to-text (document TTS / RAG support).

Capability parity with ``/root/reference/utils/text/web/``
(`SearchEngine` abstraction + google engine, page fetch → text).  Network
access is environment-dependent; everything degrades with clear errors
offline.
"""

import re
import logging

from .parsers import parse_html

logger = logging.getLogger(__name__)

_ENGINES = {}


def register_engine(name):
    def deco(cls):
        _ENGINES[name] = cls
        return cls
    return deco


class SearchEngine:
    """Returns a list of {'title', 'url', 'snippet'} for a query."""

    def __init__(self, ** kwargs):
        self.kwargs = kwargs

    def search(self, query, n = 5, ** kwargs):
        raise NotImplementedError()

    def search_and_fetch(self, query, n = 3, ** kwargs):
        results = self.search(query, n = n, ** kwargs)
        for result in results:
            try:
                result['text'] = fetch_page_text(result['url'])
            except Exception as e:
                logger.warning('fetch failed for %s: %s', result['url'], e)
                result['text'] = None
        return results


@register_engine('google')
class GoogleEngine(SearchEngine):
    SEARCH_URL = 'https://www.google.com/search'

    def search(self, query, n = 5, ** kwargs):
        import requests
        response = requests.get(
            self.SEARCH_URL, params = {'q': query, 'num': n},
            headers = {'User-Agent': 'Mozilla/5.0'}, timeout = 10,
        )
        response.raise_for_status()
        return self._parse_results(response.text, n)

    @staticmethod
    def _parse_results(html, n):
        results = []
        for match in re.finditer(
                r'<a href="(/url\?q=|)(https?://[^"&]+)[^>]*>\s*<h3[^>]*>(.*?)</h3>',
                html, re.DOTALL):
            url = match.group(2)
            title = re.sub(r'<[^>]+>', '', match.group(3)).strip()
            if 'google.' in url: continue
            results.append({'title': title, 'url': url, 'snippet': ''})
            if len(results) >= n: break
        return results


@register_engine('ddg')
class DuckDuckGoEngine(SearchEngine):
    SEARCH_URL = 'https://html.duckduckgo.com/html/'

    def search(self, query, n = 5, ** kwargs):
        import requests
        response = requests.post(
            self.SEARCH_URL, data = {'q': query},
            headers = {'User-Agent': 'Mozilla/5.0'}, timeout = 10,
        )
        response.raise_for_status()
        results = []
        for match in re.finditer(
                r'class="result__a"[^>]*href="([^"]+)"[^>]*>(.*?)</a>',
                response.text, re.DOTALL):
            results.append({
                'url': match.group(1),
                'title': re.sub(r'<[^>]+>', '', match.group(2)).strip(),
                'snippet': '',
            })
            if len(results) >= n: break
        return results


def get_search_engine(engine = 'google', ** kwargs):
    if isinstance(engine, SearchEngine): return engine
    if engine not in _ENGINES:
        raise ValueError('Unknown search engine {!r} (known: {})'.format(
            engine, sorted(_ENGINES)))
    return _ENGINES[engine](** kwargs)


def search(query, *, engine = 'google', n = 5, fetch = False, ** kwargs):
    eng = get_search_engine(engine, ** kwargs)
    if fetch:
        return eng.search_and_fetch(query, n = n)
    return eng.search(query, n = n)


def fetch_page_text(url, timeout = 10):
    """Fetch a page and extract readable text."""
    import requests
    response = requests.get(url, headers = {'User-Agent': 'Mozilla/5.0'},
                            timeout = timeout)
    response.raise_for_status()
    paragraphs = parse_html(response.text)
    return '\n\n'.join(p['text'] for p in paragraphs)
