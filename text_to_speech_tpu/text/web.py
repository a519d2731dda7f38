"""Web search + page-to-text (document TTS / RAG support).

Capability parity with ``/root/reference/utils/text/web/``
(`SearchEngine` abstraction :30 with query formatting / url caching,
`process_urls` threaded fetch pipeline :149, `fetch_content` with
content-type filtering :257, google/ddg engines).  Network access is
environment-dependent; everything degrades with clear errors offline.
"""

import os
import re
import time
import queue
import logging
import threading
import urllib.request

from .parsers import parse_html

logger = logging.getLogger(__name__)

_ENGINES = {}
_CACHE_ROOT = os.path.expanduser('~/.cache/text_to_speech_tpu/web')


def register_engine(name):
    def deco(cls):
        _ENGINES[name] = cls
        cls.name = name
        return cls
    return deco


class SearchEngine:
    """Search + fetch pipeline.

    `search(query)` returns ``{'query', 'engine', 'urls', 'results'}``
    where `results` maps each url to its parsed paragraphs.  Sub-classes
    implement `fetch_urls`; everything else (query formatting, caching,
    threaded fetching, parsing) is shared.
    """

    name = None

    def __init__(self, ** kwargs):
        self.kwargs = kwargs

    # -- engine-specific ----------------------------------------------------

    def format_query(self, query, *, exclude_site = None, ** kwargs):
        if exclude_site:
            if isinstance(exclude_site, str): exclude_site = [exclude_site]
            query = ' '.join([query] + ['-site:' + s for s in exclude_site])
        return query

    def fetch_urls(self, query, n = 5, ** kwargs):
        """Returns the `n` most relevant urls for `query`."""
        raise NotImplementedError()

    # -- shared pipeline ----------------------------------------------------

    @classmethod
    def get_cache_path(cls, filename):
        return os.path.join(_CACHE_ROOT, cls.name or cls.__name__.lower(),
                            filename)

    def search(self, query = None, *, n = 5, urls = None, parse = True,
               save = False, reload = False, ** kwargs):
        """Search `query` (or process explicit `urls`) and parse contents.

        With ``save = True`` the query→urls mapping and per-url parsed
        contents are cached on disk (only enable where the engine's terms
        permit caching).  ``reload = True`` bypasses both caches.
        """
        assert query or urls
        formatted = None
        if not urls:
            formatted = self.format_query(query, n = n, ** kwargs)
            cache = None
            if save:
                from ..utils.databases import build_database
                cache = build_database(
                    'json', self.get_cache_path('queries.json'),
                    primary_key = 'query')
            if cache is not None and not reload and formatted in cache:
                urls = cache[formatted]['urls']
            else:
                urls = list(self.fetch_urls(formatted, n = n, ** kwargs))
                if cache is not None:
                    cache[formatted] = {'query': formatted, 'urls': urls}
                    cache.save()
        if not parse:
            return urls
        results = process_urls(urls, n = n, save = save,
                               reparse = reload, ** kwargs)
        return {
            'query'     : query,
            'formatted_query'   : formatted,
            'engine'    : self.name or self.__class__.__name__,
            'urls'      : urls,
            'results'   : results,
        }

    def search_and_fetch(self, query, n = 3, ** kwargs):
        """Back-compat flat view: list of {'title','url','text'}."""
        out = self.search(query, n = n, ** kwargs)
        flat = []
        for url, paragraphs in out['results'].items():
            flat.append({
                'url'   : url,
                'title' : paragraphs[0].get('title', '') if paragraphs else '',
                'text'  : '\n\n'.join(p.get('text', '') for p in paragraphs),
            })
        return flat


def process_urls(urls, *, n = None, timeout = None, best_only = False,
                 save = False, reparse = False, allowed_contents = None,
                 ** kwargs):
    """Fetch and parse urls with threaded IO (reference `process_urls`
    at ``search_engine.py:149``).

    Starts ``n + n // 2`` fetch threads (unless `best_only`, which
    fetches exactly the first `n`) and keeps the first `n` urls that
    yield parseable content — slow or failing urls are displaced by the
    spares.  `timeout` bounds the total wait once at least one result
    landed.  With ``save = True`` parsed contents are cached per-url.
    """
    if isinstance(urls, str): urls = [urls]
    urls = list(urls)
    if n is None: n = len(urls)

    cache = None
    if save:
        from ..utils.databases import build_database
        cache = build_database(
            'json', os.path.join(_CACHE_ROOT, 'parsed.json'),
            primary_key = 'url')

    results, workers = {}, []
    buffer = queue.Queue()
    for i, url in enumerate(urls):
        if cache is not None and not reparse and url in cache:
            results[i] = (url, cache[url]['parsed'])
        else:
            workers.append(threading.Thread(
                target = fetch_content, args = (url, buffer, i),
                kwargs = {'timeout': timeout,
                          'allowed_contents': allowed_contents},
                daemon = True))

    spares = 0 if best_only else n // 2
    started = min(len(workers), max(0, n - len(results)) + spares)
    for i in range(started): workers[i].start()

    t0 = time.time()
    for _ in range(len(workers)):
        if len([r for r in results.values() if r[1]]) >= n: break
        try:
            wait = None
            if timeout and results:
                wait = max(0.01, timeout - (time.time() - t0))
            idx, url, response = buffer.get(timeout = wait)
        except queue.Empty:
            logger.info('timeout exceeded, stopping url processing')
            break
        parsed = parse_response(response, ** kwargs) if response else []
        if parsed:
            for para in parsed: para['url'] = url
            results[idx] = (url, parsed)
            if cache is not None:
                cache[url] = {'url': url, 'parsed': parsed}
        elif started < len(workers):
            workers[started].start()
            started += 1
    if cache is not None: cache.save()

    ordered = {}
    for idx in sorted(results):
        url, parsed = results[idx]
        if parsed: ordered[url] = parsed
    return ordered


def fetch_content(url, buffer = None, idx = None, *, timeout = None,
                  allowed_contents = None, user_agent = 'Mozilla/5.0'):
    """Fetch one url; returns {'content','content_type','last_modified'}
    or None.  Posts ``(idx, url, result)`` to `buffer` when given."""
    result = None
    t0 = time.time()
    try:
        request = urllib.request.Request(
            url, headers = {'User-Agent': user_agent})
        with urllib.request.urlopen(
                request, timeout = timeout or 10) as response:
            content_type = response.getheader('Content-Type') or ''
            base_type = content_type.split(';')[0].strip()
            if not allowed_contents or base_type in allowed_contents:
                content = response.read()
                if base_type.startswith('text'):
                    content = content.decode('utf-8', errors = 'replace')
                result = {
                    'content'       : content,
                    'content_type'  : base_type,
                    'last_modified' : response.getheader('Last-Modified'),
                }
    except Exception as e:
        logger.warning('fetch failed for %s: %s', url, e)
    finally:
        if buffer is not None:
            buffer.put_nowait((idx, url, result))
        logger.debug('request #%s took %.2fs: %s', idx, time.time() - t0, url)
    return result


def parse_response(response, ** kwargs):
    """Dispatch fetched content to a parser by content-type; returns a
    list of paragraph dicts (empty when unsupported)."""
    content_type = response.get('content_type', '')
    content = response['content']
    try:
        if content_type.startswith('text/html'):
            return parse_html(content, ** kwargs)
        if content_type.startswith('text/'):
            return [{'text': content}]
        if content_type == 'application/pdf':
            import tempfile
            from .parsers import parse_pdf
            with tempfile.NamedTemporaryFile(suffix = '.pdf') as f:
                f.write(content)
                f.flush()
                return parse_pdf(f.name, ** kwargs)
    except Exception:
        logger.exception('parsing failed for content-type %s', content_type)
    return []


@register_engine('google')
class GoogleEngine(SearchEngine):
    SEARCH_URL = 'https://www.google.com/search'

    def fetch_urls(self, query, n = 5, ** kwargs):
        import requests
        response = requests.get(
            self.SEARCH_URL, params = {'q': query, 'num': n},
            headers = {'User-Agent': 'Mozilla/5.0'}, timeout = 10,
        )
        response.raise_for_status()
        return [r['url'] for r in self._parse_results(response.text, n)]

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

    def fetch_urls(self, query, n = 5, ** kwargs):
        import requests
        response = requests.post(
            self.SEARCH_URL, data = {'q': query},
            headers = {'User-Agent': 'Mozilla/5.0'}, timeout = 10,
        )
        response.raise_for_status()
        urls = []
        for match in re.finditer(
                r'class="result__a"[^>]*href="([^"]+)"', response.text):
            urls.append(match.group(1))
            if len(urls) >= n: break
        return urls


_default_engine = os.environ.get('SEARCH_ENGINE', 'google')


def set_default_engine(engine):
    """Set the engine used when `search`/`get_search_engine` get none
    (reference ``utils/text/web/__init__.py`` `set_default_engine`)."""
    global _default_engine
    if not isinstance(engine, SearchEngine) and engine not in _ENGINES:
        raise ValueError('Unknown search engine {!r} (known: {})'.format(
            engine, sorted(_ENGINES)))
    _default_engine = engine


def get_default_engine():
    return _default_engine


def get_search_engine(engine = None, ** kwargs):
    if engine is None: engine = _default_engine
    if isinstance(engine, SearchEngine): return engine
    if engine not in _ENGINES:
        raise ValueError('Unknown search engine {!r} (known: {})'.format(
            engine, sorted(_ENGINES)))
    return _ENGINES[engine](** kwargs)


def search(query, *, engine = None, n = 5, fetch = False, ** kwargs):
    eng = get_search_engine(engine)
    if fetch:
        return eng.search_and_fetch(query, n = n, ** kwargs)
    return eng.search(query, n = n, parse = False, ** kwargs)


def fetch_page_text(url, timeout = 10):
    """Fetch a page and extract readable text."""
    response = fetch_content(url, timeout = timeout)
    if response is None:
        raise RuntimeError('fetch failed for {}'.format(url))
    paragraphs = parse_response(response)
    return '\n\n'.join(p.get('text', '') for p in paragraphs)


#: reference-surface alias (``utils/text/web/__init__.py`` `search_on_web`)
search_on_web = search
