import os
import logging
import numpy as np
import jax.numpy as jnp
import pytest

from text_to_speech_tpu.train.metrics import get_metric, list_metrics
from text_to_speech_tpu.train.losses import get_loss
from text_to_speech_tpu.utils.databases import (
    JSONDatabase, JSONDirDatabase, SQLiteDatabase, VectorDatabase,
    build_database,
)
from text_to_speech_tpu.text.parsers import parse_document, parse_text, list_parsers
from text_to_speech_tpu.text.web import get_search_engine, SearchEngine
from text_to_speech_tpu.loggers.handlers import BufferingHandler
from text_to_speech_tpu.models.describe import (
    describe_model, count_params, infer_downsampling_factor,
)
from text_to_speech_tpu.utils.image import (
    convert_boxes, box_iou, nms, combine_boxes, box_metrics, BoxFormat,
    load_image, save_image, resize_image,
)
from text_to_speech_tpu.compile import (
    graph_compile, TensorSpec, EagerExecution, execute_eagerly,
)


class TestMetrics:
    def test_accuracy(self):
        assert get_metric('accuracy')([1, 0, 1], [1, 1, 1]) == pytest.approx(2 / 3)

    def test_eer_perfect_separation(self):
        labels = [1, 1, 0, 0]
        scores = [0.9, 0.8, 0.2, 0.1]
        assert get_metric('eer')(labels, scores) == 0.

    def test_text_f1(self):
        f1 = get_metric('f1')('the cat sat', 'the cat ran')
        assert 0 < f1 < 1

    def test_wer(self):
        assert get_metric('wer')('a b c', 'a x c') == pytest.approx(1 / 3)

    def test_listing(self):
        assert {'accuracy', 'eer', 'f1', 'wer', 'exact_match'} <= set(list_metrics())


class TestCTCLoss:
    def test_runs(self):
        loss = get_loss('CTCLoss')
        logits = jnp.zeros((2, 10, 5))
        labels = jnp.array([[1, 2, 0], [3, 0, 0]])
        out = loss((labels, jnp.array([2, 1])), (logits, jnp.array([10, 8])))
        assert out['loss'].shape == (2,)
        assert np.isfinite(np.asarray(out['loss'])).all()


class TestDatabases:
    def test_json_db(self, tmp_path):
        db = JSONDatabase(str(tmp_path / 'db.json'))
        db['a'] = {'x': 1}
        db.save()
        db2 = JSONDatabase(str(tmp_path / 'db.json'))
        assert db2['a'] == {'x': 1}
        assert 'a' in db2 and len(db2) == 1
        del db2['a']
        assert len(db2) == 0

    def test_sqlite_db(self, tmp_path):
        db = build_database('sqlite', str(tmp_path / 'db.sqlite'))
        db['k'] = {'v': [1, 2]}
        assert db['k'] == {'v': [1, 2]}
        db.update('k', extra = 'y')
        assert db['k']['extra'] == 'y'
        with pytest.raises(KeyError):
            db['missing']

    def test_vector_db(self, tmp_path):
        db = VectorDatabase(metric = 'cosine')
        db.add(np.eye(4, dtype = np.float32),
               [{'name': n} for n in 'abcd'])
        hits = db.search(np.eye(4)[2], k = 2)
        assert hits[0]['name'] == 'c'
        path = str(tmp_path / 'vec.npz')
        db.save(path)
        db2 = VectorDatabase(path)
        assert db2.search(np.eye(4)[1], k = 1)[0]['name'] == 'b'

    def test_json_dir_db(self, tmp_path):
        db = build_database('json_dir', str(tmp_path / 'entries'))
        db.insert({'id': 'spk/1', 'lang': 'en'})
        db.insert({'id': 'spk/2', 'lang': 'fr'})
        assert db['spk/1'] == {'lang': 'en'}
        assert 'spk/2' in db and len(db) == 2
        # reload from disk recovers exact (sanitized) keys
        db2 = JSONDirDatabase(str(tmp_path / 'entries'))
        assert sorted(db2.keys()) == ['spk/1', 'spk/2']
        assert db2['spk/2'] == {'lang': 'fr'}
        del db2['spk/1']
        assert len(db2) == 1 and 'spk/1' not in db2
        with pytest.raises(KeyError):
            db2['spk/1']

    def test_multi_ops(self, tmp_path):
        db = JSONDatabase(str(tmp_path / 'db.json'))
        db.multi_insert([{'id': i, 'v': i * 10} for i in range(4)])
        assert db.multi_get([0, 3, 9]) == [{'v': 0}, {'v': 30}, None]
        db.insert_or_update({'id': 1, 'extra': 'y'})
        assert db[1] == {'v': 10, 'extra': 'y'}
        db.insert_or_update({'id': 9, 'v': 90})
        assert db[9] == {'v': 90}
        db.multi_update([0, 2], {'flag': True})
        assert db[0]['flag'] and db[2]['flag']
        db.multi_update([0, 2], [{'n': 1}, {'n': 2}])
        assert (db[0]['n'], db[2]['n']) == (1, 2)
        popped = db.multi_pop([3, 3])
        assert popped == [{'v': 30}, None] and 3 not in db

    def test_vector_db_jax_index(self):
        db = VectorDatabase(metric = 'cosine', index = 'jax')
        db.add(np.eye(3, dtype = np.float32), [{'i': i} for i in range(3)])
        assert db.search(np.eye(3)[0], k = 1)[0]['i'] == 0


class TestParsers:
    def test_txt_md(self, tmp_path):
        p = tmp_path / 'x.md'
        p.write_text('# Title\n\nSome **bold** text.\n\nSecond para.')
        paragraphs = parse_document(str(p))
        assert paragraphs[0]['text'] == 'Some bold text.'
        assert paragraphs[0]['section'] == 'Title'

    def test_html(self, tmp_path):
        p = tmp_path / 'x.html'
        p.write_text('<html><head><script>no()</script></head>'
                     '<body><p>Hello there.</p><p>Bye.</p></body></html>')
        text = parse_text(str(p))
        assert 'Hello there.' in text and 'no()' not in text

    def test_docx(self, tmp_path):
        import zipfile
        p = tmp_path / 'x.docx'
        doc_xml = ('<?xml version="1.0"?><w:document><w:body>'
                   '<w:p><w:r><w:t>First paragraph</w:t></w:r></w:p>'
                   '<w:p><w:r><w:t>Second one</w:t></w:r></w:p>'
                   '</w:body></w:document>')
        with zipfile.ZipFile(p, 'w') as z:
            z.writestr('word/document.xml', doc_xml)
        paragraphs = parse_document(str(p))
        assert [x['text'] for x in paragraphs] == ['First paragraph', 'Second one']

    def test_py(self, tmp_path):
        p = tmp_path / 'x.py'
        p.write_text('"""Module doc."""\n# a comment\ndef foo():\n    pass\n')
        text = parse_text(str(p))
        assert 'Module doc.' in text and 'foo' in text

    def test_listing(self):
        assert {'txt', 'md', 'html', 'docx', 'pdf', 'py'} <= set(list_parsers())

    def test_pdf_flate_engine(self, tmp_path):
        """Self-contained engine for FlateDecode-compressed content streams
        (the reference's multi-engine pdf dispatch, pdf_parser.py:265)."""
        import io, zlib
        from text_to_speech_tpu.text.parsers import parse_pdf
        content = (b"BT /F1 12 Tf 72 720 Td (Hello compressed) Tj T* "
                   b"(Line two \\(esc\\)) Tj ET\n"
                   b"BT [ (A) (rray) -250 ( join) ] TJ ET")
        comp = zlib.compress(content)
        buf = io.BytesIO()
        buf.write(b"%PDF-1.4\n1 0 obj\n<< /Length ")
        buf.write(str(len(comp)).encode())
        buf.write(b" /Filter /FlateDecode >>\nstream\n")
        buf.write(comp)
        buf.write(b"\nendstream\nendobj\n%%EOF\n")
        p = tmp_path / 'c.pdf'
        p.write_bytes(buf.getvalue())
        out = parse_pdf(str(p))
        texts = [x['text'] for x in out]
        assert 'Hello compressed' in texts
        assert 'Line two (esc)' in texts
        assert 'Array join' in texts
        # explicit engine selection
        assert parse_pdf(str(p), method = 'flate') == out
        assert parse_pdf(str(p), method = 'minimal') == []

    def test_pdf_uncompressed_minimal(self, tmp_path):
        from text_to_speech_tpu.text.parsers import parse_pdf
        p = tmp_path / 'u.pdf'
        p.write_bytes(b"%PDF-1.4\nstream\nBT (plain old text) Tj ET\nendstream\n")
        out = parse_pdf(str(p), method = 'minimal')
        assert any('plain old text' in x['text'] for x in out)


class TestWeb:
    def test_engine_registry(self):
        assert isinstance(get_search_engine('google'), SearchEngine)
        with pytest.raises(ValueError):
            get_search_engine('nope')

    def test_format_query_exclude_site(self):
        eng = get_search_engine('google')
        q = eng.format_query('jax tpu', exclude_site = 'youtube.com')
        assert q == 'jax tpu -site:youtube.com'
        assert eng.format_query('plain') == 'plain'

    def test_parse_response_dispatch(self):
        from text_to_speech_tpu.text.web import parse_response
        html = {'content': '<html><body><p>hello world</p></body></html>',
                'content_type': 'text/html'}
        out = parse_response(html)
        assert out and 'hello world' in out[0]['text']
        txt = parse_response({'content': 'raw', 'content_type': 'text/plain'})
        assert txt == [{'text': 'raw'}]
        assert parse_response({'content': b'', 'content_type': 'image/png'}) == []

    def test_process_urls_local_server(self):
        import http.server, threading
        from text_to_speech_tpu.text.web import process_urls, fetch_page_text

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                if self.path == '/missing':
                    self.send_error(404)
                    return
                body = ('<html><body><p>page %s content</p></body></html>'
                        % self.path.strip('/')).encode()
                self.send_response(200)
                self.send_header('Content-Type', 'text/html; charset=utf-8')
                self.send_header('Content-Length', str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):
                pass

        server = http.server.ThreadingHTTPServer(('127.0.0.1', 0), Handler)
        threading.Thread(target = server.serve_forever, daemon = True).start()
        try:
            base = 'http://127.0.0.1:%d' % server.server_address[1]
            urls = [base + '/a', base + '/missing', base + '/b']
            out = process_urls(urls, n = 2)
            assert list(out) == [base + '/a', base + '/b']
            assert 'page a content' in out[base + '/a'][0]['text']
            assert out[base + '/a'][0]['url'] == base + '/a'
            assert 'page b content' in fetch_page_text(base + '/b')
        finally:
            server.shutdown()

    def test_process_urls_content_filter(self):
        import http.server, threading
        from text_to_speech_tpu.text.web import process_urls

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                body = b'<p>x</p>'
                self.send_response(200)
                self.send_header('Content-Type', 'text/html')
                self.send_header('Content-Length', str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):
                pass

        server = http.server.ThreadingHTTPServer(('127.0.0.1', 0), Handler)
        threading.Thread(target = server.serve_forever, daemon = True).start()
        try:
            base = 'http://127.0.0.1:%d' % server.server_address[1]
            out = process_urls([base + '/x'],
                               allowed_contents = ['application/pdf'])
            assert out == {}
        finally:
            server.shutdown()

    def test_query_cache_roundtrip(self, tmp_path, monkeypatch):
        import text_to_speech_tpu.text.web as web
        monkeypatch.setattr(web, '_CACHE_ROOT', str(tmp_path))

        calls = []

        class FakeEngine(web.SearchEngine):
            name = 'fake'
            def fetch_urls(self, query, n = 5, ** kwargs):
                calls.append(query)
                return ['http://nowhere.invalid/page']

        eng = FakeEngine()
        urls = eng.search('q1', parse = False, save = True)
        assert urls == ['http://nowhere.invalid/page']
        urls2 = eng.search('q1', parse = False, save = True)
        assert urls2 == urls
        assert calls == ['q1']           # second hit served from cache


class TestHandlers:
    def test_buffering_handler(self):
        logger = logging.getLogger('test_buf')
        handler = BufferingHandler()
        logger.addHandler(handler)
        logger.warning('hello %s', 'world')
        logger.removeHandler(handler)
        assert any('hello world' in r for r in handler.records)


class TestDescribe:
    def test_counts(self):
        tree = {'a': {'w': np.zeros((3, 4))}, 'b': np.zeros(5)}
        assert count_params(tree) == 17
        text = describe_model(tree)
        assert '17' in text and 'a' in text

    def test_downsampling(self):
        assert infer_downsampling_factor([2, 2, (2,)]) == 8


class TestImage:
    def test_roundtrip(self, tmp_path):
        img = (np.random.RandomState(0).rand(8, 10, 3)).astype(np.float32)
        path = save_image(str(tmp_path / 'x.png'), img)
        loaded = load_image(path)
        assert loaded.shape == (8, 10, 3)
        assert np.abs(loaded - img).max() < 0.01

    def test_resize(self):
        img = np.zeros((10, 20, 3), np.float32)
        assert resize_image(img, (5, 5)).shape == (5, 5, 3)
        letter = resize_image(img, (10, 10), keep_aspect = True, pad_value = 1.)
        assert letter.shape == (10, 10, 3)
        assert letter[0, 0, 0] == 1.          # padded region

    def test_box_convert(self):
        xywh = np.array([[2., 3., 4., 6.]])
        xyxy = convert_boxes(xywh, BoxFormat.XYWH, BoxFormat.XYXY)
        np.testing.assert_allclose(xyxy, [[2., 3., 6., 9.]])
        back = convert_boxes(xyxy, BoxFormat.XYXY, BoxFormat.CXCYWH)
        np.testing.assert_allclose(back, [[4., 6., 4., 6.]])

    def test_iou_nms(self):
        boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32)
        iou = box_iou(boxes, boxes)
        assert iou[0, 0] == 1. and iou[0, 2] == 0.
        keep = nms(boxes, np.array([0.9, 0.8, 0.7]), iou_threshold = 0.5)
        assert list(keep) == [0, 2]

    def test_combine_and_metrics(self):
        boxes = np.array([[0, 0, 10, 10], [2, 2, 12, 12], [50, 50, 60, 60]], np.float32)
        merged, groups = combine_boxes(boxes, iou_threshold = 0.3)
        assert len(merged) == 2
        m = box_metrics(boxes[:1], boxes[:1])
        assert m['f1'] == 1.


class TestGraphCompile:
    def test_compiles_and_casts(self):
        @graph_compile
        def f(x: TensorSpec(dtype = 'float32'), scale: TensorSpec(static = True) = 2):
            return x * scale

        out = f(np.array([1, 2], np.int64), scale = 3)
        assert np.asarray(out).dtype == np.float32
        np.testing.assert_allclose(np.asarray(out), [3., 6.])

    def test_eager_context_bypasses(self):
        calls = []

        @graph_compile
        def f(x: TensorSpec()):
            calls.append(1)
            return x + 1

        with EagerExecution():
            out = f(np.ones(2, np.float32))
        np.testing.assert_allclose(np.asarray(out), [2., 2.])

    def test_prepare_hook_bucketing(self):
        from text_to_speech_tpu.compile import pad_to_multiple_hook

        @graph_compile(prepare_for_xla = pad_to_multiple_hook('x', 4, axis = 0))
        def f(x: TensorSpec()):
            return x.shape[0]

        assert int(f(np.ones(6, np.float32))) == 8

    def test_execute_eagerly_in_jit(self):
        import jax

        @execute_eagerly(output_shape = (3,), output_dtype = 'float32')
        def host_fn(x):
            return np.asarray(x) * 2.

        @jax.jit
        def g(x):
            return host_fn(x) + 1.

        np.testing.assert_allclose(np.asarray(g(jnp.ones(3))), [3., 3., 3.])


class TestDefaultEngine:
    def test_set_get_default_engine(self):
        from text_to_speech_tpu.text import web
        prev = web.get_default_engine()
        try:
            web.set_default_engine('ddg')
            assert web.get_default_engine() == 'ddg'
            assert isinstance(web.get_search_engine(), web.DuckDuckGoEngine)
            with pytest.raises(ValueError):
                web.set_default_engine('altavista')
        finally:
            web.set_default_engine(prev)


class TestJSONDirCollision:
    def test_sanitized_keys_do_not_alias(self, tmp_path):
        db = build_database('json_dir', str(tmp_path / 'c'))
        db.insert({'id': 'spk/1', 'v': 1})
        db.insert({'id': 'spk_1', 'v': 2})
        assert len(db) == 2
        assert db['spk/1'] == {'v': 1} and db['spk_1'] == {'v': 2}
        db2 = JSONDirDatabase(str(tmp_path / 'c'))
        assert sorted(db2.keys()) == ['spk/1', 'spk_1']


class TestOrderedDatabase:
    def test_ordered_access(self, tmp_path):
        from text_to_speech_tpu.utils.databases import (
            JSONDatabase, OrderedDatabase)
        db = OrderedDatabase(JSONDatabase(str(tmp_path / 'db.json'), 'id'))
        for name in ('c', 'a', 'b'):
            db.insert({'id': name, 'v': name.upper()})
        assert len(db) == 3
        # insertion order, not key order
        assert [row['v'] for row in db] == ['C', 'A', 'B']
        assert db[0] == {'v': 'C'} and db[-1] == {'v': 'B'}
        assert db[1:] == [{'v': 'A'}, {'v': 'B'}]
        assert db[[0, 2]] == [{'v': 'C'}, {'v': 'B'}]
        assert db.index('a') == 1
        assert 'a' in db and 'z' not in db

    def test_mutation_tracks_order(self, tmp_path):
        from text_to_speech_tpu.utils.databases import (
            JSONDatabase, OrderedDatabase)
        db = OrderedDatabase(JSONDatabase(str(tmp_path / 'db.json'), 'id'))
        db.insert({'id': 'x', 'v': 1})
        db.insert({'id': 'y', 'v': 2})
        db.insert_or_update({'id': 'x', 'v': 3})   # update: order unchanged
        assert len(db) == 2 and db.index('x') == 0 and db[0] == {'v': 3}
        popped = db.pop(0)
        assert popped == {'v': 3}
        assert len(db) == 1 and db[0] == {'v': 2}
        db.pop('y')
        assert len(db) == 0

    def test_wraps_existing_keys(self, tmp_path):
        from text_to_speech_tpu.utils.databases import (
            JSONDatabase, OrderedDatabase)
        raw = JSONDatabase(str(tmp_path / 'db.json'), 'id')
        raw.insert({'id': 'k1', 'v': 1})
        raw.save()
        db = OrderedDatabase(JSONDatabase(str(tmp_path / 'db.json'), 'id'))
        assert len(db) == 1 and db[0] == {'v': 1}


class TestVectorIndexes:
    def test_torch_index_matches_numpy(self):
        import numpy as np
        from text_to_speech_tpu.utils.databases import build_vector_index
        rng = np.random.default_rng(0)
        vectors = rng.normal(size = (20, 8)).astype('float32')
        query = rng.normal(size = (3, 8)).astype('float32')
        for metric in ('cosine', 'dot', 'euclidean'):
            a = build_vector_index('numpy', 8, metric)
            b = build_vector_index('torch', 8, metric)
            a.add(vectors); b.add(vectors)
            ia, sa = a.search(query, k = 4)
            ib, sb = b.search(query, k = 4)
            np.testing.assert_array_equal(ia, ib)
            np.testing.assert_allclose(sa, sb, atol = 1e-5)

    def test_unknown_index_raises(self):
        import pytest
        from text_to_speech_tpu.utils.databases import build_vector_index
        with pytest.raises(ValueError):
            build_vector_index('faiss-ish', 4)


class TestTTSQualityMetrics:
    def test_mcd_zero_on_identical(self):
        import numpy as np
        from text_to_speech_tpu.train.metrics import get_metric
        mcd = get_metric('mcd')
        a = np.random.RandomState(0).randn(40, 80).astype('float32')
        assert mcd(a, a) == 0.
        assert mcd(a, a, align = 'dtw') == 0.

    def test_mcd_orders_degradation(self):
        import numpy as np
        from text_to_speech_tpu.train.metrics import get_metric
        mcd = get_metric('mcd')
        rng = np.random.RandomState(1)
        a = rng.randn(40, 80).astype('float32')
        small = mcd(a, a + 0.05 * rng.randn(40, 80).astype('float32'))
        large = mcd(a, a + 0.50 * rng.randn(40, 80).astype('float32'))
        assert 0. < small < large

    def test_mcd_dtw_absorbs_time_shift(self):
        import numpy as np
        from text_to_speech_tpu.train.metrics import get_metric
        mcd = get_metric('mcd')
        rng = np.random.RandomState(2)
        a = rng.randn(40, 80).astype('float32')
        shifted = np.concatenate([a[:1], a[:1], a])      # 2-frame stutter
        cut, dtw = mcd(a, shifted), mcd(a, shifted, align = 'dtw')
        assert dtw < cut * 0.2                            # alignment absorbed

    def test_choose_reduction_factor_policy(self):
        """r policy (VERDICT r2 next-round #8): r=1 default; a larger r is
        accepted only when its measured MCD penalty stays under the gate."""
        import pytest
        from text_to_speech_tpu.train.metrics import choose_reduction_factor

        # the measured 50-epoch overfit sweep: r>1 runs away (docs table)
        measured = {1: {'mcd_db': 7.38}, 2: {'mcd_db': 32.38},
                    3: {'mcd_db': 33.08}}
        assert choose_reduction_factor(measured) == 1
        # a hypothetical well-trained r=2 under the gate is accepted
        good = {1: {'mcd_db': 7.0}, 2: {'mcd_db': 7.3}, 3: {'mcd_db': 9.0}}
        assert choose_reduction_factor(good) == 2
        assert choose_reduction_factor(good, max_mcd_penalty_db = 0.1) == 1
        assert choose_reduction_factor(good, max_mcd_penalty_db = 5.) == 3
        with pytest.raises(ValueError):
            choose_reduction_factor({2: {'mcd_db': 1.}})

    def test_mcd_dtw_normalizes_by_path_length(self):
        """DTW MCD must divide by the optimal path's LENGTH (number of
        aligned pairs), not max(Ta, Tb) — brute-force path enumeration on
        a tiny grid is the ground truth."""
        import numpy as np
        from text_to_speech_tpu.train.metrics import get_metric, _dct_matrix
        mcd = get_metric('mcd')
        rng = np.random.RandomState(4)
        a = rng.randn(3, 80).astype('float32')
        b = rng.randn(5, 80).astype('float32')

        dct = _dct_matrix(13, 80)
        ca, cb = (a @ dct.T)[:, 1:], (b @ dct.T)[:, 1:]
        dist = np.sqrt(((ca[:, None] - cb[None]) ** 2).sum(-1))

        best = [np.inf, 0]          # (cost, path length)
        def walk(i, j, cost, length):
            cost += dist[i, j]
            length += 1
            if (i, j) == (len(ca) - 1, len(cb) - 1):
                if cost < best[0]:
                    best[0], best[1] = cost, length
                return
            for di, dj in ((1, 0), (0, 1), (1, 1)):
                if i + di < len(ca) and j + dj < len(cb):
                    walk(i + di, j + dj, cost, length)
        walk(0, 0, 0., 0)

        const = 10. / np.log(10.) * np.sqrt(2.)
        expected = const * best[0] / best[1]
        got = mcd(a, b, align = 'dtw')
        assert abs(got - expected) < 1e-4 * expected

    def test_mel_snr(self):
        import numpy as np
        from text_to_speech_tpu.train.metrics import get_metric
        snr = get_metric('mel_snr')
        a = np.random.RandomState(3).randn(30, 80).astype('float32')
        assert snr(a, a) > 100.
        assert 15. < snr(a, a + 0.1 * a) < 25.            # ≈20 dB


# smoke tier: host-side/cheap-compile tests that gate every commit
# (<3 min cold on one core; see pytest.ini)
pytestmark = [pytest.mark.smoke]
