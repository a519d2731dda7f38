import queue
import numpy as np
import pytest

from text_to_speech_tpu.hparams import HParams
from text_to_speech_tpu.utils import (
    pad_batch, pad_to_multiple, is_equal, is_diff, load_data, dump_data,
    time_to_string, Stream, AsyncResult, PriorityQueue, STOP,
)
from text_to_speech_tpu.loggers import Timer, timer, timer_report, reset_timers


class TestHParams:
    def test_basic_access(self):
        hp = HParams(a = 1, b = 'x')
        assert hp.a == 1
        assert hp['b'] == 'x'
        hp.c = 3.0
        assert hp['c'] == 3.0
        assert 'a' in hp and 'z' not in hp

    def test_prefix_namespacing(self):
        enc = HParams(vocab_size = 148, dim = 512)
        full = HParams(** enc.get_config(add_prefix = 'encoder'), lr = 1e-3)
        assert full.encoder_vocab_size == 148
        sub = full.get_config(prefix = 'encoder')
        assert sub == {'vocab_size': 148, 'dim': 512}

    def test_extract(self):
        template = HParams(a = 1, b = 2)
        kwargs = {'a': 10, 'c': 30}
        hp = template.extract(kwargs)
        assert hp.a == 10 and hp.b == 2
        assert 'c' not in hp

    def test_merge_conflict(self):
        merged = HParams(a = 1) + HParams(a = 2, b = 3)
        assert merged.a == 2 and merged.b == 3

    def test_call_copy(self):
        hp = HParams(a = 1)
        hp2 = hp(a = 5, b = 6)
        assert hp.a == 1 and hp2.a == 5 and hp2.b == 6


class TestSequenceUtils:
    def test_pad_batch_1d(self):
        out = pad_batch([np.array([1, 2]), np.array([3])], pad_value = -1)
        assert out.shape == (2, 2)
        assert out[1, 1] == -1

    def test_pad_batch_2d(self):
        out = pad_batch([np.ones((2, 3)), np.ones((4, 2))], pad_value = 0.)
        assert out.shape == (2, 4, 3)

    def test_pad_to_multiple(self):
        x = np.ones((5, 3))
        out = pad_to_multiple(x, 4, axis = 0, constant_values = 7)
        assert out.shape == (8, 3)
        assert out[5, 0] == 7
        assert pad_to_multiple(x, 5, axis = 0).shape == (5, 3)


class TestComparison:
    def test_tensor_tolerance(self):
        a, b = np.ones(4), np.ones(4) + 1e-8
        assert is_equal(a, b)[0]
        assert is_diff(a, b + 1.)[0]

    def test_nested(self):
        a = {'x': [1, 2], 'y': {'z': np.zeros(3)}}
        b = {'x': [1, 2], 'y': {'z': np.zeros(3)}}
        assert is_equal(a, b)[0]
        b['y']['z'] = np.ones(3)
        eq, msg = is_equal(a, b)
        assert not eq and 'y.z' in msg

    def test_shape_mismatch(self):
        eq, msg = is_equal(np.zeros(3), np.zeros(4))
        assert not eq and 'shape' in msg


class TestFileUtils:
    def test_json_roundtrip(self, tmp_path):
        path = str(tmp_path / 'x.json')
        dump_data(path, {'a': 1, 'arr': np.arange(3)})
        assert load_data(path) == {'a': 1, 'arr': [0, 1, 2]}

    def test_npy_roundtrip(self, tmp_path):
        path = str(tmp_path / 'x.npy')
        dump_data(path, np.arange(5.))
        assert np.allclose(load_data(path), np.arange(5.))

    def test_default(self):
        assert load_data('/nonexistent/file.json', default = {}) == {}
        with pytest.raises(FileNotFoundError):
            load_data('/nonexistent/file.json')

    def test_yaml_roundtrip(self, tmp_path):
        path = str(tmp_path / 'x.yaml')
        dump_data(path, {'a': 1, 'b': ['x', 'y'], 'c': {'d': 2.5}})
        assert load_data(path) == {'a': 1, 'b': ['x', 'y'], 'c': {'d': 2.5}}

    def test_h5_roundtrip(self, tmp_path):
        path = str(tmp_path / 'x.h5')
        dump_data(path, {'w': np.arange(6.).reshape(2, 3), 'grp/b': np.ones(4)})
        out = load_data(path)
        assert np.allclose(out['w'], np.arange(6.).reshape(2, 3))
        assert np.allclose(out['grp/b'], np.ones(4))

    def test_hash_file(self, tmp_path):
        from text_to_speech_tpu.utils.file_utils import hash_file
        p = tmp_path / 'x.bin'
        p.write_bytes(b'abc')
        # sha256('abc') is a published constant
        assert hash_file(str(p)) == (
            'ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad')

    def test_download_file_local_cache(self, tmp_path):
        from text_to_speech_tpu.utils.file_utils import download_file
        src = tmp_path / 'src.txt'
        src.write_text('payload')
        dest_dir = str(tmp_path / 'cache')
        out = download_file('file://' + str(src), directory = dest_dir)
        assert open(out).read() == 'payload'
        # cached: source removal does not break a second call
        src.unlink()
        assert download_file('file://' + str(src), directory = dest_dir) == out


class TestTimeToString:
    def test_formats(self):
        assert 'ms' in time_to_string(0.5)
        assert 's' in time_to_string(2.0)
        assert 'min' in time_to_string(120.)


class TestTimers:
    def test_span_tree(self):
        reset_timers()

        @timer(name = 'outer')
        def outer():
            with Timer('inner'):
                pass

        outer()
        report = timer_report()
        assert 'outer' in report and 'inner' in report
        reset_timers()


class TestStream:
    def test_sync(self):
        s = Stream(lambda x: x * 2, [1, 2, 3], workers = 0)
        assert list(s.items()) == [2, 4, 6]

    def test_single_worker(self):
        s = Stream(lambda x: x + 1, range(5), workers = 1)
        assert list(s) == [1, 2, 3, 4, 5]

    def test_pool_order(self):
        import time

        def slow(x):
            time.sleep(0.01 * (3 - x))
            return x

        s = Stream(slow, [0, 1, 2], workers = 3)
        assert list(s) == [0, 1, 2]

    def test_queue_input_with_stop(self):
        q = queue.Queue()
        for i in range(3): q.put(i)
        q.put(STOP)
        s = Stream(lambda x: x, q, workers = 1)
        assert list(s) == [0, 1, 2]

    def test_callbacks(self):
        seen = []
        s = Stream(lambda x: x, [1, 2], workers = 0, item_callback = seen.append)
        list(s.items())
        assert seen == [1, 2]

    def test_bad_callback_removed(self):
        def bad(_):
            raise RuntimeError('boom')

        s = Stream(lambda x: x, [1, 2, 3], workers = 0, item_callback = bad)
        assert list(s) == [1, 2, 3]

    def test_error_propagates(self):
        def f(x):
            if x == 1: raise ValueError('x')
            return x

        with pytest.raises(ValueError):
            list(Stream(f, [0, 1, 2], workers = 1))

    def test_async_call(self):
        s = Stream(lambda x: x * 10)
        assert s(4).get(timeout = 5) == 40


class TestAsyncPrimitives:
    def test_async_result(self):
        r = AsyncResult()
        r.set_result(7)
        assert r.done() and r.get() == 7

    def test_priority_queue(self):
        pq = PriorityQueue()
        pq.put('low', priority = 5)
        pq.put('high', priority = 1)
        pq.put('mid', priority = 3)
        assert [pq.get(), pq.get(), pq.get()] == ['high', 'mid', 'low']


def _square(x):
    return x * x


def _slow_echo(x):
    import time
    time.sleep(0.1)
    return x


class TestProcess:
    def test_map_order(self):
        from text_to_speech_tpu.utils.process import Process
        with Process(_square) as p:
            assert p.map([1, 2, 3]) == [1, 4, 9]

    def test_submit_callback(self):
        from text_to_speech_tpu.utils.process import Process
        got = []
        with Process(_square) as p:
            r = p.submit(4, callback = got.append)
            assert r.get(timeout = 10) == 16
        assert got == [16]

    def test_priority_overtakes(self):
        import time
        from text_to_speech_tpu.utils.process import Process

        order = []
        p = Process(_slow_echo, buffer = 'priority')
        p.start()
        lows = [p.submit(i, priority = 5, callback = order.append)
                for i in range(5)]
        time.sleep(0.03)
        hi = p.submit('HI', priority = 0, callback = order.append)
        assert hi.get(timeout = 20) == 'HI'
        for r in lows: r.get(timeout = 20)
        p.stop()
        # the late high-priority task must overtake at least the last
        # buffered low-priority task (a couple may already be in the pipe)
        assert order.index('HI') < order.index(4)

    def test_finalizer_runs_on_stop(self):
        import time
        from text_to_speech_tpu.utils.process import Process
        done = []
        p = Process(_square, finalizer = lambda: done.append(True))
        p.start()
        assert p.submit(3).get(timeout = 10) == 9
        p.stop()
        for _ in range(50):
            if done: break
            time.sleep(0.02)
        assert done == [True]

    def test_clear_cancels_buffered(self):
        import time
        from text_to_speech_tpu.utils.process import Process
        p = Process(_slow_echo, buffer = 'priority')
        p.start()
        futs = [p.submit(i) for i in range(8)]
        time.sleep(0.03)
        dropped = p.clear()
        assert dropped > 0
        cancelled = 0
        for f in futs:
            try:
                f.get(timeout = 20)
            except RuntimeError:
                cancelled += 1
        assert cancelled == dropped
        p.stop()

    def test_run_in_thread(self):
        import time
        from text_to_speech_tpu.utils.process import run_in_thread
        got = []

        @run_in_thread(callback = got.append)
        def add(a, b):
            return a + b

        assert add(2, 3).get(timeout = 5) == 5
        for _ in range(50):
            if got: break
            time.sleep(0.02)
        assert got == [5]

    def test_run_in_thread_callback_failure_keeps_result(self):
        from text_to_speech_tpu.utils.process import run_in_thread

        @run_in_thread(callback = lambda out: 1 / 0)
        def add(a, b):
            return a + b

        # a crashing completion callback must not poison the stored result
        assert add(2, 3).get(timeout = 5) == 5


class TestRequestManager:
    def test_roundtrip_and_routing(self):
        import threading
        from text_to_speech_tpu.utils.request_manager import StreamRequestManager

        parent, child = StreamRequestManager()
        ra, buf_a = parent.open_request()
        rb, buf_b = parent.open_request('named')
        assert rb == 'named'

        def producer():
            child.wait_finalize  # attribute exists
            child(1, request_id = ra)
            child('x', request_id = rb)
            child(2, request_id = ra)
            child.finalize(ra)
            child('y', request_id = rb)
            child.finalize(rb)

        t = threading.Thread(target = producer)
        t.start(); t.join(5)

        assert list(parent.results(ra, timeout = 5)) == [1, 2]
        assert list(parent.results(rb, timeout = 5)) == ['x', 'y']

    def test_abort_observed_by_child(self):
        import time
        from text_to_speech_tpu.utils.request_manager import StreamRequestManager

        parent, child = StreamRequestManager()
        rid, buf = parent.open_request()
        time.sleep(0.05)                     # let the child register the init
        assert child(0, request_id = rid)    # active
        parent.abort_request(rid)
        for _ in range(100):                 # abort propagates asynchronously
            if child.is_stopped(rid): break
            time.sleep(0.01)
        assert child.is_stopped(rid)
        assert child(1, request_id = rid) is False
        assert child.finalize(rid) is False  # aborted → finalize returns False

    def test_wait_finalize(self):
        import time, threading
        from text_to_speech_tpu.utils.request_manager import StreamRequestManager

        parent, child = StreamRequestManager()
        rid, _ = parent.open_request()
        time.sleep(0.05)
        out = {}

        def waiter():
            out['finalized'] = child.wait_finalize(rid, timeout = 5)

        t = threading.Thread(target = waiter); t.start()
        parent.finalize_request(rid)
        t.join(5)
        assert out['finalized'] is True

    def test_across_real_process(self):
        import multiprocessing as mp
        from text_to_speech_tpu.utils.request_manager import (
            StreamRequestManager, ChildRequestManager,
        )

        parent_pipe, child_pipe = mp.Pipe()
        from text_to_speech_tpu.utils.request_manager import ParentRequestManager
        parent = ParentRequestManager(parent_pipe)
        ra, buf_a = parent.open_request(0)
        rb, buf_b = parent.open_request(1)

        proc = mp.Process(
            target = _rm_proc_main, args = (child_pipe,), daemon = True)
        proc.start()
        got_a = list(parent.results(0, timeout = 15))
        got_b = list(parent.results(1, timeout = 15))
        proc.join(10)
        assert got_a == [0, 1, 4] and got_b == [0, 1, 4]


def _rm_proc_main(pipe):
    from text_to_speech_tpu.utils.request_manager import ChildRequestManager
    child = ChildRequestManager(pipe)
    for rid in (0, 1):
        for i in range(3):
            child(i * i, request_id = rid)
        child.finalize(rid)


class TestGenericConversions:
    def test_convert_to_str(self):
        from text_to_speech_tpu.utils.generic_utils import convert_to_str
        assert convert_to_str(b'abc') == 'abc'
        assert convert_to_str(['a', b'b']) == ['a', 'b']
        assert convert_to_str({b'k': b'v'}) == {'k': 'v'}
        arr = np.array([1.0, 2.0])
        assert convert_to_str(arr) is arr           # numeric passthrough
        assert convert_to_str(np.array(b'z')) == 'z'

    def test_get_enum_item(self):
        import enum
        from text_to_speech_tpu.utils.generic_utils import get_enum_item

        class Color(enum.Enum):
            RED = 'red'
            BLUE = 'blue'

        assert get_enum_item(Color.RED, Color) is Color.RED
        assert get_enum_item('red', Color) is Color.RED     # by value
        assert get_enum_item('BLUE', Color) is Color.BLUE   # by name
        with pytest.raises(KeyError):
            get_enum_item('green', Color)


class TestModelInfos:
    def test_get_model_infos_and_remove_ckpt(self, tmp_path, monkeypatch):
        from text_to_speech_tpu.models import saving
        monkeypatch.setattr(saving, '_PRETRAINED_ROOT', str(tmp_path))
        assert saving.get_model_infos(None) == {}
        assert saving.get_model_infos('missing') == {}
        saving.save_model_config('m1', {'class_name': 'Tacotron2', 'config': {}})
        assert saving.get_model_infos('m1')['class_name'] == 'Tacotron2'

        class Dummy:
            def get_config(self): return {'x': 1}
        infos = saving.get_model_infos(Dummy())
        assert infos == {'class_name': 'Dummy', 'config': {'x': 1}}

        ckpt = tmp_path / 'm1' / 'saving' / 'checkpoint'
        ckpt.mkdir(parents = True)
        (ckpt / 'ckpt-1.npz').write_bytes(b'x')
        removed = saving.remove_training_checkpoint('m1')
        assert removed == ['ckpt-1.npz'] and not list(ckpt.iterdir())


class TestRequestManagerFixes:
    def test_abort_terminates_parent_results(self):
        import time
        from text_to_speech_tpu.utils.request_manager import StreamRequestManager

        parent, child = StreamRequestManager()
        rid, _ = parent.open_request()
        time.sleep(0.05)
        child(1, request_id = rid)
        time.sleep(0.05)
        parent.abort_request(rid)
        # child stops streaming without ever finalizing; results still ends
        items = list(parent.results(rid, timeout = 5))
        assert items in ([1], [])       # item may or may not land before abort

    def test_wait_finalize_timeout_returns_false(self):
        from text_to_speech_tpu.utils.request_manager import StreamRequestManager
        parent, child = StreamRequestManager()
        rid, _ = parent.open_request()
        # never finalized → timeout → False (also safe pre-init)
        assert child.wait_finalize(rid, timeout = 0.2) is False

    def test_open_request_id_collision(self):
        import pytest
        from text_to_speech_tpu.utils.request_manager import StreamRequestManager
        parent, _ = StreamRequestManager()
        parent.open_request(1)
        with pytest.raises(ValueError):
            parent.open_request(1)
        auto, _ = parent.open_request()      # auto ids skip the named one
        assert auto != 1


class TestLoggerStyleAPI:
    def test_add_level_and_method(self):
        import logging
        from text_to_speech_tpu.loggers import add_level, get_level
        add_level(9, 'trace9')
        assert get_level('trace9') == 9
        lg = logging.getLogger('style-test')
        lg.setLevel(9)
        assert hasattr(lg, 'trace9')
        lg.trace9('works')

    def test_get_formatter_styles(self):
        import logging
        from text_to_speech_tpu.loggers import get_formatter
        f = get_formatter('extended')
        rec = logging.LogRecord('n', logging.INFO, 'p', 1, 'msg', (), None)
        assert 'INFO' in f.format(rec) and 'msg' in f.format(rec)
        # raw %-style string auto-detected
        f2 = get_formatter('%(levelname)s|%(message)s')
        assert f2.format(rec) == 'INFO|msg'

    def test_set_style(self):
        import io, logging
        from text_to_speech_tpu.loggers import add_handler, set_style
        buf = io.StringIO()
        lg = logging.getLogger('style-target')
        lg.handlers.clear()
        h = add_handler('stream', logger = 'style-target', stream = buf)
        set_style('basic', 'style-target')
        lg.warning('only-message')
        assert buf.getvalue().strip() == 'only-message'
        lg.removeHandler(h)


class TestFormatterRobustness:
    def test_dict_without_fmt_and_no_mutation(self):
        import logging
        from text_to_speech_tpu.loggers import get_formatter
        spec = {'style': '{'}
        f = get_formatter(spec)              # no fmt key → Formatter default
        assert isinstance(f, logging.Formatter)
        assert spec == {'style': '{'}        # caller dict unmutated

    def test_literal_percent_in_brace_format(self):
        import logging
        from text_to_speech_tpu.loggers import get_formatter
        f = get_formatter('{message} 50%')
        rec = logging.LogRecord('n', logging.INFO, 'p', 1, 'msg', (), None)
        assert f.format(rec) == 'msg 50%'


# smoke tier: host-side/cheap-compile tests that gate every commit
# (<3 min cold on one core; see pytest.ini)
pytestmark = [pytest.mark.smoke]
