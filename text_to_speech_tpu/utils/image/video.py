"""Video reading / writing / streaming.

Capability parity with ``/root/reference/utils/image/video/`` (FFMPEGReader:
ffmpeg_reader.py:29, FFMPEGWriter/OpenCVWriter: writer.py:44-114,
set_video_audio: writer.py:116, HTTPScreenMirror: http_screen_mirror.py:22)
and the streaming entry points in ``/root/reference/utils/image/image_io.py``
(stream_camera :181, frame_generator :391, build_gif :463, build_sprite :503).

TPU-native design notes: unlike the reference (which drives the
``ffmpeg-python`` graph builder), everything here talks to the ``ffmpeg`` /
``ffprobe`` *binaries* directly over pipes — the same pattern as
``ops/audio_io.read_ffmpeg`` — so there is zero package dependency; cv2 and
PIL are optional and only gated where genuinely needed (camera capture,
window display, GIF assembly).  Frames cross the pipe as raw rgb24/rgb48le
planes, i.e. already in the (H, W, 3) uint8/uint16 layout the model stack's
``load_image`` consumes.
"""

import os
import json
import time
import queue
import logging
import shutil
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_DELAY_SEC = 1e-3
_STOP = object()


def _ffmpeg_available():
    return shutil.which('ffmpeg') is not None


def _ffprobe_available():
    return shutil.which('ffprobe') is not None


_probe_cache = {}


def probe_video(path):
    """``ffprobe`` a media file → parsed JSON (cached per path)."""
    if path in _probe_cache:
        return _probe_cache[path]
    if not _ffprobe_available():
        raise RuntimeError('ffprobe is required to probe {!r}'.format(path))
    out = subprocess.run(
        ['ffprobe', '-v', 'quiet', '-print_format', 'json', '-show_format',
         '-show_streams', path],
        capture_output = True, check = True,
    ).stdout
    _probe_cache[path] = json.loads(out)
    return _probe_cache[path]


def get_video_info(path):
    """First video stream's metadata dict from `probe_video`."""
    return next(s for s in probe_video(path)['streams']
                if s.get('codec_type') == 'video')


def _get_frame_size(path, kwargs):
    """(h, w) from explicit kwargs or by probing the file (reference
    semantics: ffmpeg_reader.py:201)."""
    if 'image_h' in kwargs and 'image_w' in kwargs:
        return (kwargs['image_h'], kwargs['image_w'])
    if 'height' in kwargs and 'width' in kwargs:
        return (kwargs['height'], kwargs['width'])
    if 'image_shape' in kwargs:
        return tuple(kwargs['image_shape'][:2])
    if 's' in kwargs:
        w, h = str(kwargs['s']).split('x')
        return (int(h), int(w))
    if path:
        infos = get_video_info(path)
        return (int(infos['height']), int(infos['width']))
    raise ValueError('You must specify the frame shape')


class FFMPEGReader:
    """Stream decoded frames from any ffmpeg-readable source over a pipe.

    Frames arrive as raw ``rgb24`` (or ``rgb48le`` when `use_10bits`)
    planes; `read()` returns ``(ok, frame)`` with frame shaped (H, W, 3)
    uint8/uint16 (or ``(batch, H, W, 3)`` when `batch_size`).  Context
    manager + iterator protocols match the reference reader.
    """

    def __init__(self, path, *, to_numpy = True, batch_size = 0,
                 use_10bits = False, fps = None, quiet = True, ** kwargs):
        if not _ffmpeg_available():
            raise RuntimeError('ffmpeg is required to read {!r}'.format(path))
        assert isinstance(path, str), \
            'The path should be a file/device path, got {!r}'.format(path)

        self.path = path
        self.config = dict(kwargs)
        self.height, self.width = _get_frame_size(path, kwargs)
        self.to_numpy = to_numpy
        self.batch_size = batch_size
        self.use_10bits = use_10bits

        bpp = 3 * (2 if use_10bits else 1)
        self.bytes_per_frame = self.width * self.height * bpp
        if batch_size:
            self.bytes_per_frame *= batch_size

        cmd = ['ffmpeg', '-v', 'quiet' if quiet else 'error']
        for k, v in self.config.items():
            cmd += ['-{}'.format(k), str(v)]
        cmd += ['-i', path]
        if fps:
            cmd += ['-r', str(fps)]
        cmd += ['-f', 'rawvideo', '-pix_fmt', self.pixel_format, 'pipe:']
        self.proc = subprocess.Popen(
            cmd, stdout = subprocess.PIPE,
            stderr = subprocess.DEVNULL if quiet else None)

    @property
    def pixel_format(self):
        return 'rgb48le' if self.use_10bits else 'rgb24'

    @property
    def framerate(self):
        if 'framerate' in self.config:
            return self.config['framerate']
        num, den = get_video_info(self.path)['avg_frame_rate'].split('/')
        return int(num) / max(int(den), 1)

    def __len__(self):
        info = get_video_info(self.path)
        return int(info.get('nb_frames', -1))

    def __str__(self):
        return 'FFMPEGReader {} {}x{} {}'.format(
            self.path, self.width, self.height, self.pixel_format)

    def __enter__(self):
        return self

    def __exit__(self, * args):
        self.release()

    def __iter__(self):
        while True:
            ok, frame = self.read()
            if not ok:
                return
            yield frame

    def read(self):
        data = self.proc.stdout.read(self.bytes_per_frame)
        if len(data) < self.bytes_per_frame:
            return False, None
        if not self.to_numpy:
            return True, data
        dtype = np.uint16 if self.use_10bits else np.uint8
        shape = (self.height, self.width, 3)
        if self.batch_size:
            shape = (-1, ) + shape
        return True, np.frombuffer(data, dtype).reshape(shape)

    def release(self):
        try:
            self.proc.stdout.close()
            self.proc.terminate()
            self.proc.wait(timeout = 5.)
        except Exception as e:
            logger.error('Error while closing %s: %s', self.path, e)

    def get_writer_config(self, codec = 'libx264', ** kwargs):
        """Config dict for an `FFMPEGWriter` matching this stream."""
        return {
            's': '{}x{}'.format(self.width, self.height),
            'framerate': self.framerate,
            'input_format': self.pixel_format,
            'vcodec': codec,
            ** kwargs,
        }


class VideoWriter:
    """ABC: frame sink with `write(frame)` / `release()` (reference
    writer.py:22)."""

    def __init__(self, path, framerate, audio = None, ** kwargs):
        self.path = path
        self.audio = audio
        self.config = dict(kwargs)
        self.framerate = framerate
        self.height, self.width = _get_frame_size(None, kwargs)

    def __enter__(self):
        return self

    def __exit__(self, * args):
        self.release()

    def write(self, frame):
        raise NotImplementedError()

    def release(self):
        raise NotImplementedError()


class FFMPEGWriter(VideoWriter):
    """Encode frames pushed over a rawvideo pipe; optional audio mux.

    `compression`: False → lossless (crf 0), 'low' → crf 18 fast,
    'high' → crf 28 veryslow (reference writer.py:53-55).
    """

    def __init__(self, * args, input_format = 'rgb24', compression = None,
                 ** kwargs):
        super().__init__(* args, ** kwargs)
        if not _ffmpeg_available():
            raise RuntimeError('ffmpeg is required to write video')
        self.input_format = input_format

        out_opts = {k: v for k, v in self.config.items()
                    if k not in ('image_h', 'image_w', 'image_shape',
                                 'height', 'width', 's')}
        if compression is False:
            out_opts['crf'] = '0'
        elif compression == 'low':
            out_opts.update(crf = '18', preset = 'fast')
        elif compression == 'high':
            out_opts.update(crf = '28', preset = 'veryslow')

        cmd = ['ffmpeg', '-v', 'error', '-y',
               '-f', 'rawvideo', '-s',
               '{}x{}'.format(self.width, self.height),
               '-r', str(self.framerate), '-pix_fmt', input_format,
               '-i', 'pipe:']
        if self.audio:
            cmd += ['-i', str(self.audio), '-map', '0:v', '-map', '1:a',
                    '-acodec', str(out_opts.pop('acodec', 'copy')),
                    '-shortest']
        for k, v in out_opts.items():
            cmd += ['-{}'.format(k), str(v)]
        cmd += [self.path]
        self.proc = subprocess.Popen(cmd, stdin = subprocess.PIPE)

    def __str__(self):
        return 'FFMPEGWriter {} {}'.format(self.path, self.config)

    def write(self, frame):
        if isinstance(frame, np.ndarray):
            if np.issubdtype(frame.dtype, np.floating):
                out_dtype = 'uint8' if self.input_format == 'rgb24' \
                    else 'uint16'
                frame = (np.clip(frame, 0., 1.)
                         * np.iinfo(out_dtype).max).astype(out_dtype)
            frame = frame.tobytes()
        self.proc.stdin.write(frame)

    def release(self):
        self.proc.stdin.close()
        self.proc.wait()


class OpenCVWriter(VideoWriter):
    """cv2.VideoWriter sink (BGR, uint8); audio muxed at release."""

    def __init__(self, * args, ** kwargs):
        import cv2
        super().__init__(* args, ** kwargs)
        self.writer = cv2.VideoWriter(
            self.path, cv2.VideoWriter_fourcc(* 'MPEG'),
            self.framerate, (self.width, self.height))

    def write(self, frame):
        frame = np.asarray(frame)
        if np.issubdtype(frame.dtype, np.floating):
            frame = (np.clip(frame, 0., 1.) * 255).astype(np.uint8)
        self.writer.write(frame[:, :, ::-1])

    def release(self):
        self.writer.release()
        if self.audio is not None:
            set_video_audio(self.path, self.audio)


def set_video_audio(video_filename, audio_filename, *, codec = 'aac',
                    bitrate = '128k', blocking = True):
    """Mux `audio_filename`'s audio track into `video_filename` in place
    (reference image_io.py:167 / writer.py:116)."""
    if not _ffmpeg_available():
        raise RuntimeError('ffmpeg is required to mux audio')
    base, _, ext = video_filename.rpartition('.')
    tmp = base + '_muxed.' + ext
    cmd = ['ffmpeg', '-v', 'error', '-y', '-i', video_filename,
           '-i', audio_filename, '-map', '0:v', '-map', '1:a',
           '-c:v', 'copy', '-c:a', codec, '-b:a', bitrate,
           '-shortest', tmp]
    if blocking:
        subprocess.run(cmd, check = True)
        os.replace(tmp, video_filename)
        return video_filename
    return subprocess.Popen(cmd)


class HTTPScreenMirror:
    """Poll JPEG frames from an HTTP screen-mirror endpoint (`read()`
    camera protocol — reference http_screen_mirror.py:22)."""

    def __init__(self, url, min_time = 0.1, ** _):
        self.url = url
        self.min_time = min_time
        self.last_time = 0.

    def __str__(self):
        return 'HTTP Screen Mirror ({})'.format(self.url)

    def read(self):
        from io import BytesIO
        from urllib.request import urlopen
        from PIL import Image

        wait = self.min_time - (time.time() - self.last_time)
        if wait > 0:
            time.sleep(wait)
        try:
            data = urlopen('{}/{}.jpg'.format(
                self.url, int(time.time() * 1000)), timeout = 5.).read()
            if not data:
                return False, None
            return True, np.array(Image.open(BytesIO(data)))
        except Exception as e:
            logger.warning('Exception while reading frame: %s', e)
            return False, None
        finally:
            self.last_time = time.time()

    def release(self):
        pass


def _open_source(source, ** kwargs):
    """Normalize a frame source to an object with read()/release().

    str → FFMPEGReader (file/device); int → cv2 camera; anything with a
    `read` method passes through (e.g. HTTPScreenMirror).
    """
    if isinstance(source, str):
        return FFMPEGReader(source, ** kwargs)
    if isinstance(source, int):
        import cv2

        class _CV2Camera:
            def __init__(self, cam_id):
                self.cap = cv2.VideoCapture(cam_id)

            def read(self):
                ok, frame = self.cap.read()
                if not ok:
                    return False, None
                return True, frame[..., ::-1]          # BGR → RGB

            def release(self):
                self.cap.release()

        return _CV2Camera(source)
    assert hasattr(source, 'read'), \
        'Invalid source (no read() method): {!r}'.format(source)
    return source


def frame_generator(source, *, fps = None, max_time = None, nb_frames = -1,
                    frames_step = 1, frames_offset = 0, add_copy = False,
                    add_index = False, max_failures = 5, ** kwargs):
    """Yield up to `fps` frames/second from `source` (reference
    image_io.py:391): rate-limits, skips `frames_offset` then 1 of every
    `frames_step`, stops after `nb_frames` / `max_time` / `max_failures`
    consecutive read failures."""
    camera = _open_source(source, ** kwargs)
    owns = camera is not source or isinstance(source, (int, str))
    fps_time = (1. / fps) if fps else None
    if not max_time:
        max_time = -1
    if not nb_frames:
        nb_frames = -1

    try:
        for _ in range(frames_offset):
            camera.read()

        start = time.time()
        idx, failed = 0, 0
        last = start
        while (failed <= max_failures
               and (nb_frames < 0 or idx < nb_frames)
               and (max_time < 0 or time.time() - start < max_time)):
            ok, frame = camera.read()
            if not ok:
                failed += 1
                continue
            failed = 0
            idx += 1
            if frames_step > 1 and (idx - 1) % frames_step != 0:
                continue

            if add_copy or add_index:
                data = {'image': frame, 'frame_index': idx - 1}
                if add_copy:
                    data['image_copy'] = np.array(frame, copy = True)
                yield data
            else:
                yield frame

            if fps_time:
                now = time.time()
                wait = fps_time - (now - last) - _DELAY_SEC
                if wait > 0:
                    time.sleep(wait)
                last = time.time()
    finally:
        if owns:
            camera.release()


def stream_camera(source = 0, *, max_time = None, nb_frames = -1,
                  frames_step = 1, frames_offset = 0, fps = None,
                  buffer_size = 5, add_copy = False, add_index = False,
                  transform_fn = None, output_file = None,
                  transformed_file = None, output_fps = None,
                  copy_audio = True, show = False, ** kwargs):
    """Stream a camera / video file through an optional transform, saving
    the raw and/or transformed streams (reference image_io.py:181).

    The transform runs on one worker thread behind a bounded queue so a
    slow transform back-pressures capture instead of buffering unboundedly;
    writers are `FFMPEGWriter` pipes.  `show` requires cv2 and displays the
    (transformed) stream.  Returns the number of frames processed.
    """
    import threading

    if isinstance(source, str) and output_fps is None:
        # probe only — instantiating FFMPEGReader here would leak a live
        # decode subprocess just to read the frame rate
        if _ffprobe_available():
            num, den = get_video_info(source)['avg_frame_rate'].split('/')
            output_fps = float(num) / max(float(den), 1.)
        else:
            output_fps = fps or 25.
    if output_fps is None:
        output_fps = fps or 25.

    writers = []
    # writer holders are [writer_or_None, path]: the FFMPEGWriter is created
    # lazily at the first frame, when the frame shape is known
    raw_writer = [None, output_file] if output_file else None
    tr_writer = [None, transformed_file] if transformed_file else None

    def write_to(holder, frame):
        if holder[0] is None:
            h, w = np.asarray(frame).shape[:2]
            os.makedirs(os.path.dirname(holder[1]) or '.', exist_ok = True)
            holder[0] = FFMPEGWriter(
                holder[1], output_fps, image_h = h, image_w = w)
            writers.append(holder[0])
        holder[0].write(frame)

    display = None
    if show:
        import cv2

        def display(frame):                            # noqa: F811
            arr = np.asarray(frame)
            if np.issubdtype(arr.dtype, np.floating):
                arr = (np.clip(arr, 0., 1.) * 255).astype(np.uint8)
            cv2.imshow('stream', arr[:, :, ::-1])
            cv2.waitKey(1)

    post = []
    if tr_writer is not None:
        post.append(lambda f: write_to(tr_writer, f))
    if display is not None:
        post.append(display)

    transform = None
    worker = None
    errors = []
    if transform_fn is not None:
        work = queue.Queue(maxsize = max(buffer_size, 1))

        def run_worker():
            while True:
                item = work.get()
                if item is _STOP:
                    return
                try:
                    out = transform_fn(item, ** kwargs)
                    for fn in post:
                        fn(out)
                except Exception as e:      # isolate, keep streaming
                    logger.exception('transform failed')
                    errors.append(e)

        worker = threading.Thread(target = run_worker, daemon = True)
        worker.start()
        transform = work.put

    count = 0
    try:
        for frame in frame_generator(
                source, fps = fps, max_time = max_time,
                nb_frames = nb_frames, frames_step = frames_step,
                frames_offset = frames_offset, add_copy = add_copy,
                add_index = add_index):
            raw = frame['image'] if isinstance(frame, dict) else frame
            if raw_writer is not None:
                write_to(raw_writer, raw)
            if transform is not None:
                transform(frame)
            elif post:
                for fn in post:
                    fn(raw if not isinstance(frame, dict) else frame['image'])
            count += 1
    finally:
        if worker is not None:
            transform(_STOP)
            worker.join()
        for w in writers:
            try:
                w.release()
            except Exception:
                pass
        if show:
            import cv2
            cv2.destroyAllWindows()

    if copy_audio and isinstance(source, str):
        for holder in (raw_writer, tr_writer):
            if holder and holder[0] is not None:
                try:
                    set_video_audio(holder[1], source)
                except Exception as e:
                    logger.warning('audio mux failed: %s', e)
    return count


def build_gif(images, filename = 'result.gif', *, fps = 5, n_repeat = 0,
              keep_frames = 1):
    """Assemble frames into a GIF (reference image_io.py:463): `images` is
    an iterable of arrays/paths or a directory; 1 of every `keep_frames`
    frames is kept; `n_repeat` = extra loops (0 = loop forever)."""
    from PIL import Image
    from .image_io import load_image

    if isinstance(images, str) and os.path.isdir(images):
        images = [os.path.join(images, f) for f in sorted(os.listdir(images))]
    frames = []
    for i, img in enumerate(images):
        if i % keep_frames != 0:
            continue
        arr = load_image(img, dtype = None) if isinstance(img, str) \
            else np.asarray(img)
        if np.issubdtype(arr.dtype, np.floating):
            arr = (np.clip(arr, 0., 1.) * 255).astype(np.uint8)
        if arr.ndim == 3 and arr.shape[-1] == 1:
            arr = arr[..., 0]
        frames.append(Image.fromarray(arr))
    if not frames:
        raise ValueError('no frames to write')
    frames[0].save(
        filename, save_all = True, append_images = frames[1:],
        duration = int(1000. / fps), loop = n_repeat)
    return filename


def build_sprite(images, *, image_size = 128, directory = None,
                 filename = 'sprite.jpg'):
    """Tile images into a square sprite sheet (reference image_io.py:503)."""
    from .image_io import load_image, resize_image, save_image

    if isinstance(images, str) and os.path.isdir(images):
        images = [os.path.join(images, f) for f in sorted(os.listdir(images))]
    arrays = []
    for img in images:
        arr = load_image(img, dtype = 'float32') if isinstance(img, str) \
            else np.asarray(img, np.float32)
        if arr.ndim == 2:
            arr = arr[..., None]
        if arr.shape[-1] == 1:
            arr = np.repeat(arr, 3, axis = -1)
        arrays.append(resize_image(arr, (image_size, image_size)))
    n = int(np.ceil(np.sqrt(len(arrays))))
    sprite = np.zeros((n * image_size, n * image_size, 3), np.float32)
    for i, arr in enumerate(arrays):
        r, c = divmod(i, n)
        sprite[r * image_size: (r + 1) * image_size,
               c * image_size: (c + 1) * image_size] = arr
    if directory:
        os.makedirs(directory, exist_ok = True)
        filename = os.path.join(directory, filename)
    return save_image(filename, sprite)
