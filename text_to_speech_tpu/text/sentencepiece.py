"""Self-contained SentencePiece: pure-Python ``.model`` protobuf reader /
writer + unigram-Viterbi and BPE-merge encoders.

Capability parity with the reference's
``utils/text/sentencepiece_tokenizer.py`` (which wraps the ``sentencepiece``
C++ package — not installed in this image) in the same spirit as this repo's
self-contained ``text/numbers.py`` (num2words replacement): zero external
dependency.  The ``.model`` file is a serialized ``ModelProto``; only the
fields the encoders need are materialized:

  ModelProto:       pieces = 1 (repeated), trainer_spec = 2, normalizer_spec = 3
  SentencePiece:    piece = 1 (string), score = 2 (float), type = 3 (enum:
                    NORMAL=1, UNKNOWN=2, CONTROL=3, USER_DEFINED=4, UNUSED=5,
                    BYTE=6)
  TrainerSpec:      model_type = 3 (UNIGRAM=1, BPE=2), unk_id = 40,
                    bos_id = 41, eos_id = 42, pad_id = 43
  NormalizerSpec:   name = 1, add_dummy_prefix = 3,
                    remove_extra_whitespaces = 4, escape_whitespaces = 5

Unigram encoding is exact Viterbi over piece log-probabilities with the
standard unknown penalty (min_score - 10); BPE encoding greedily applies the
best-scored adjacent merge (scores encode merge priority).  Whitespace is
escaped to U+2581 and an optional dummy prefix is added, matching the
sentencepiece normalizer defaults (NFKC via ``unicodedata``; the precompiled
charsmap is not replicated).
"""

import io
import struct
import unicodedata

WHITESPACE = '▁'   # ▁

NORMAL, UNKNOWN, CONTROL, USER_DEFINED, UNUSED, BYTE = 1, 2, 3, 4, 5, 6

UNIGRAM, BPE = 1, 2

_UNK_SURFACE = ' ⁇ '


# -- protobuf wire format ------------------------------------------------------

def _read_varint(buf, pos):
    result, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _write_varint(out, value):
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def parse_message(buf):
    """Walk a protobuf message → {field_number: [raw values]} (wire type 0 →
    int, 2 → bytes, 5 → 4 raw bytes, 1 → 8 raw bytes)."""
    fields = {}
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            value, pos = _read_varint(buf, pos)
        elif wire == 2:
            length, pos = _read_varint(buf, pos)
            value = buf[pos: pos + length]
            pos += length
        elif wire == 5:
            value = buf[pos: pos + 4]
            pos += 4
        elif wire == 1:
            value = buf[pos: pos + 8]
            pos += 8
        else:
            raise ValueError('unsupported wire type {}'.format(wire))
        fields.setdefault(field, []).append(value)
    return fields


def _emit(out, field, wire, value):
    _write_varint(out, (field << 3) | wire)
    if wire == 0:
        _write_varint(out, value)
    elif wire == 2:
        _write_varint(out, len(value))
        out.write(value)
    else:
        out.write(value)


# -- model ---------------------------------------------------------------------

class SentencePieceModel:
    """A loaded ``.model``: pieces + scores + types, the trainer/normalizer
    options that affect encoding, and exact unigram/BPE encoders."""

    def __init__(self, pieces, *, model_type = UNIGRAM,
                 unk_id = 0, bos_id = 1, eos_id = 2, pad_id = -1,
                 add_dummy_prefix = True, remove_extra_whitespaces = True,
                 escape_whitespaces = True, normalizer_name = 'nmt_nfkc'):
        #: list of (piece:str, score:float, type:int)
        self.pieces = [
            (p, float(s), int(t)) for p, s, t in (
                piece if len(piece) == 3 else (piece[0], piece[1], NORMAL)
                for piece in pieces
            )
        ]
        self.model_type = model_type
        self.unk_id, self.bos_id, self.eos_id, self.pad_id = \
            unk_id, bos_id, eos_id, pad_id
        self.add_dummy_prefix = add_dummy_prefix
        self.remove_extra_whitespaces = remove_extra_whitespaces
        self.escape_whitespaces = escape_whitespaces
        self.normalizer_name = normalizer_name

        self._piece_to_id = {p: i for i, (p, _, _) in enumerate(self.pieces)}
        self._byte_to_id = {
            int(p[1: -1], 16): i for i, (p, _, t) in enumerate(self.pieces)
            if t == BYTE
        }
        scores = [s for _, s, t in self.pieces if t not in (UNKNOWN, CONTROL)]
        self._min_score = min(scores) if scores else 0.
        self._max_piece_len = max(
            (len(p) for p, _, t in self.pieces if t not in (CONTROL, UNKNOWN)),
            default = 1,
        )

    # -- introspection ---------------------------------------------------------

    def __len__(self):
        return len(self.pieces)

    def piece_to_id(self, piece):
        return self._piece_to_id.get(piece, self.unk_id)

    def id_to_piece(self, idx):
        return self.pieces[idx][0]

    @property
    def byte_fallback(self):
        return bool(self._byte_to_id)

    # -- normalization ---------------------------------------------------------

    def normalize(self, text):
        if 'nfkc' in (self.normalizer_name or ''):
            text = unicodedata.normalize('NFKC', text)
        if self.remove_extra_whitespaces:
            text = ' '.join(text.split())
        if self.add_dummy_prefix and text:
            text = ' ' + text
        if self.escape_whitespaces:
            text = text.replace(' ', WHITESPACE)
        return text

    # -- encoding --------------------------------------------------------------

    def encode(self, text, *, out_type = int):
        """text → token ids (``out_type=str`` → surface pieces)."""
        norm = self.normalize(text)
        if not norm:
            return []
        ids = (self._encode_bpe(norm) if self.model_type == BPE
               else self._encode_unigram(norm))
        if out_type is str:
            return [self.pieces[i][0] for i in ids]
        return ids

    def encode_as_pieces(self, text):
        return self.encode(text, out_type = str)

    def _char_fallback(self, ch):
        """Unknown-character ids: byte pieces when present, else unk."""
        if self._byte_to_id:
            return [self._byte_to_id[b] for b in ch.encode('utf-8')]
        return [self.unk_id]

    def _encode_unigram(self, text):
        """Exact Viterbi segmentation maximizing the sum of piece scores;
        characters covered by no piece pay the standard unknown penalty."""
        n = len(text)
        unk_score = self._min_score - 10.
        best = [-float('inf')] * (n + 1)
        back = [None] * (n + 1)            # (start, piece_id or ('unk', ch))
        best[0] = 0.
        for i in range(n):
            if best[i] == -float('inf'):
                continue
            matched_single = False
            for j in range(i + 1, min(i + self._max_piece_len, n) + 1):
                pid = self._piece_to_id.get(text[i: j])
                if pid is None:
                    continue
                _, score, ptype = self.pieces[pid]
                if ptype in (CONTROL, UNKNOWN, UNUSED):
                    continue
                if j == i + 1:
                    matched_single = True
                cand = best[i] + score
                if cand > best[j]:
                    best[j], back[j] = cand, (i, pid)
            if not matched_single:
                cand = best[i] + unk_score
                if cand > best[i + 1]:
                    best[i + 1], back[i + 1] = cand, (i, ('unk', text[i]))
        # back-trace
        out, pos = [], n
        while pos > 0:
            start, what = back[pos]
            if isinstance(what, tuple):
                out.extend(reversed(self._char_fallback(what[1])))
            else:
                out.append(what)
            pos = start
        return out[::-1]

    def _encode_bpe(self, text):
        """Greedy highest-score adjacent merges (scores encode priority)."""
        symbols = list(text)
        while len(symbols) > 1:
            best_score, best_i = None, None
            for i in range(len(symbols) - 1):
                pid = self._piece_to_id.get(symbols[i] + symbols[i + 1])
                if pid is None:
                    continue
                score = self.pieces[pid][1]
                if best_score is None or score > best_score:
                    best_score, best_i = score, i
            if best_i is None:
                break
            symbols[best_i: best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
        out = []
        for sym in symbols:
            pid = self._piece_to_id.get(sym)
            if pid is not None and self.pieces[pid][2] not in (CONTROL, UNUSED):
                out.append(pid)
            else:
                for ch in sym:
                    out.extend(self._char_fallback(ch))
        return out

    # -- decoding --------------------------------------------------------------

    def decode(self, ids):
        parts, byte_run = [], []
        def flush():
            if byte_run:
                parts.append(bytes(byte_run).decode('utf-8', errors = 'replace'))
                del byte_run[:]
        for idx in ids:
            piece, _, ptype = self.pieces[idx]
            if ptype == BYTE:
                byte_run.append(int(piece[1: -1], 16))
                continue
            flush()
            if ptype == CONTROL:
                continue
            if ptype == UNKNOWN:
                parts.append(_UNK_SURFACE)
                continue
            parts.append(piece)
        flush()
        text = ''.join(parts).replace(WHITESPACE, ' ')
        return text[1:] if text.startswith(' ') and self.add_dummy_prefix else text

    # -- serialization ---------------------------------------------------------

    @classmethod
    def load(cls, path_or_bytes):
        """Read a ``.model`` file / serialized proto → SentencePieceModel."""
        if isinstance(path_or_bytes, (bytes, bytearray)):
            buf = bytes(path_or_bytes)
        else:
            with open(path_or_bytes, 'rb') as f:
                buf = f.read()
        root = parse_message(buf)

        pieces = []
        for raw in root.get(1, []):
            fields = parse_message(raw)
            piece = fields.get(1, [b''])[0].decode('utf-8')
            score = struct.unpack('<f', fields[2][0])[0] if 2 in fields else 0.
            ptype = fields.get(3, [NORMAL])[0]
            pieces.append((piece, score, ptype))

        kwargs = {}
        if 2 in root:
            trainer = parse_message(root[2][0])
            kwargs['model_type'] = trainer.get(3, [UNIGRAM])[0]
            for key, field in (('unk_id', 40), ('bos_id', 41),
                               ('eos_id', 42), ('pad_id', 43)):
                if field in trainer:
                    value = trainer[field][0]
                    # ids are proto int32: two's-complement varints for -1
                    if value >= 1 << 63:
                        value -= 1 << 64
                    kwargs[key] = value
        if 3 in root:
            norm = parse_message(root[3][0])
            if 1 in norm:
                kwargs['normalizer_name'] = norm[1][0].decode('utf-8')
            for key, field in (('add_dummy_prefix', 3),
                               ('remove_extra_whitespaces', 4),
                               ('escape_whitespaces', 5)):
                if field in norm:
                    kwargs[key] = bool(norm[field][0])
        return cls(pieces, ** kwargs)

    def serialize(self):
        """SentencePieceModel → ``.model`` bytes (round-trips with load)."""
        out = io.BytesIO()
        for piece, score, ptype in self.pieces:
            sub = io.BytesIO()
            _emit(sub, 1, 2, piece.encode('utf-8'))
            _emit(sub, 2, 5, struct.pack('<f', score))
            _emit(sub, 3, 0, ptype)
            _emit(out, 1, 2, sub.getvalue())

        trainer = io.BytesIO()
        _emit(trainer, 3, 0, self.model_type)
        for value, field in ((self.unk_id, 40), (self.bos_id, 41),
                             (self.eos_id, 42), (self.pad_id, 43)):
            _emit(trainer, field, 0, value & ((1 << 64) - 1))
        _emit(out, 2, 2, trainer.getvalue())

        norm = io.BytesIO()
        _emit(norm, 1, 2, (self.normalizer_name or '').encode('utf-8'))
        _emit(norm, 3, 0, int(self.add_dummy_prefix))
        _emit(norm, 4, 0, int(self.remove_extra_whitespaces))
        _emit(norm, 5, 0, int(self.escape_whitespaces))
        _emit(out, 3, 2, norm.getvalue())
        return out.getvalue()

    def save(self, path):
        with open(path, 'wb') as f:
            f.write(self.serialize())
        return path


# -- Tokenizer adapter ---------------------------------------------------------

class SentencePieceTokenizer:
    """Sub-word tokenizer over a ``SentencePieceModel``, presenting the same
    surface as ``text.tokenizer.Tokenizer`` (the reference's
    ``utils/text/sentencepiece_tokenizer.py`` adapter, without the external
    ``sentencepiece`` dependency).

    ``offset`` shifts every model id (the reference uses it when extra tokens
    are prepended to the combined vocabulary)."""

    def __init__(self, model, *, offset = 0, cleaners = (),
                 sos_token = None, eos_token = None, ukn_token = None,
                 use_sos_and_eos = False, ** _):
        from .cleaners import get_cleaners_fn
        if isinstance(model, (str, bytes, bytearray)):
            model = SentencePieceModel.load(model)
        self.model = model
        self.offset = int(offset)
        self.cleaners = list(cleaners) if isinstance(cleaners, (list, tuple)) \
            else [cleaners]
        self.cleaners_fn = get_cleaners_fn(self.cleaners)
        self.sos_token = sos_token
        self.eos_token = eos_token
        self.ukn_token = ukn_token
        self.use_sos_and_eos = use_sos_and_eos

    @property
    def vocab(self):
        return [p for p, _, _ in self.model.pieces]

    @property
    def vocab_size(self):
        return len(self.model) + self.offset

    def __len__(self):
        return self.vocab_size

    def __repr__(self):
        return 'SentencePieceTokenizer(vocab_size={}, offset={})'.format(
            self.vocab_size, self.offset)

    @property
    def sos_token_idx(self):
        return self.model.bos_id + self.offset if self.model.bos_id >= 0 else None

    @property
    def eos_token_idx(self):
        return self.model.eos_id + self.offset if self.model.eos_id >= 0 else None

    @property
    def blank_token_idx(self):
        return self.model.pad_id + self.offset if self.model.pad_id >= 0 else 0

    def clean_text(self, text, ** kwargs):
        from .cleaners import clean_text
        return clean_text(text, self.cleaners_fn, ** kwargs)

    def split_text(self, text):
        return self.model.encode_as_pieces(text)

    def encode(self, text, *, cleaned = False, add_sos_and_eos = None, ** kwargs):
        import numpy as np
        if isinstance(text, (list, tuple)):
            return [self.encode(t, cleaned = cleaned, ** kwargs) for t in text]
        if add_sos_and_eos is None: add_sos_and_eos = self.use_sos_and_eos
        if not cleaned:
            text = self.clean_text(text, ** kwargs)
        ids = [i + self.offset for i in self.model.encode(text)]
        if add_sos_and_eos:
            if self.sos_token_idx is not None: ids.insert(0, self.sos_token_idx)
            if self.eos_token_idx is not None: ids.append(self.eos_token_idx)
        return np.asarray(ids, dtype = np.int32)

    __call__ = encode

    def decode(self, ids, *, skip_special = True, ** _):
        import numpy as np
        ids = np.asarray(ids)
        if ids.ndim > 1:
            return [self.decode(row, skip_special = skip_special) for row in ids]
        model_ids = [int(i) - self.offset for i in ids
                     if 0 <= int(i) - self.offset < len(self.model)]
        return self.model.decode(model_ids)

    def get_config(self):
        return {
            'class': 'SentencePieceTokenizer',
            'offset': self.offset,
            'cleaners': [c for c in self.cleaners if isinstance(c, (str, dict))],
            'use_sos_and_eos': self.use_sos_and_eos,
        }

    def save(self, filename):
        from ..utils.file_utils import dump_json
        if not filename.endswith('.json'): filename += '.json'
        model_path = filename[: -len('.json')] + '.model'
        self.model.save(model_path)
        config = self.get_config()
        config['model'] = model_path
        dump_json(filename, config, indent = 2)
        return filename

    save_to_file = save

    @classmethod
    def load_from_file(cls, filename):
        from ..utils.file_utils import load_json
        config = load_json(filename)
        config.pop('class', None)
        return cls(config.pop('model'), ** config)
