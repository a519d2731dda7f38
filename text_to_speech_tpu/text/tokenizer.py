"""Text tokenizer (char / byte / BPE / word levels) with cleaner pipeline.

Capability parity with ``/root/reference/utils/text/tokenizer.py:53`` —
vocab + special tokens, cleaning before encoding, encode/decode, CTC decode,
JSON round-trip, and import from HuggingFace `transformers` tokenizers.
"""

import re
import logging

import numpy as np

from .cleaners import get_cleaners_fn, clean_text
from .processing import bytes_to_unicode, bpe

logger = logging.getLogger(__name__)


class TokenizerLevel:
    CHAR = 'char'
    BYTE = 'byte'
    BPE = 'bpe'
    WORD = 'word'

    _ALL = (CHAR, BYTE, BPE, WORD)

    @classmethod
    def normalize(cls, level):
        if isinstance(level, str) and level.lower() in cls._ALL:
            return level.lower()
        raise ValueError('Unknown tokenizer level: {}'.format(level))


def ctc_beam_search(logits, blank, beam_width = 8):
    """Prefix beam search for CTC (log domain).

    logits (T, V) → best label sequence (list of ids).  Tracks per-prefix
    (p_blank, p_non_blank) so repeats/blanks merge correctly
    (the `utils/text/ctc_decoder.py:36` capability).
    """
    logp = logits - _logsumexp(logits, axis = -1, keepdims = True)
    NEG = -1e30
    beams = {(): (0.0, NEG)}          # prefix -> (log p ending blank, ending non-blank)

    for t in range(logp.shape[0]):
        step = logp[t]
        new_beams = {}

        def add(prefix, pb, pnb):
            old_pb, old_pnb = new_beams.get(prefix, (NEG, NEG))
            new_beams[prefix] = (np.logaddexp(old_pb, pb),
                                 np.logaddexp(old_pnb, pnb))

        top_labels = np.argsort(-step)[: max(beam_width, 4)]
        for prefix, (pb, pnb) in beams.items():
            total = np.logaddexp(pb, pnb)
            # extend with blank: prefix unchanged
            add(prefix, total + step[blank], NEG)
            for c in top_labels:
                c = int(c)
                if c == blank: continue
                p_c = step[c]
                if prefix and prefix[-1] == c:
                    # repeat: same prefix only via non-blank path...
                    add(prefix, NEG, pnb + p_c)
                    # ...new (extended) prefix only after a blank
                    add(prefix + (c,), NEG, pb + p_c)
                else:
                    add(prefix + (c,), NEG, total + p_c)

        beams = dict(sorted(
            new_beams.items(),
            key = lambda kv: -np.logaddexp(kv[1][0], kv[1][1]),
        )[:beam_width])

    best = max(beams.items(), key = lambda kv: np.logaddexp(kv[1][0], kv[1][1]))
    return list(best[0])


def _logsumexp(x, axis = None, keepdims = False):
    m = np.max(x, axis = axis, keepdims = True)
    out = m + np.log(np.sum(np.exp(x - m), axis = axis, keepdims = True))
    return out if keepdims else np.squeeze(out, axis = axis)


DEFAULT_CHAT_TEMPLATE = '<|{role}|>\n{content}\n'


def render_chat_template(messages, template = None, *,
                         add_generation_prompt = True,
                         generation_role = 'assistant'):
    """Render chat messages to a single prompt string.

    `template` may be a callable, a ``{role}``/``{content}`` format string,
    or a Jinja template (detected by ``{%``/``{{`` — the format HF
    tokenizers ship, reference ``tokenizer.py:463``)."""
    if callable(template):
        return template(messages, add_generation_prompt)
    if isinstance(messages, str):
        messages = [{'role': 'user', 'content': messages}]
    if isinstance(template, str) and ('{%' in template or '{{' in template):
        import jinja2
        env = jinja2.Environment(trim_blocks = True, lstrip_blocks = True)
        env.globals['raise_exception'] = _jinja_raise
        return env.from_string(template).render(
            messages = messages,
            add_generation_prompt = add_generation_prompt,
        )
    fmt = template or DEFAULT_CHAT_TEMPLATE
    text = ''.join(
        fmt.format(role = m.get('role', 'user'), content = m.get('content', ''))
        for m in messages
    )
    if add_generation_prompt:
        text += fmt.split('{content}')[0].format(role = generation_role)
    return text


def _jinja_raise(message):
    raise ValueError(message)


def pretty_print_template(template = None):
    print(render_chat_template(
        [{'role': 'system', 'content': '<system prompt>'},
         {'role': 'user', 'content': '<user message>'}],
        template,
    ))


class Tokenizer:
    def __init__(self,
                 vocab,
                 level = 'char',
                 *,
                 cleaners = (),
                 bpe_ranks = None,
                 sos_token = None,
                 eos_token = None,
                 blank_token = None,
                 ukn_token = None,
                 sep_token = None,
                 mask_token = None,
                 use_sos_and_eos = False,
                 lstrip = False,
                 rstrip = False,
                 split_pattern = None,
                 bpe_end_of_word = None,
                 ** kwargs
                ):
        self.level = TokenizerLevel.normalize(level)
        self.vocab = list(vocab)
        if self.level == TokenizerLevel.BYTE and self.vocab and isinstance(
                self.vocab[0], int):
            # byte vocabs are canonically chr(0..255) strings; normalize an
            # int vocab so encode's string units resolve (would otherwise
            # silently encode everything to unknown/empty)
            self.vocab = [chr(b) for b in self.vocab]
        self.cleaners = cleaners if isinstance(cleaners, (list, tuple)) else [cleaners]
        self.cleaners_fn = get_cleaners_fn(self.cleaners)

        self.sos_token = sos_token
        self.eos_token = eos_token
        self.blank_token = blank_token if blank_token is not None else (
            self.vocab[0] if self.vocab else None
        )
        self.ukn_token = ukn_token
        self.sep_token = sep_token
        self.mask_token = mask_token
        self.use_sos_and_eos = use_sos_and_eos

        self.lstrip = lstrip
        self.rstrip = rstrip
        self.split_pattern = split_pattern
        self.bpe_end_of_word = bpe_end_of_word

        self._token_to_idx = {tok: i for i, tok in enumerate(self.vocab)}
        self.bpe_ranks = None
        self._bpe_cache = {}
        self._byte_encoder = None
        if self.level == TokenizerLevel.BPE:
            if bpe_ranks is None:
                raise ValueError('BPE level requires `bpe_ranks` (pair merge table)')
            self.bpe_ranks = {
                tuple(k) if not isinstance(k, tuple) else k: v
                for k, v in (bpe_ranks.items() if isinstance(bpe_ranks, dict) else
                             {tuple(p): i for i, p in enumerate(bpe_ranks)}.items())
            }
            self._byte_encoder = bytes_to_unicode()
            self._byte_decoder = {v: k for k, v in self._byte_encoder.items()}

    # -- properties ------------------------------------------------------------

    @property
    def vocab_size(self):
        return len(self.vocab)

    def token_idx(self, token, default = None):
        idx = self._token_to_idx.get(token, None)
        if idx is None and default is not None:
            return self._token_to_idx.get(default, None)
        return idx

    @property
    def sos_token_idx(self):
        return self.token_idx(self.sos_token)

    @property
    def eos_token_idx(self):
        return self.token_idx(self.eos_token)

    @property
    def blank_token_idx(self):
        idx = self.token_idx(self.blank_token)
        return idx if idx is not None else 0

    @property
    def ukn_token_idx(self):
        return self.token_idx(self.ukn_token)

    def __len__(self):
        return self.vocab_size

    def __repr__(self):
        return 'Tokenizer(level={}, vocab_size={}, cleaners={})'.format(
            self.level, self.vocab_size, list(self.cleaners)
        )

    def __contains__(self, token):
        return token in self._token_to_idx

    # -- cleaning / splitting --------------------------------------------------

    def clean_text(self, text, ** kwargs):
        return clean_text(text, self.cleaners_fn, ** kwargs)

    def split_text(self, text):
        """Split cleaned text into unit strings according to the level."""
        if self.level == TokenizerLevel.CHAR:
            return list(text)
        if self.level == TokenizerLevel.BYTE:
            return [chr(b) for b in text.encode('utf-8')]
        if self.level == TokenizerLevel.WORD:
            pattern = self.split_pattern or r'\S+'
            return re.findall(pattern, text)
        # BPE: whitespace-split words → byte-encode → merge
        tokens = []
        for word in re.findall(self.split_pattern or r'\S+|\s', text):
            encoded = ''.join(self._byte_encoder[b] for b in word.encode('utf-8'))
            tokens.extend(bpe(encoded, self.bpe_ranks, self._bpe_cache,
                              end_of_word = self.bpe_end_of_word))
        return tokens

    # -- encode / decode -------------------------------------------------------

    def encode(self, text, *, cleaned = False, add_sos_and_eos = None, ** kwargs):
        """Clean then map `text` to an int32 numpy array of token ids.

        Unknown units map to `ukn_token` when set, otherwise are skipped
        (the char-level TTS behavior: unsupported characters are dropped).
        """
        if isinstance(text, (list, tuple)):
            return [self.encode(t, cleaned = cleaned, ** kwargs) for t in text]
        if add_sos_and_eos is None: add_sos_and_eos = self.use_sos_and_eos

        if not cleaned:
            text = self.clean_text(text, ** kwargs)

        ukn_idx = self.ukn_token_idx
        ids = []
        for unit in self.split_text(text):
            idx = self._token_to_idx.get(unit, None)
            if idx is None:
                idx = ukn_idx
                if idx is None:
                    continue
            ids.append(idx)

        if add_sos_and_eos:
            if self.sos_token_idx is not None: ids.insert(0, self.sos_token_idx)
            if self.eos_token_idx is not None: ids.append(self.eos_token_idx)
        return np.asarray(ids, dtype = np.int32)

    __call__ = encode

    def encode_chat(self, messages, *, template = None,
                    add_generation_prompt = True, ** kwargs):
        """Encode a chat as [{'role', 'content'}] messages.

        `template` may be: None (a simple role-tagged default), a format
        string with ``{role}``/``{content}``, or a callable
        ``(messages, add_generation_prompt) -> str``.  (The reference's
        Jinja chat-template capability, ``tokenizer.py:463``.)
        """
        text = render_chat_template(
            messages, template, add_generation_prompt = add_generation_prompt
        )
        return self.encode(text, ** kwargs)

    def decode(self, ids, *, skip_special = True, attach_words = True):
        """Map ids back to text."""
        ids = np.asarray(ids)
        if ids.ndim > 1:
            return [self.decode(row, skip_special = skip_special) for row in ids]
        special = {
            idx for idx in (
                self.sos_token_idx, self.eos_token_idx,
                self.token_idx(self.blank_token), self.token_idx(self.mask_token),
            ) if idx is not None
        } if skip_special else set()

        units = [self.vocab[i] for i in ids if 0 <= i < self.vocab_size and i not in special]
        if self.level == TokenizerLevel.BYTE:
            return bytes(ord(u) for u in units).decode('utf-8', 'replace')
        if self.level == TokenizerLevel.WORD:
            return ' '.join(units)
        if self.level == TokenizerLevel.BPE:
            text = ''.join(units)
            if self.bpe_end_of_word:
                # word-boundary marker (CLIP-style) carries the spaces
                text = text.replace(self.bpe_end_of_word, ' ')
            out = bytearray(
                self._byte_decoder.get(c, ord(' ')) for c in text
            ).decode('utf-8', 'replace')
            return out.rstrip() if self.bpe_end_of_word else out
        return ''.join(units)

    def ctc_decode(self, ids_or_logits, blank_index = None, *,
                   method = 'greedy', beam_width = 8):
        """CTC decode.

        - 'greedy': argmax (if logits), collapse repeats, drop blanks;
        - 'beam': prefix beam search over per-step log-probabilities
          (requires logits input).
        """
        arr = np.asarray(ids_or_logits)
        blank = blank_index if blank_index is not None else self.blank_token_idx

        if method == 'beam':
            if not (arr.ndim >= 2 and np.issubdtype(arr.dtype, np.floating)):
                raise ValueError('beam CTC decode requires (T, V) logits')
            if arr.ndim == 3:
                return [self.ctc_decode(row, blank, method = 'beam',
                                        beam_width = beam_width) for row in arr]
            ids = ctc_beam_search(arr, blank, beam_width)
            return self.decode(np.asarray(ids, np.int32))

        if arr.ndim >= 2 and np.issubdtype(arr.dtype, np.floating):
            arr = np.argmax(arr, axis = -1)
        if arr.ndim > 1:
            return [self.ctc_decode(row, blank_index) for row in arr]
        collapsed, prev = [], None
        for i in arr.tolist():
            if i != prev and i != blank:
                collapsed.append(i)
            prev = i
        return self.decode(np.asarray(collapsed, dtype = np.int32))

    # -- persistence -----------------------------------------------------------

    def get_config(self):
        config = {
            'vocab': self.vocab,
            'level': self.level,
            'cleaners': [c for c in self.cleaners if isinstance(c, (str, dict))] or list(self.cleaners),
            'sos_token': self.sos_token,
            'eos_token': self.eos_token,
            'blank_token': self.blank_token,
            'ukn_token': self.ukn_token,
            'sep_token': self.sep_token,
            'mask_token': self.mask_token,
            'use_sos_and_eos': self.use_sos_and_eos,
        }
        if self.bpe_ranks is not None:
            config['bpe_ranks'] = [list(pair) for pair in sorted(
                self.bpe_ranks, key = self.bpe_ranks.get
            )]
        if self.bpe_end_of_word:
            config['bpe_end_of_word'] = self.bpe_end_of_word
        if self.split_pattern:
            config['split_pattern'] = self.split_pattern
        return config

    def save(self, filename):
        from ..utils.file_utils import dump_json
        if not filename.endswith('.json'): filename += '.json'
        return dump_json(filename, self.get_config(), indent = 2)

    save_to_file = save

    @classmethod
    def load_from_file(cls, filename):
        from ..utils.file_utils import load_json
        config = load_json(filename)
        # serialized cleaner callables can't round-trip; keep named ones only
        config['cleaners'] = [c for c in config.get('cleaners', []) if isinstance(c, (str, dict, list))]
        return cls(** config)

    @classmethod
    def from_transformers_pretrained(cls, name, ** kwargs):
        """Wrap a HuggingFace tokenizer vocabulary as a word/BPE Tokenizer."""
        from transformers import AutoTokenizer
        hf = AutoTokenizer.from_pretrained(name, ** kwargs)
        vocab = [None] * len(hf.get_vocab())
        for tok, idx in hf.get_vocab().items():
            if idx < len(vocab): vocab[idx] = tok
        merges = None
        level = 'word'
        try:
            state = hf.backend_tokenizer.model.__getstate__()
            if isinstance(state, dict) and 'merges' in state:
                merges = [tuple(m) if not isinstance(m, str) else tuple(m.split(' '))
                          for m in state['merges']]
                level = 'bpe'
        except Exception:
            pass
        return cls(
            vocab,
            level = level,
            bpe_ranks = {m: i for i, m in enumerate(merges)} if merges else None,
            sos_token = hf.bos_token,
            eos_token = hf.eos_token,
            ukn_token = hf.unk_token,
            sep_token = hf.sep_token,
            mask_token = hf.mask_token,
            ** kwargs,
        )

    @classmethod
    def from_clip_pretrained(cls, merges = None, *, filename = None,
                             url = None, directory = None, ** kwargs):
        """Build the CLIP BPE tokenizer (``</w>`` end-of-word marker).

        The vocabulary is derived from the merge table exactly as CLIP does
        (reference ``utils/text/tokenizer.py:818``): 256 byte units, the same
        units with ``</w>`` appended, one entry per merge pair, then the
        start/end specials.  `merges` may be given directly as a list of
        pairs; otherwise `filename` (a local ``bpe_*.txt[.gz]``) or `url`
        (cached via ``download_file``) provides it.
        """
        if merges is None:
            if filename is None and url is not None:
                from ..utils.file_utils import download_file
                filename = download_file(url, directory = directory)
            if filename is None:
                raise ValueError('from_clip_pretrained needs `merges`, `filename` or `url`')
            if str(filename).endswith('.gz'):
                import gzip
                with gzip.open(filename) as file:
                    lines = file.read().decode('utf-8').split('\n')
            else:
                with open(filename, encoding = 'utf-8') as file:
                    lines = file.read().split('\n')
            # first line is a version header; table capped at CLIP's size
            merges = [tuple(line.split()) for line in lines[1: 49152 - 256 - 2 + 1]
                      if len(line.split()) == 2]
        merges = [tuple(pair) for pair in merges]

        byte_units = list(bytes_to_unicode().values())
        vocab = byte_units + [u + '</w>' for u in byte_units]
        vocab += [''.join(pair) for pair in merges]
        vocab += ['<|startoftext|>', '<|endoftext|>']

        kwargs.setdefault('cleaners', ['lowercase', 'collapse_whitespace'])
        kwargs.setdefault(
            'split_pattern',
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[A-Za-zÀ-ɏ]+|[0-9]|[^\sA-Za-zÀ-ɏ0-9]+",
        )
        return cls(
            vocab,
            level = 'bpe',
            bpe_ranks = {pair: i for i, pair in enumerate(merges)},
            bpe_end_of_word = '</w>',
            use_sos_and_eos = True,
            sos_token = '<|startoftext|>',
            eos_token = '<|endoftext|>',
            ** kwargs,
        )

    @classmethod
    def from_whisper_pretrained(cls, name = 'openai/whisper-base', ** kwargs):
        """Whisper's byte-level BPE, via the HF import path
        (reference ``utils/text/tokenizer.py:854``)."""
        return cls.from_transformers_pretrained(name, ** kwargs)
