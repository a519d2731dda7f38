"""Text-capable model mixin.

Capability parity with
``/root/reference/models/interfaces/base_text_model.py:22-96``: owns the
`Tokenizer` (encode/decode/clean delegation), persists it under
``saving/tokenizer.json``.
"""

import os

import numpy as np

from ...text import get_tokenizer, Tokenizer


class BaseTextModel:
    def _init_text(self, lang = None, tokenizer = None, ** kwargs):
        self.lang = lang
        saved = self._saved_tokenizer_file()
        if tokenizer is None and saved and os.path.exists(saved):
            self.tokenizer = Tokenizer.load_from_file(saved)
        else:
            self.tokenizer = get_tokenizer(tokenizer, lang = lang)

    def _saved_tokenizer_file(self):
        from .. import saving as saving_utils
        name = getattr(self, 'name', None) or ''
        if not name: return None
        return saving_utils.get_model_dir(name, 'saving', 'tokenizer.json')

    # -- delegation ------------------------------------------------------------

    @property
    def vocab_size(self):
        return self.tokenizer.vocab_size

    @property
    def blank_token_idx(self):
        return self.tokenizer.blank_token_idx

    def clean_text(self, text, ** kwargs):
        return self.tokenizer.clean_text(text, ** kwargs)

    def encode_text(self, text, ** kwargs):
        if isinstance(text, dict):
            text = text.get('text', text.get('content'))
        return self.tokenizer.encode(text, ** kwargs)

    prepare_input = encode_text

    def decode_text(self, ids, ** kwargs):
        return self.tokenizer.decode(np.asarray(ids), ** kwargs)

    # -- persistence -----------------------------------------------------------

    def get_config_text(self):
        return {'lang': self.lang}

    def get_saving_objects_text(self):
        return {'tokenizer.json': self.tokenizer}

    def _str_text(self):
        return '- lang : {}\n- vocab size : {}\n'.format(self.lang, self.vocab_size)
