import numpy as np
import pytest

from text_to_speech_tpu.text import (
    num2words, normalize_numbers, english_cleaners, french_cleaners,
    split_text, split_sentences, merge_texts, Tokenizer, get_tokenizer,
    en_symbols, fr_symbols, get_symbols, default_english_tokenizer,
    default_french_tokenizer, convert_to_ascii,
)


class TestNum2Words:
    @pytest.mark.parametrize('n,expected', [
        (0, 'zero'), (7, 'seven'), (13, 'thirteen'), (21, 'twenty-one'),
        (100, 'one hundred'), (101, 'one hundred one'), (345, 'three hundred forty-five'),
        (1000, 'one thousand'), (1017, 'one thousand seventeen'),
        (1000000, 'one million'), (123456, 'one hundred twenty-three thousand four hundred fifty-six'),
    ])
    def test_english_cardinals(self, n, expected):
        assert num2words(n, 'en') == expected

    @pytest.mark.parametrize('n,expected', [
        (1, 'first'), (2, 'second'), (3, 'third'), (4, 'fourth'), (5, 'fifth'),
        (12, 'twelfth'), (20, 'twentieth'), (21, 'twenty-first'), (100, 'one hundredth'),
    ])
    def test_english_ordinals(self, n, expected):
        assert num2words(n, 'en', ordinal = True) == expected

    @pytest.mark.parametrize('n,expected', [
        (0, 'zéro'), (1, 'un'), (16, 'seize'), (17, 'dix-sept'),
        (21, 'vingt et un'), (70, 'soixante-dix'), (71, 'soixante et onze'),
        (80, 'quatre-vingts'), (81, 'quatre-vingt-un'), (90, 'quatre-vingt-dix'),
        (99, 'quatre-vingt-dix-neuf'), (100, 'cent'), (200, 'deux cents'),
        (201, 'deux cent un'), (1000, 'mille'), (2000, 'deux mille'),
        (1000000, 'un million'), (2000000, 'deux millions'),
    ])
    def test_french_cardinals(self, n, expected):
        assert num2words(n, 'fr') == expected

    @pytest.mark.parametrize('n,expected', [
        (1, 'premier'), (2, 'deuxième'), (4, 'quatrième'), (5, 'cinquième'),
        (9, 'neuvième'), (21, 'vingt et unième'),
    ])
    def test_french_ordinals(self, n, expected):
        assert num2words(n, 'fr', ordinal = True) == expected

    def test_belgian(self):
        assert num2words(70, 'be') == 'septante'
        assert num2words(91, 'be') == 'nonante et un'

    @pytest.mark.parametrize('n,expected', [
        (70, 'septantième'), (71, 'septante et unième'), (75, 'septante-cinquième'),
        (90, 'nonantième'), (91, 'nonante et unième'), (97, 'nonante-septième'),
    ])
    def test_belgian_ordinals(self, n, expected):
        assert num2words(n, 'be', ordinal = True) == expected

    def test_decimal(self):
        assert num2words(3.14, 'en') == 'three point one four'
        assert num2words(3.5, 'fr') == 'trois virgule cinq'


class TestNormalizeNumbers:
    def test_plain(self):
        assert normalize_numbers('I have 3 cats') == 'I have three cats'

    def test_money(self):
        assert normalize_numbers('$5', 'en') == 'five dollars'
        assert normalize_numbers('$1.50', 'en') == 'one dollar, fifty cents'
        assert normalize_numbers('£3', 'en') == 'three pounds'

    def test_thousands(self):
        assert normalize_numbers('1,000 people') == 'one thousand people'

    def test_ordinal_suffix(self):
        assert normalize_numbers('the 3rd time') == 'the third time'
        assert 'troisième' in normalize_numbers('la 3ème fois', 'fr')

    def test_clock(self):
        out = normalize_numbers('at 10:30', 'en')
        assert 'ten hours' in out and 'thirty minutes' in out

    def test_decimal_text(self):
        assert normalize_numbers('pi is 3.14') == 'pi is three point one four'

    def test_fr_decimal_comma(self):
        assert 'trois virgule un quatre' in normalize_numbers('pi vaut 3,14', 'fr')

    def test_units(self):
        assert normalize_numbers('a 5km run', 'en') == 'a five kilometers run'
        assert normalize_numbers('1m wide', 'en') == 'one meter wide'
        assert normalize_numbers('440Hz tone', 'en') == 'four hundred forty hertz tone'
        assert normalize_numbers('3kg of flour', 'en') == 'three kilograms of flour'

    def test_units_per_time(self):
        assert normalize_numbers('at 90km/h', 'en') == 'at ninety kilometers per hour'
        assert normalize_numbers('à 90km/h', 'fr') == 'à quatre-vingt-dix kilomètres par heure'

    def test_unary_minus(self):
        assert normalize_numbers('it is -5 degrees', 'en') == 'it is minus five degrees'

    def test_binary_minus(self):
        out = normalize_numbers('3 - 1 = 2', 'en')
        assert 'three minus one' in out and 'equal' in out and 'two' in out

    def test_hyphen_not_minus(self):
        # word hyphens must survive: no digits around them
        assert normalize_numbers('well-known fact', 'en') == 'well-known fact'

    def test_belgian_full_text(self):
        # 'be' must survive through normalize_numbers (not collapse to 'fr')
        assert 'nonante et un' in normalize_numbers('il a 91 ans', 'be')
        assert 'septante-cinquième' in normalize_numbers('le 75ème jour', 'be')


class TestCleaners:
    def test_english_pipeline(self):
        out = english_cleaners('Dr. Smith   has 2 dogs!')
        assert out == 'doctor smith has two dogs!'

    def test_french_keeps_accents(self):
        out = french_cleaners('Le café coûte 2€')
        assert 'é' in out and 'deux euros' in out

    def test_ascii(self):
        assert convert_to_ascii('œuvre naïve') == 'oeuvre naive'
        assert convert_to_ascii('“hello”') == '"hello"'

    def test_symbols_expansion(self):
        assert 'percent' in english_cleaners('50% off')


class TestSplitText:
    def test_short_passthrough(self):
        assert split_text('hello world', 150) == ['hello world']

    def test_splits_sentences(self):
        text = 'First sentence is here. Second one follows. Third closes it.'
        chunks = split_text(text, 30)
        assert len(chunks) >= 2
        assert all(len(c) <= 30 for c in chunks)
        assert ' '.join(chunks).replace('  ', ' ') == text

    def test_long_word_clause(self):
        text = 'word ' * 40
        chunks = split_text(text.strip(), 25)
        assert all(len(c) <= 25 for c in chunks)

    def test_split_sentences(self):
        out = split_sentences('One. Two! Three?')
        assert out == ['One.', 'Two!', 'Three?']

    def test_merge(self):
        assert merge_texts(['a', 'b', 'c'], 3) == ['a b', 'c']


class TestTokenizer:
    def test_char_roundtrip(self):
        tok = default_english_tokenizer()
        ids = tok.encode('Hello world.')
        assert ids.dtype == np.int32
        assert tok.decode(ids) == 'hello world.'

    def test_cleaning_applied(self):
        tok = default_english_tokenizer()
        assert tok.decode(tok.encode('2 cats')) == 'two cats'

    def test_unknown_dropped(self):
        tok = Tokenizer(list('_abc '), level = 'char')  # '_' is the pad/blank
        assert tok.decode(tok.encode('abc xyz', cleaned = True)) == 'abc '
        # with ukn token, mapped instead
        tok2 = Tokenizer(list('abc?'), level = 'char', ukn_token = '?')
        assert tok2.decode(tok2.encode('ad', cleaned = True), skip_special = False) == 'a?'

    def test_sos_eos(self):
        tok = Tokenizer(['<s>', '</s>'] + list('ab'), level = 'char',
                        sos_token = '<s>', eos_token = '</s>', use_sos_and_eos = True)
        ids = tok.encode('ab', cleaned = True)
        assert ids[0] == 0 and ids[-1] == 1

    def test_json_roundtrip(self, tmp_path):
        tok = default_french_tokenizer()
        path = tok.save(str(tmp_path / 'tok.json'))
        tok2 = Tokenizer.load_from_file(path)
        assert tok2.vocab == tok.vocab
        text = 'bonjour à tous'
        assert np.array_equal(tok.encode(text), tok2.encode(text))

    def test_byte_level(self):
        tok = Tokenizer([chr(i) for i in range(256)], level = 'byte')
        ids = tok.encode('héllo', cleaned = True)
        assert tok.decode(ids) == 'héllo'

    def test_ctc_decode(self):
        tok = Tokenizer(list('_ab'), level = 'char', blank_token = '_')
        assert tok.ctc_decode(np.array([0, 1, 1, 0, 2, 2])) == 'ab'

    def test_get_tokenizer_lang(self):
        tok = get_tokenizer(lang = 'en')
        assert tok.level == 'char'
        assert tok.vocab == get_symbols('en', arpabet = False)

    def test_get_tokenizer_lang_positional(self):
        # bare lang code resolves to the default tokenizer, not an HF download
        tok = get_tokenizer('en')
        assert tok.level == 'char'
        out = tok.decode(tok.encode('at -3 degrees'))
        assert 'minus three' in out
        tok_be = get_tokenizer('be')
        assert 'nonante' in tok_be.decode(tok_be.encode('91 ans'))

    def test_symbols_match_reference_layout(self):
        # en: pad + '-' + 10 punct + 52 letters + 84 arpabet = 148
        assert len(en_symbols) == 148
        assert en_symbols[0] == '_'
        # fr: pad + '-' + 10 punct + 52 letters + 6 accents = 70
        assert len(fr_symbols) == 70


class TestPunctuationCleaners:
    def test_detach_attach_roundtrip(self):
        from text_to_speech_tpu.text.cleaners import (
            detach_punctuation, attach_punctuation)
        text = 'Hello, world (yes)!'
        detached = detach_punctuation(text)
        assert ' , ' in detached and ' ( ' in detached
        assert attach_punctuation(detached) == 'Hello, world (yes)!'

    def test_expand_tremas(self):
        from text_to_speech_tpu.text.cleaners import expand_tremas
        assert expand_tremas('maïs') == 'mahis'
        assert expand_tremas('aï') == 'aille'

    def test_convert_to_alnum(self):
        from text_to_speech_tpu.text.cleaners import convert_to_alnum
        assert convert_to_alnum('a&b #c!') == 'a b  c!'

    def test_registered_by_name(self):
        from text_to_speech_tpu.text.cleaners import get_cleaners_fn
        fns = get_cleaners_fn(['detach_punctuation', 'convert_to_alnum',
                               'expand_tremas', 'attach_punctuation',
                               'collapse_repetitions', 'remove_tokens'])
        assert len(fns) == 6


class TestJinjaChatTemplate:
    TEMPLATE = ('{% for m in messages %}<{{ m.role }}>{{ m.content }}</s>\n'
                '{% endfor %}{% if add_generation_prompt %}<assistant>{% endif %}')

    def test_render(self):
        from text_to_speech_tpu.text.tokenizer import render_chat_template
        out = render_chat_template(
            [{'role': 'user', 'content': 'hi'}], self.TEMPLATE)
        assert out == '<user>hi</s>\n<assistant>'

    def test_no_generation_prompt(self):
        from text_to_speech_tpu.text.tokenizer import render_chat_template
        out = render_chat_template(
            [{'role': 'system', 'content': 'a'}, {'role': 'user', 'content': 'b'}],
            self.TEMPLATE, add_generation_prompt = False)
        assert out == '<system>a</s>\n<user>b</s>\n'


class TestClipTokenizer:
    MERGES = [('h', 'e'), ('l', 'l'), ('he', 'll'), ('hell', 'o</w>'),
              ('w', 'o'), ('r', 'l'), ('wo', 'rl'), ('worl', 'd</w>'),
              ('o', '</w>')]

    def test_encode_decode_roundtrip(self):
        tok = Tokenizer.from_clip_pretrained(self.MERGES)
        ids = tok.encode('Hello  world')
        assert tok.decode(ids) == 'hello world'
        # sos/eos wrap the sequence
        assert ids[0] == tok.sos_token_idx and ids[-1] == tok.eos_token_idx

    def test_end_of_word_merges_distinct(self):
        tok = Tokenizer.from_clip_pretrained(self.MERGES)
        units = tok.split_text('hello world')
        assert 'hello</w>' in units and 'world</w>' in units

    def test_vocab_layout(self):
        tok = Tokenizer.from_clip_pretrained(self.MERGES)
        # 256 byte units + 256 '</w>' variants + merges + 2 specials
        assert tok.vocab_size == 512 + len(self.MERGES) + 2
        assert tok.vocab[-2:] == ['<|startoftext|>', '<|endoftext|>']

    def test_json_roundtrip(self, tmp_path):
        tok = Tokenizer.from_clip_pretrained(self.MERGES)
        path = tok.save(str(tmp_path / 'clip.json'))
        tok2 = Tokenizer.load_from_file(path)
        text = 'hello world'
        assert np.array_equal(tok.encode(text), tok2.encode(text))
        assert tok2.bpe_end_of_word == '</w>'

    def test_from_merges_file(self, tmp_path):
        path = str(tmp_path / 'bpe_merges.txt')
        with open(path, 'w') as f:
            f.write('#version: test\n')
            f.write('\n'.join(' '.join(p) for p in self.MERGES))
        tok = Tokenizer.from_clip_pretrained(filename = path)
        assert tok.decode(tok.encode('hello world')) == 'hello world'


class TestCTCBeam:
    def test_beam_matches_greedy_on_clean_logits(self):
        tok = Tokenizer(list('_abc'), level = 'char', blank_token = '_')
        # unambiguous logits spelling "ab" with blanks/repeats
        T, V = 6, 4
        logits = np.full((T, V), -5., np.float32)
        for t, c in enumerate([1, 1, 0, 2, 0, 0]):   # a a _ b _ _
            logits[t, c] = 5.
        assert tok.ctc_decode(logits) == 'ab'
        assert tok.ctc_decode(logits, method = 'beam', beam_width = 4) == 'ab'

    def test_beam_merges_paths(self):
        """Beam should prefer a label whose probability mass is split across
        two alignments over a single-alignment competitor."""
        tok = Tokenizer(list('_ab'), level = 'char', blank_token = '_')
        # t0: a=0.6 b=0.4 ; t1: blank=0.6 b=0.4 -> greedy gives 'a'
        # P('b') = P(b,b)+P(b,_)+(_,b) = .4*.4+.4*.6+... compare structures
        logits = np.log(np.array([
            [0.01, 0.54, 0.45],
            [0.50, 0.01, 0.49],
        ], np.float32))
        greedy = tok.ctc_decode(logits)
        beam = tok.ctc_decode(logits, method = 'beam', beam_width = 4)
        assert greedy == 'a'
        assert beam == 'b'   # mass of 'b' across alignments beats 'a'

    def test_beam_batch(self):
        tok = Tokenizer(list('_ab'), level = 'char', blank_token = '_')
        logits = np.full((2, 3, 3), -4., np.float32)
        logits[:, :, 1] = 3.
        out = tok.ctc_decode(logits, method = 'beam')
        assert out == ['a', 'a']


class TestSentencePiece:
    """Pure-Python SentencePiece (.model protobuf + unigram/BPE encoders) —
    the reference's utils/text/sentencepiece_tokenizer.py capability without
    the external package."""

    def _unigram(self):
        from text_to_speech_tpu.text.sentencepiece import (
            SentencePieceModel, NORMAL, UNKNOWN, CONTROL)
        pieces = [
            ('<unk>', 0., UNKNOWN), ('<s>', 0., CONTROL), ('</s>', 0., CONTROL),
            ('▁', -3.0, NORMAL), ('▁hello', -1.0, NORMAL), ('▁world', -1.2, NORMAL),
            ('▁hell', -2.8, NORMAL), ('o', -2.5, NORMAL), ('wor', -2.0, NORMAL),
            ('ld', -2.1, NORMAL), ('h', -4., NORMAL), ('e', -4., NORMAL),
            ('l', -4., NORMAL), ('w', -4., NORMAL), ('r', -4., NORMAL),
            ('d', -4., NORMAL),
        ]
        return SentencePieceModel(pieces)

    def test_viterbi_picks_best_segmentation(self):
        m = self._unigram()
        ids = m.encode('hello world')
        # ▁hello (-1.0) beats ▁hell+o (-2.8-2.5); ▁world beats ▁+wor+ld
        assert [m.id_to_piece(i) for i in ids] == ['▁hello', '▁world']
        assert m.decode(ids) == 'hello world'

    def test_unknown_char_maps_to_unk(self):
        m = self._unigram()
        ids = m.encode('hello Ω world')
        assert m.unk_id in ids
        assert '⁇' in m.decode(ids)

    def test_byte_fallback(self):
        from text_to_speech_tpu.text.sentencepiece import (
            SentencePieceModel, NORMAL, UNKNOWN, BYTE)
        pieces = [('<unk>', 0., UNKNOWN), ('▁a', -1., NORMAL)]
        pieces += [('<0x{:02X}>'.format(b), -10., BYTE) for b in range(256)]
        m = SentencePieceModel(pieces)
        ids = m.encode('a é')      # é has no piece -> utf-8 bytes
        assert all(0 <= i < len(m) for i in ids)
        assert m.decode(ids) == 'a é'

    def test_normalization_options(self):
        m = self._unigram()
        assert m.normalize('a  b') == '▁a▁b'      # collapse + dummy prefix
        m.remove_extra_whitespaces = False
        assert '▁▁' in m.normalize('a  b')
        m.add_dummy_prefix = False
        m.remove_extra_whitespaces = True
        assert m.normalize('a b') == 'a▁b'

    def test_bpe_mode(self):
        from text_to_speech_tpu.text.sentencepiece import (
            SentencePieceModel, NORMAL, UNKNOWN, BPE)
        # scores encode merge priority: higher merges first
        pieces = [('<unk>', 0., UNKNOWN),
                  ('▁', -1., NORMAL), ('a', -1., NORMAL), ('b', -1., NORMAL),
                  ('ab', -0.5, NORMAL), ('▁ab', -0.6, NORMAL)]
        m = SentencePieceModel(pieces, model_type = BPE)
        ids = m.encode('ab')
        assert [m.id_to_piece(i) for i in ids] == ['▁ab']
        assert m.decode(ids) == 'ab'

    def test_model_file_roundtrip(self, tmp_path):
        from text_to_speech_tpu.text.sentencepiece import SentencePieceModel
        m = self._unigram()
        path = m.save(str(tmp_path / 'test.model'))
        m2 = SentencePieceModel.load(path)
        assert m2.encode('hello world') == m.encode('hello world')
        assert m2.unk_id == m.unk_id and m2.pad_id == -1
        assert m2.model_type == m.model_type
        assert [p[0] for p in m2.pieces] == [p[0] for p in m.pieces]

    def test_tokenizer_adapter(self, tmp_path):
        from text_to_speech_tpu.text.sentencepiece import SentencePieceTokenizer
        tok = SentencePieceTokenizer(self._unigram(), offset = 3)
        ids = tok.encode('hello world')
        assert ids.dtype.name == 'int32'
        assert tok.decode(ids) == 'hello world'
        # persistence: JSON config + .model side file
        path = tok.save(str(tmp_path / 'sp.json'))
        tok2 = SentencePieceTokenizer.load_from_file(path)
        assert tok2.offset == 3
        assert tok2.decode(tok2.encode('hello world')) == 'hello world'

    def test_sos_eos(self):
        from text_to_speech_tpu.text.sentencepiece import SentencePieceTokenizer
        tok = SentencePieceTokenizer(self._unigram(), use_sos_and_eos = True)
        ids = list(tok.encode('hello'))
        assert ids[0] == tok.sos_token_idx and ids[-1] == tok.eos_token_idx


# smoke tier: host-side/cheap-compile tests that gate every commit
# (<3 min cold on one core; see pytest.ini)
pytestmark = [pytest.mark.smoke]
