"""Tacotron-2 architecture as pure JAX functions over pytree params.

Capability parity with ``/root/reference/architectures/tacotron2_arch.py``
(encoder :235-333, prenet :143-212, decoder cell :336-489, teacher-forced
decode :492-607, AR inference :609-749 incl. the sliding attention window
:629-640, postnet :214-232, top model :752-925) — re-designed TPU-first:

  - teacher-forced decoding is one ``lax.scan`` whose per-step math is pure
    matmuls; mel/gate projections are hoisted *out* of the scan into one big
    (B, T, D) matmul on the MXU;
  - autoregressive inference is one ``lax.while_loop`` over preallocated
    ``(B, max_len, …)`` buffers updated with ``dynamic_update_slice`` —
    static shapes, early exit on the stop gate;
  - prenet dropout (intentionally active at inference,
    reference ``:143-212``) threads a PRNG key through the loop carry;
  - batch-norm running statistics live in a separate ``state`` tree so every
    apply function stays pure.

Parameter tree paths (e.g. ``decoder/attention/query/kernel``) are the
namespace used by the name-based weights converter.
"""

import collections

import jax
import jax.numpy as jnp
from jax import lax

from ..hparams import HParams
from ..nn import layers as nn

Tacotron2InferenceOutput = collections.namedtuple(
    'Tacotron2InferenceOutput',
    ['mel', 'lengths', 'stop_tokens', 'attention_weights', 'decoder_output'],
)

HParamsTacotron2 = HParams(
    vocab_size = 148,
    pad_token = 0,
    n_mel_channels = 80,

    # encoder
    encoder_embedding_dim = 512,
    encoder_n_conv = 3,
    encoder_kernel_size = 5,
    encoder_drop_rate = 0.5,
    encoder_epsilon = 1e-5,
    encoder_momentum = 0.1,

    # speaker conditioning (SV2TTS)
    speaker_embedding_dim = None,
    speaker_concat_pos = 'end',        # subset of {'start','end','prenet'}

    # prenet
    prenet_sizes = (256, 256),
    prenet_use_bias = False,
    prenet_drop_rate = 0.5,
    prenet_deterministic = False,

    # location-sensitive attention
    lsa_attention_dim = 128,
    lsa_attention_filters = 32,
    lsa_attention_kernel_size = 31,

    # decoder
    attention_rnn_dim = 1024,
    decoder_n_lstm = 1,
    decoder_rnn_dim = 1024,
    # mixed-precision scan mode: when the teacher-forced inputs arrive in
    # bfloat16 (train/precision.py boundary cast), keep the ENTIRE scan
    # carry — including the alignment maps and the attention softmax — in
    # bf16 instead of carving per-step f32 islands.  (The r4 "islands
    # regress the scan 311 → 2307 ms" reading was a tunnel-stall artifact;
    # per-iteration medians on v5e: f32 130 ms, bf16-native 85 ms,
    # bf16-islands 82 ms — benchmarks/tacotron_stall_probe.py.)  bf16
    # shares f32's exponent range, so the -1e9 mask and the softmax
    # max-subtraction stay representable, and the quality gate
    # (benchmarks/mixed_precision_parity.py) arbitrates the cum-attention
    # absorption risk.  False restores the f32 islands.
    scan_native_bf16 = True,
    n_frames_per_step = 1,
    with_logits = True,                # sigmoid on the gate output
    pred_stop_on_mel = False,
    max_decoder_steps = 1024,
    gate_threshold = 0.5,

    # postnet
    postnet_n_conv = 5,
    postnet_filters = 512,
    postnet_kernel_size = 5,
    postnet_drop_rate = 0.5,
    postnet_epsilon = 1e-5,
    postnet_momentum = 0.1,
)


def _eye_projection_init(shape):
    """Identity on the first `out` rows, zeros below — the 'start'-concat
    projection initializer (keeps pre-trained text embeddings intact when a
    speaker embedding is concatenated)."""
    out = jnp.eye(shape[1])
    return jnp.pad(out, ((0, shape[0] - shape[1]), (0, 0)))


class Tacotron2:
    """Stateless architecture object: holds only static hyper-parameters;
    all apply methods are pure functions of (params, state, inputs)."""

    def __init__(self, ** kwargs):
        self.hp = HParamsTacotron2.extract(kwargs)
        hp = self.hp
        self.spk_dim = hp.speaker_embedding_dim
        self.concat_pos = tuple()
        if self.spk_dim:
            pos = hp.speaker_concat_pos
            self.concat_pos = (pos,) if isinstance(pos, str) else tuple(pos)
        self.encoder_output_dim = hp.encoder_embedding_dim + (
            self.spk_dim if 'end' in self.concat_pos else 0
        )
        self.prenet_in_dim = hp.n_mel_channels + (
            self.spk_dim if 'prenet' in self.concat_pos else 0
        )

    # -- init ------------------------------------------------------------------

    def init(self, key):
        hp = self.hp
        keys = nn.split_keys(key, 64)
        params, state = {}, {}

        # encoder
        enc, enc_state = {}, {}
        enc['embedding'] = nn.init_embedding(next(keys), hp.vocab_size, hp.encoder_embedding_dim)
        conv_in = hp.encoder_embedding_dim
        if 'start' in self.concat_pos:
            enc['speaker_projection'] = {
                'kernel': _eye_projection_init(
                    (hp.encoder_embedding_dim + self.spk_dim, hp.encoder_embedding_dim)
                ),
                'bias': jnp.zeros((hp.encoder_embedding_dim,)),
            }
        for i in range(hp.encoder_n_conv):
            conv = nn.init_conv1d(next(keys), hp.encoder_kernel_size, conv_in, hp.encoder_embedding_dim)
            bn, bn_state = nn.init_batch_norm(hp.encoder_embedding_dim)
            enc['conv_{}'.format(i)] = {'conv': conv, 'bn': bn}
            enc_state['conv_{}'.format(i)] = {'bn': bn_state}
            conv_in = hp.encoder_embedding_dim
        enc['bilstm'] = nn.init_bilstm(next(keys), hp.encoder_embedding_dim, hp.encoder_embedding_dim // 2)
        params['encoder'], state['encoder'] = enc, enc_state

        # decoder
        dec = {}
        prenet = {}
        pre_in = self.prenet_in_dim
        for i, size in enumerate(hp.prenet_sizes):
            prenet['layer_{}'.format(i)] = nn.init_dense(
                next(keys), pre_in, size, use_bias = hp.prenet_use_bias
            )
            pre_in = size
        dec['prenet'] = prenet

        dec['attention_rnn'] = nn.init_lstm_cell(
            next(keys), hp.prenet_sizes[-1] + self.encoder_output_dim, hp.attention_rnn_dim
        )
        dec['attention'] = {
            'query': nn.init_dense(next(keys), hp.attention_rnn_dim, hp.lsa_attention_dim, use_bias = False),
            'memory': nn.init_dense(next(keys), self.encoder_output_dim, hp.lsa_attention_dim, use_bias = False),
            'location_conv': nn.init_conv1d(
                next(keys), hp.lsa_attention_kernel_size, 2, hp.lsa_attention_filters, use_bias = False
            ),
            'location_dense': nn.init_dense(
                next(keys), hp.lsa_attention_filters, hp.lsa_attention_dim, use_bias = False
            ),
            'value': nn.init_dense(next(keys), hp.lsa_attention_dim, 1, use_bias = False),
        }
        rnns = {}
        rnn_in = hp.attention_rnn_dim + self.encoder_output_dim
        for i in range(hp.decoder_n_lstm):
            rnns['cell_{}'.format(i)] = nn.init_lstm_cell(next(keys), rnn_in, hp.decoder_rnn_dim)
            rnn_in = hp.decoder_rnn_dim
        dec['decoder_rnn'] = rnns

        proj_in = hp.decoder_rnn_dim + self.encoder_output_dim
        dec['linear_projection'] = nn.init_dense(
            next(keys), proj_in, hp.n_mel_channels * hp.n_frames_per_step
        )
        gate_in = proj_in + (hp.n_mel_channels * hp.n_frames_per_step if hp.pred_stop_on_mel else 0)
        dec['gate_layer'] = nn.init_dense(next(keys), gate_in, hp.n_frames_per_step)
        params['decoder'] = dec

        # postnet: 80→512 (tanh) → 512→512 (tanh) ×(n-2) → 512→80 (linear), BN each
        post, post_state = {}, {}
        ch_in = hp.n_mel_channels
        for i in range(hp.postnet_n_conv):
            last = i == hp.postnet_n_conv - 1
            ch_out = hp.n_mel_channels if last else hp.postnet_filters
            conv = nn.init_conv1d(next(keys), hp.postnet_kernel_size, ch_in, ch_out)
            bn, bn_state = nn.init_batch_norm(ch_out)
            post['conv_{}'.format(i)] = {'conv': conv, 'bn': bn}
            post_state['conv_{}'.format(i)] = {'bn': bn_state}
            ch_in = ch_out
        params['postnet'], state['postnet'] = post, post_state

        return params, state

    # -- encoder ---------------------------------------------------------------

    def encode(self, params, state, tokens, *, speaker_embedding = None,
               train = False, rng = None):
        """tokens (B, S) → (encoder_output (B, S, D), mask (B, S), new_state)."""
        hp = self.hp
        enc, enc_state = params['encoder'], state['encoder']
        mask = tokens != hp.pad_token

        x = nn.embedding(enc['embedding'], tokens)

        if 'start' in self.concat_pos:
            spk = jnp.broadcast_to(
                speaker_embedding[:, None, :], x.shape[:2] + (self.spk_dim,)
            )
            x = nn.dense(enc['speaker_projection'], jnp.concatenate([x, spk], axis = -1))

        new_state = {}
        for i in range(hp.encoder_n_conv):
            name = 'conv_{}'.format(i)
            x = nn.conv1d(enc[name]['conv'], x, padding = 'SAME')
            x, bn_state = nn.batch_norm(
                enc[name]['bn'], enc_state[name]['bn'], x,
                train = train, momentum = hp.encoder_momentum,
                epsilon = hp.encoder_epsilon, mask = mask if train else None,
            )
            x = jax.nn.relu(x)
            if train and rng is not None:
                rng, sub = jax.random.split(rng)
                x = nn.dropout(sub, x, hp.encoder_drop_rate, train = True)
            new_state[name] = {'bn': bn_state}
            x = jnp.where(mask[..., None], x, 0.)

        x = nn.bilstm(enc['bilstm'], x, mask = mask)

        if 'end' in self.concat_pos:
            spk = jnp.broadcast_to(
                speaker_embedding[:, None, :], x.shape[:2] + (self.spk_dim,)
            )
            x = jnp.concatenate([x, spk], axis = -1)
            x = jnp.where(mask[..., None], x, 0.)

        return x, mask, {** state, 'encoder': new_state}

    # -- prenet ----------------------------------------------------------------

    def prenet(self, params, x, *, rng, speaker_embedding = None, deterministic = None):
        """Always-on-dropout bottleneck (intentional inference randomness,
        reference ``tacotron2_arch.py:143-212``)."""
        hp = self.hp
        if deterministic is None: deterministic = hp.prenet_deterministic
        if 'prenet' in self.concat_pos and speaker_embedding is not None:
            spk = jnp.broadcast_to(
                speaker_embedding[..., None, :] if x.ndim == 3 else speaker_embedding,
                x.shape[:-1] + (self.spk_dim,),
            )
            x = jnp.concatenate([x, spk], axis = -1)
        for i in range(len(hp.prenet_sizes)):
            x = jax.nn.relu(nn.dense(params['prenet']['layer_{}'.format(i)], x))
            if not deterministic:
                rng, sub = jax.random.split(rng)
                x = nn.dropout(sub, x, hp.prenet_drop_rate, train = True)
        return x

    # -- attention -------------------------------------------------------------

    def process_memory(self, params, memory, mask):
        memory = jnp.where(mask[..., None], memory, 0.)
        processed = nn.dense(params['attention']['memory'], memory)
        return memory, processed

    def attention_step(self, params, query, memory, processed_memory,
                       prev_attn, cum_attn, mask):
        """Location-sensitive attention (reference
        ``layers/location_sensitive_attention.py:44``): content score +
        convolutional features over [previous, cumulative] alignments."""
        att = params['attention']
        compute_dtype = memory.dtype
        native = compute_dtype == jnp.bfloat16 and self.hp.scan_native_bf16
        processed_query = nn.dense(att['query'], query)[:, None, :]
        attn_cat = jnp.stack([prev_attn, cum_attn], axis = -1).astype(compute_dtype)
        loc = nn.dense(att['location_dense'],
                       nn.conv1d(att['location_conv'], attn_cat, padding = 'SAME'))
        energies = nn.dense(
            att['value'], jnp.tanh(processed_query + processed_memory + loc)
        )[..., 0]                                                        # (B, S)
        # large-negative (not -inf) so a fully-masked row softmaxes to uniform
        # instead of NaN (all-pad rows appear in ragged batches)
        if native:
            # scan-native bf16: no per-step converts (see hp.scan_native_bf16)
            energies = jnp.where(mask, energies, jnp.asarray(-1e9, compute_dtype))
            weights = jax.nn.softmax(energies, axis = -1)
        else:
            # alignment maps stay f32 (cumulative sums degrade in bf16);
            # cast at the matmul boundary only
            energies = jnp.where(mask, energies.astype(jnp.float32), -1e9)
            weights = jax.nn.softmax(energies, axis = -1)                # f32
        context = jnp.einsum('bs,bsd->bd', weights.astype(compute_dtype), memory)
        return context, weights

    # -- decoder cell ----------------------------------------------------------

    def decoder_cell(self, params, prenet_out, memory, processed_memory,
                     attn_mask, cell_state):
        """One decoder step.  cell_state = (attn_rnn, dec_rnns, context,
        (prev_attn, cum_attn))."""
        hp = self.hp
        attn_rnn_state, dec_rnn_states, context, (prev_attn, cum_attn) = cell_state

        x = jnp.concatenate([prenet_out, context], axis = -1)
        attn_out, attn_rnn_state = nn.lstm_cell(params['attention_rnn'], x, attn_rnn_state)

        context, attn_weights = self.attention_step(
            params, attn_out, memory, processed_memory, prev_attn, cum_attn, attn_mask
        )
        cum_attn = cum_attn + attn_weights

        y = jnp.concatenate([attn_out, context], axis = -1)
        new_rnn_states = []
        for i in range(hp.decoder_n_lstm):
            y, s = nn.lstm_cell(params['decoder_rnn']['cell_{}'.format(i)], y, dec_rnn_states[i])
            new_rnn_states.append(s)

        cell_out = jnp.concatenate([y, context], axis = -1)
        new_state = (attn_rnn_state, tuple(new_rnn_states), context, (attn_weights, cum_attn))
        return cell_out, attn_weights, new_state

    def init_cell_state(self, batch, seq_len, dtype = jnp.float32):
        hp = self.hp
        # alignment maps follow the carry dtype only in the scan-native
        # bf16 mode; otherwise they are f32 islands (see attention_step)
        attn_dtype = dtype if (dtype == jnp.bfloat16
                               and hp.scan_native_bf16) else jnp.float32
        return (
            nn.lstm_init_carry(batch, hp.attention_rnn_dim, dtype),
            tuple(nn.lstm_init_carry(batch, hp.decoder_rnn_dim, dtype)
                  for _ in range(hp.decoder_n_lstm)),
            jnp.zeros((batch, self.encoder_output_dim), dtype),
            (jnp.zeros((batch, seq_len), attn_dtype),
             jnp.zeros((batch, seq_len), attn_dtype)),
        )

    def _project(self, params, cell_out):
        hp = self.hp
        frame = nn.dense(params['linear_projection'], cell_out)
        gate_in = jnp.concatenate([cell_out, frame], axis = -1) if hp.pred_stop_on_mel else cell_out
        gate = nn.dense(params['gate_layer'], gate_in)
        if hp.with_logits: gate = jax.nn.sigmoid(gate)
        return frame, gate

    # -- teacher-forced forward (training) --------------------------------------

    def __call__(self, params, state, tokens, mel_input, *,
                 mel_lengths = None, speaker_embedding = None,
                 train = False, rng = None):
        """Forward pass with teacher forcing.

        tokens (B, S) int32; mel_input (B, T, n_mel) — the *previous* frames.
        Returns ((decoder_output, mel_postnet, gates), new_state).
        """
        hp = self.hp
        if rng is None: rng = jax.random.PRNGKey(0)
        rng_enc, rng_pre, rng_post = jax.random.split(rng, 3)

        encoder_output, enc_mask, state = self.encode(
            params, state, tokens, speaker_embedding = speaker_embedding,
            train = train, rng = rng_enc,
        )
        memory, processed_memory = self.process_memory(params['decoder'], encoder_output, enc_mask)

        if mel_lengths is not None:
            dec_mask = jnp.arange(mel_input.shape[1])[None, :] < mel_lengths[:, None]
        else:
            dec_mask = jnp.any(mel_input != 0., axis = -1)

        # prenet over the whole target sequence at once (one big MXU matmul)
        prenet_out = self.prenet(
            params['decoder'], mel_input, rng = rng_pre,
            speaker_embedding = speaker_embedding,
            deterministic = hp.prenet_deterministic and not train,
        )

        cell_state = self.init_cell_state(tokens.shape[0], tokens.shape[1], mel_input.dtype)

        def step(carry, x_t):
            cell_out, _, new_carry = self.decoder_cell(
                params['decoder'], x_t, memory, processed_memory, enc_mask, carry
            )
            return new_carry, cell_out

        _, cell_outputs = lax.scan(step, cell_state, jnp.swapaxes(prenet_out, 0, 1))
        cell_outputs = jnp.swapaxes(cell_outputs, 0, 1)          # (B, T, D)

        # projections hoisted out of the scan: full-sequence matmuls
        frames, gates = self._project(params['decoder'], cell_outputs)
        frames = jnp.where(dec_mask[..., None], frames, 0.)

        r = hp.n_frames_per_step
        if r == 1:
            gates = gates[..., 0]
            out_mask = dec_mask
        else:
            # reduction factor: each scan step emitted r frames; unfold to
            # frame rate before the postnet (reference `:588-594`)
            gates = gates.reshape(gates.shape[0], -1)
            frames = frames.reshape(frames.shape[0], -1, hp.n_mel_channels)
            out_mask = jnp.repeat(dec_mask, r, axis = 1)
        decoder_output = frames

        postnet_out, state = self.postnet(params, state, decoder_output,
                                          train = train, rng = rng_post, mask = out_mask)
        mel_postnet = decoder_output + postnet_out
        return (decoder_output, mel_postnet, gates), state

    # -- postnet ---------------------------------------------------------------

    def postnet(self, params, state, x, *, train = False, rng = None, mask = None):
        hp = self.hp
        post, post_state = params['postnet'], state['postnet']
        new_state = {}
        for i in range(hp.postnet_n_conv):
            name = 'conv_{}'.format(i)
            x = nn.conv1d(post[name]['conv'], x, padding = 'SAME')
            x, bn_state = nn.batch_norm(
                post[name]['bn'], post_state[name]['bn'], x,
                train = train, momentum = hp.postnet_momentum,
                epsilon = hp.postnet_epsilon, mask = mask if train else None,
            )
            if i < hp.postnet_n_conv - 1:
                x = jnp.tanh(x)
            if train and rng is not None:
                rng, sub = jax.random.split(rng)
                x = nn.dropout(sub, x, hp.postnet_drop_rate, train = True)
            if mask is not None:
                # mask BETWEEN layers too: padded frames stay exactly zero,
                # so layer i+1's SAME padding sees the same zeros it would
                # at the true length — pad-then-slice is bit-exact for any
                # padded batch (bias/BN offsets otherwise leak nonzero
                # values into the pad region and corrupt the tail
                # receptive field)
                x = jnp.where(mask[..., None], x, 0.)
            new_state[name] = {'bn': bn_state}
        return x, {** state, 'postnet': new_state}

    # -- chunked decoding (continuous-batching serving) --------------------------

    def decode_chunk(self, params, frame, cell_state, memory,
                     processed_memory, enc_mask, *, n_steps,
                     rng = None, deterministic = None,
                     speaker_embedding = None, step_offset = 0):
        """Decode ``n_steps`` AR steps from an explicit carry.

        Host-controlled chunked decoding: the serving engine calls this once
        per chunk and may admit new requests into free batch rows between
        calls (the in-flight batching the reference's TRT-LLM runner
        provides, ``custom_model_runner_cpp.py:26-40``).  ``step_offset``
        selects the prenet-dropout key indices for this chunk; callers must
        pass a fresh (monotonically advanced) offset per chunk so no row
        re-consumes keys it drew in an earlier chunk.

        Returns (frames (B, K, n_mel), gates (B, K), (frame, cell_state)).
        """
        hp = self.hp
        if deterministic is None: deterministic = hp.prenet_deterministic
        if rng is None: rng = jax.random.PRNGKey(0)

        def step(carry, t):
            frame, cell_state = carry
            pre = self.prenet(
                params['decoder'], frame[:, -hp.n_mel_channels:],
                rng = jax.random.fold_in(rng, t),
                speaker_embedding = speaker_embedding,
                deterministic = deterministic,
            )
            cell_out, _, cell_state = self.decoder_cell(
                params['decoder'], pre, memory, processed_memory, enc_mask,
                cell_state,
            )
            frame, gate = self._project(params['decoder'], cell_out)
            # gate of the group's last subframe (== the only one at r=1)
            return (frame, cell_state), (frame, gate[..., -1])

        (frame, cell_state), (frames, gates) = lax.scan(
            step, (frame, cell_state),
            step_offset + jnp.arange(n_steps))
        return (jnp.swapaxes(frames, 0, 1), jnp.swapaxes(gates, 0, 1),
                (frame, cell_state))

    # -- autoregressive inference -----------------------------------------------

    def infer(self, params, state, tokens, *,
              speaker_embedding = None,
              rng = None,
              max_length = None,
              early_stopping = True,
              attn_mask_win_len = None,
              attn_mask_offset = 0.5,
              deterministic = None,
              dtype = None):
        """Generate mel frames autoregressively.

        One ``lax.while_loop``; all buffers preallocated at ``max_length``
        (static).  With ``attn_mask_win_len`` set, attention is restricted to
        a window centered on the previous argmax alignment (the long-input
        stabilizer, reference ``tacotron2_arch.py:629-640``).
        ``dtype=jnp.bfloat16`` runs the matmul path at MXU-native precision
        (alignments and the stop gate stay f32); outputs are cast back to f32.
        Returns ``Tacotron2InferenceOutput``.
        """
        hp = self.hp
        r = hp.n_frames_per_step
        if rng is None: rng = jax.random.PRNGKey(0)
        # `max_length` is in mel FRAMES; the loop runs over decode STEPS
        # (groups of r frames — the reduction factor divides the number of
        # sequential steps, the decoder's latency axis)
        if max_length is None:
            max_length = hp.max_decoder_steps * r
        max_length = -(-int(max_length) // r)

        compute_dtype = dtype or jnp.float32
        if dtype is not None:
            cast = lambda leaf: leaf.astype(dtype) if jnp.issubdtype(leaf.dtype, jnp.floating) else leaf
            params = jax.tree_util.tree_map(cast, params)
            state = jax.tree_util.tree_map(cast, state)
            if speaker_embedding is not None:
                speaker_embedding = speaker_embedding.astype(dtype)

        batch, seq_len = tokens.shape
        encoder_output, enc_mask, _ = self.encode(
            params, state, tokens, speaker_embedding = speaker_embedding, train = False,
        )
        memory, processed_memory = self.process_memory(params['decoder'], encoder_output, enc_mask)
        encoder_lengths = jnp.sum(enc_mask.astype(jnp.int32), axis = 1)

        use_window = attn_mask_win_len is not None
        if use_window:
            win_len = int(attn_mask_win_len)
            offset = int(attn_mask_win_len * attn_mask_offset) \
                if isinstance(attn_mask_offset, float) else int(attn_mask_offset)
            positions = jnp.arange(seq_len, dtype = jnp.int32)[None, :]

        n_mel = hp.n_mel_channels * hp.n_frames_per_step

        init = dict(
            t = jnp.zeros((), jnp.int32),
            frame = jnp.zeros((batch, n_mel), compute_dtype),
            outputs = jnp.zeros((batch, max_length, n_mel), compute_dtype),
            stop_tokens = jnp.zeros((batch, max_length, hp.n_frames_per_step)),
            attention_weights = jnp.zeros((batch, max_length, seq_len)),
            lengths = jnp.zeros((batch,), jnp.int32),
            finished = jnp.zeros((batch,), bool),
            main_attention = jnp.zeros((batch,), jnp.int32),
            cell_state = self.init_cell_state(batch, seq_len, compute_dtype),
            rng = rng,
        )

        def cond(s):
            not_done = s['t'] < max_length
            if early_stopping:
                return jnp.logical_and(not_done, jnp.logical_not(jnp.all(s['finished'])))
            return not_done

        def body(s):
            if use_window:
                center = jnp.maximum(s['main_attention'], offset)
                center = jnp.minimum(center, encoder_lengths - win_len + offset)
                lo = (center - offset)[:, None]
                attn_mask = jnp.logical_and(positions >= lo, positions <= lo + win_len)
                attn_mask = jnp.logical_and(attn_mask, enc_mask)
            else:
                attn_mask = enc_mask

            step_rng = jax.random.fold_in(s['rng'], s['t'])
            # feedback = the LAST (most recent) frame of the previous group
            # (identical to the whole frame at r=1)
            prenet_out = self.prenet(
                params['decoder'], s['frame'][:, -hp.n_mel_channels:],
                rng = step_rng, speaker_embedding = speaker_embedding,
                deterministic = deterministic,
            )
            cell_out, attn_weights, cell_state = self.decoder_cell(
                params['decoder'], prenet_out, memory, processed_memory,
                attn_mask, s['cell_state'],
            )
            frame, gate = self._project(params['decoder'], cell_out)

            finished = jnp.logical_or(s['finished'], gate[:, -1] > hp.gate_threshold)
            lengths = s['lengths'] + (~finished).astype(jnp.int32)

            t = s['t']
            return dict(
                t = t + 1,
                frame = frame,
                outputs = lax.dynamic_update_slice(s['outputs'], frame[:, None, :], (0, t, 0)),
                stop_tokens = lax.dynamic_update_slice(
                    s['stop_tokens'], gate[:, None, :].astype(jnp.float32), (0, t, 0)),
                attention_weights = lax.dynamic_update_slice(
                    s['attention_weights'], attn_weights[:, None, :], (0, t, 0)),
                lengths = lengths,
                finished = finished,
                main_attention = jnp.argmax(attn_weights, axis = 1).astype(jnp.int32),
                cell_state = cell_state,
                rng = s['rng'],
            )

        final = lax.while_loop(cond, body, init)

        outputs = final['outputs']
        stop_tokens = final['stop_tokens']
        if hp.n_frames_per_step > 1:
            outputs = outputs.reshape(batch, -1, hp.n_mel_channels)
            stop_tokens = stop_tokens.reshape(batch, -1)
        else:
            stop_tokens = stop_tokens[..., 0]

        postnet_out, _ = self.postnet(params, state, outputs, train = False)
        mel = (outputs + postnet_out).astype(jnp.float32)
        outputs = outputs.astype(jnp.float32)

        return Tacotron2InferenceOutput(
            mel = mel,
            # step count -> mel frames (identity at r=1); attention_weights
            # stay per-STEP (one alignment per group)
            lengths = final['lengths'] * r,
            stop_tokens = stop_tokens,
            attention_weights = final['attention_weights'],
            decoder_output = outputs,
        )

    # -- fused-kernel autoregressive inference -----------------------------------

    def supports_fused_decoder(self, batch, seq_len):
        """The fused decoder-step Pallas kernel covers the reference
        configuration (1 decoder LSTM, 1 frame/step, 2 prenet layers,
        gate from cell_out) for padded batches of at most 8 rows."""
        hp = self.hp
        return (batch <= 8 and seq_len % 8 == 0
                and hp.decoder_n_lstm == 1
                and hp.n_frames_per_step == 1
                and not hp.pred_stop_on_mel
                and hp.with_logits
                and len(hp.prenet_sizes) == 2
                # the kernel slices both LSTMs' gates with one U and folds
                # the location conv at its fixed tap count
                and hp.attention_rnn_dim == hp.decoder_rnn_dim
                and hp.lsa_attention_kernel_size == 31)

    def infer_fused(self, params, state, tokens, *,
                    speaker_embedding = None,
                    rng = None,
                    max_length = None,
                    early_stopping = True,
                    attn_mask_win_len = None,
                    attn_mask_offset = 0.5,
                    deterministic = None,
                    dtype = None,
                    chunk = 64,
                    int8_lstm = False,
                    interpret = False):
        """`infer` on the fused decoder-step Pallas kernel
        (`ops.decoder_kernel`): all decoder weights stay VMEM-resident for
        `chunk` steps per launch; a `lax.while_loop` chains launches with
        early stopping on the gate.  Same contract as `infer` (dropout draws
        from a different PRNG stream; use ``deterministic`` to compare).

        ``int8_lstm=True`` additionally quantizes the two LSTM matmul
        weights (the step's ~36 MB weight-streaming bound) to int8 with
        per-output-channel scales + per-row activation quant — see
        `ops.decoder_kernel.quantize_lstm_weights`."""
        from ..ops.decoder_kernel import (
            pack_decoder_weights, quantize_lstm_weights, decoder_steps,
            init_decoder_state)

        hp = self.hp
        if rng is None: rng = jax.random.PRNGKey(0)
        if deterministic is None: deterministic = hp.prenet_deterministic
        if max_length is None: max_length = hp.max_decoder_steps
        max_length = int(max_length)
        n_chunks = -(-max_length // chunk)
        total = n_chunks * chunk

        batch, seq_len = tokens.shape
        assert self.supports_fused_decoder(batch, seq_len), \
            'fused decoder unsupported for this config/shape'

        compute_dtype = dtype or jnp.float32
        if dtype is not None:
            cast = lambda leaf: leaf.astype(dtype) \
                if jnp.issubdtype(leaf.dtype, jnp.floating) else leaf
            params = jax.tree_util.tree_map(cast, params)
            state = jax.tree_util.tree_map(cast, state)
            if speaker_embedding is not None:
                speaker_embedding = speaker_embedding.astype(dtype)

        encoder_output, enc_mask, _ = self.encode(
            params, state, tokens, speaker_embedding = speaker_embedding,
            train = False,
        )
        memory, pm = self.process_memory(params['decoder'], encoder_output, enc_mask)
        D = memory.shape[-1]
        U = hp.attention_rnn_dim
        A = hp.lsa_attention_dim

        pad8 = lambda x: jnp.concatenate(
            [x, jnp.zeros((8 - batch,) + x.shape[1:], x.dtype)], axis = 0) \
            if batch < 8 else x
        mem_t = jnp.transpose(pad8(memory), (1, 0, 2)).astype(compute_dtype)
        pm_t = jnp.transpose(pad8(pm), (1, 0, 2)) \
            .reshape(seq_len, 8 * A).astype(compute_dtype)
        mask8 = pad8(enc_mask)
        mask_t = jnp.transpose(mask8).astype(jnp.float32)
        enc_len = jnp.sum(mask8.astype(jnp.int32), axis = 1)[None, :]

        weights = pack_decoder_weights(
            params['decoder'], n_mel = hp.n_mel_channels, dtype = compute_dtype)
        if int8_lstm:
            weights = quantize_lstm_weights(weights)
        # fold the speaker-concat prenet input into a per-row pre-activation
        # addend: layer0([mel | spk]) = layer0_mel(mel) + in0[n_mel:] · spk
        P0 = weights['w1'].shape[0]
        if 'prenet' in self.concat_pos and speaker_embedding is not None:
            in0 = params['decoder']['prenet']['layer_0']['kernel']
            extra = pad8(speaker_embedding.astype(jnp.float32)
                         @ in0[hp.n_mel_channels:].astype(jnp.float32))
        else:
            extra = jnp.zeros((8, P0), jnp.float32)

        use_window = attn_mask_win_len is not None
        win_len = int(attn_mask_win_len) if use_window else 0
        offset = 0
        if use_window:
            offset = int(attn_mask_win_len * attn_mask_offset) \
                if isinstance(attn_mask_offset, float) else int(attn_mask_offset)

        seed0 = jax.random.randint(
            rng, (1,), 0, 2 ** 31 - 2 ** 24, dtype = jnp.int32)

        init = dict(
            c = jnp.zeros((), jnp.int32),
            st = init_decoder_state(seq_len, D, U, compute_dtype),
            steps = jnp.zeros((total, 8, 128), jnp.float32),
            attn = jnp.zeros((total, seq_len, 8), jnp.float32),
            finished = jnp.arange(8) >= batch,       # pad rows never gate
            lengths = jnp.zeros((8,), jnp.int32),
        )

        def cond(s):
            not_done = s['c'] < n_chunks
            if early_stopping:
                return jnp.logical_and(not_done, ~jnp.all(s['finished']))
            return not_done

        def body(s):
            steps, attn, st = decoder_steps(
                weights, mem_t, pm_t, mask_t, enc_len, extra, s['st'],
                seed0 + s['c'] * chunk,
                n_steps = chunk, deterministic = bool(deterministic),
                use_window = use_window, win_len = win_len,
                win_offset = offset, gate_lane = hp.n_mel_channels,
                interpret = interpret,
                drop_rate = float(hp.prenet_drop_rate),
            )
            t0 = s['c'] * chunk
            gates = steps[:, :, hp.n_mel_channels] > hp.gate_threshold
            fin_k = jnp.logical_or(
                s['finished'][None, :], jnp.cumsum(gates, axis = 0) > 0)
            return dict(
                c = s['c'] + 1,
                st = st,
                steps = lax.dynamic_update_slice(s['steps'], steps, (t0, 0, 0)),
                attn = lax.dynamic_update_slice(s['attn'], attn, (t0, 0, 0)),
                finished = fin_k[-1],
                lengths = s['lengths']
                + jnp.sum(~fin_k, axis = 0).astype(jnp.int32),
            )

        final = lax.while_loop(cond, body, init)

        steps = jnp.transpose(final['steps'], (1, 0, 2))[:batch, :max_length]
        outputs = steps[..., :hp.n_mel_channels].astype(jnp.float32)
        stop_tokens = steps[..., hp.n_mel_channels]
        attention_weights = jnp.transpose(
            final['attn'], (2, 0, 1))[:batch, :max_length]

        postnet_out, _ = self.postnet(params, state, outputs.astype(compute_dtype),
                                      train = False)
        mel = (outputs + postnet_out.astype(jnp.float32))

        return Tacotron2InferenceOutput(
            mel = mel,
            # a never-gating row counts all ceil(max_length/chunk)*chunk steps;
            # cap at max_length to match infer() and the sliced buffers
            lengths = jnp.minimum(final['lengths'][:batch], max_length),
            stop_tokens = stop_tokens,
            attention_weights = attention_weights,
            decoder_output = outputs,
        )

    def get_config(self):
        return self.hp.get_config()
