"""BaseModel: the persistent, name-addressed model wrapper.

Capability parity with ``/root/reference/models/interfaces/base_model.py:76``:
singleton-by-name instances whose configuration reloads from disk
(reference ``:31-55``), directory layout management, ``build`` via the
architecture registry (``:255``), lazily-jitted ``compiled_infer`` with
shape bucketing (the `graph_compile` analog, ``:357-375`` +
``utils/keras/compile.py:45``), generic ``predict`` driving a threaded
`Stream` with callbacks and ``map.json`` caching (``:675-711``),
save/restore of config + architecture + weights + history (``:726-845``),
and ``from_pretrained`` partial-transfer construction (``:847-875``).

TPU-native design: model parameters are pytrees; `compiled_infer` is a
`jax.jit` whose shape buckets come from `pad_to_multiple` on the inputs,
so each bucket compiles once and replays from the executable cache.
"""

import os
import logging
import functools

import numpy as np

from .. import saving as saving_utils
from ..registry import get_architecture
from ...utils import Stream, load_json, dump_json, pad_to_multiple
from ...train.history import History
from ...train.checkpoint import CheckpointManager
from ...loggers import timer

logger = logging.getLogger(__name__)

_INSTANCES = {}


class BaseModel:
    """Subclasses implement: `build` hooks, `infer`, data-processing hooks
    (`prepare_input/prepare_output/prepare_data/filter_data`), and
    `get_inference_callbacks`."""

    _default_loss = None
    _default_metrics = []

    def __new__(cls, *, name = None, ** kwargs):
        if name is not None and name in _INSTANCES:
            return _INSTANCES[name]
        instance = super().__new__(cls)
        if name is not None:
            _INSTANCES[name] = instance
        return instance

    def __init__(self,
                 *,
                 name = None,
                 seed = 0,
                 max_to_keep = 3,
                 pretrained_name = None,
                 ** kwargs
                ):
        if getattr(self, '_initialized', False): return

        self.name = name or self.__class__.__name__.lower()
        self.seed = seed
        self.pretrained_name = pretrained_name
        self.backend_kwargs = kwargs

        # restore persisted constructor config when the model already exists
        if saving_utils.is_model_name(self.name):
            disk = saving_utils.get_model_config(self.name)
            for key, value in disk.get('config', {}).items():
                if key not in ('name',):
                    kwargs.setdefault(key, value)
            self._exists_on_disk = True
        else:
            self._exists_on_disk = False

        self.ckpt_manager = CheckpointManager(
            self.save_dir('saving', 'checkpoint'), max_to_keep = max_to_keep
        )
        self.history = History.load(saving_utils.get_model_history_file(self.name))

        self.arch = None
        self.params = None
        self.state = None
        self._compiled_cache = {}

        self.build(** {k: v for k, v in kwargs.items() if k not in self._non_build_keys()})

        if self._exists_on_disk and self.ckpt_manager.latest_epoch is not None:
            self._restore_weights()
        elif self.pretrained_name:
            self._transfer_from_pretrained(self.pretrained_name)

        self._initialized = True
        if not self._exists_on_disk:
            self.save()

    # -- directories -----------------------------------------------------------

    def _non_build_keys(self):
        return ('lang', 'tokenizer', 'mel_fn', 'audio_format', 'pad_mel_value',
                'max_input_length', 'max_output_length', 'audio_rate',
                'trim_audio', 'max_audio_time')

    @property
    def folder(self):
        return saving_utils.get_model_dir(self.name)

    def save_dir(self, *parts):
        path = saving_utils.get_model_dir(self.name, *parts)
        os.makedirs(path if not parts or '.' not in parts[-1] else os.path.dirname(path),
                    exist_ok = True)
        return path

    @property
    def pred_dir(self):
        return self.save_dir('predictions')

    @property
    def epochs(self):
        return self.history.epochs

    # -- build -----------------------------------------------------------------

    def build(self, *, model = None, ** kwargs):
        """Resolve the architecture config and initialize params.

        `model` may be: a dict config (with 'architecture'), an architecture
        instance, or None (subclass assembled kwargs)."""
        import jax

        arch_file = saving_utils.get_model_dir(self.name, 'saving', 'config_models.json')
        if self.arch is not None: return self.arch
        if self._exists_on_disk and os.path.exists(arch_file):
            # the persisted architecture always wins on reload: the stored
            # weights are only valid for it
            model = load_json(arch_file)

        if isinstance(model, dict):
            self.arch = get_architecture(model)
        elif model is not None:
            self.arch = model
        else:
            raise ValueError('No architecture config available for {}'.format(self.name))

        key = jax.random.PRNGKey(self.seed)
        init_out = self.arch.init(key)
        if isinstance(init_out, tuple):
            self.params, self.state = init_out
        else:
            self.params, self.state = init_out, {}
        return self.arch

    # -- weights ---------------------------------------------------------------

    def _restore_weights(self, epoch = None):
        trees = self.ckpt_manager.load(epoch = epoch, as_jax = True,
                                       trees = ('params', 'state'))
        if trees:
            self.params = trees.get('params', self.params)
            if 'state' in trees: self.state = trees['state']
            logger.info('%s: restored weights from epoch %s',
                        self.name, epoch if epoch is not None else self.ckpt_manager.latest_epoch)
        self._compiled_cache.clear()

    def _transfer_from_pretrained(self, pretrained_name):
        from ..weights_converter import name_based_partial_transfer_learning
        from .. import get_pretrained
        source = get_pretrained(pretrained_name)
        self.params = name_based_partial_transfer_learning(source.params, self.params)
        if source.state and self.state:
            try:
                self.params_state_transfer = True
                self.state = name_based_partial_transfer_learning(source.state, self.state)
            except Exception:
                logger.warning('state transfer failed; keeping fresh statistics')
        logger.info('%s: transferred weights from %s', self.name, pretrained_name)

    def set_weights(self, params, state = None):
        self.params = params
        if state is not None: self.state = state
        self._compiled_cache.clear()

    # -- compiled inference ----------------------------------------------------

    def get_compiled(self, key, builder, ** jit_kwargs):
        """Per-model cache of jitted callables (the `graph_compile` analog)."""
        import jax
        if key not in self._compiled_cache:
            self._compiled_cache[key] = jax.jit(builder(), ** jit_kwargs)
        return self._compiled_cache[key]

    # -- persistence -----------------------------------------------------------

    def get_config(self):
        return {}

    def get_saving_objects(self):
        """{filename (under saving/): obj with .save(path)} — mixins extend."""
        return {}

    def save(self, *, save_weights = True, epoch = None, metric = None,
             extra_trees = None):
        os.makedirs(self.save_dir('saving'), exist_ok = True)
        saving_utils.save_model_config(self.name, {
            'class_name': self.__class__.__name__,
            'config': {** self.get_config(), 'name': self.name},
        })
        dump_json(
            saving_utils.get_model_dir(self.name, 'saving', 'config_models.json'),
            {'architecture': type(self.arch).__name__.lower(), ** self.arch.get_config()},
            indent = 2,
        )
        for filename, obj in self.get_saving_objects().items():
            obj.save(saving_utils.get_model_dir(self.name, 'saving', filename))
        self.history.save(saving_utils.get_model_history_file(self.name))
        if save_weights and self.params is not None:
            trees = {'params': self.params}
            if self.state: trees['state'] = self.state
            if extra_trees: trees.update(extra_trees)
            self.ckpt_manager.save(
                trees, epoch if epoch is not None else self.epochs, metric = metric
            )
        self._exists_on_disk = True
        return self.folder

    @classmethod
    def from_pretrained(cls, name, pretrained_name, ** kwargs):
        """Create a new model transferring weights from `pretrained_name`
        (name-based partial transfer — widened layers are zero-padded)."""
        return cls(name = name, pretrained_name = pretrained_name, ** kwargs)

    # -- inference pipeline ----------------------------------------------------

    def infer(self, inputs, ** kwargs):
        raise NotImplementedError()

    def get_inference_callbacks(self, ** kwargs):
        return {}, []

    @timer(name = 'predict')
    def predict(self,
                inputs,
                *,
                callbacks = None,
                workers = 1,
                overwrite = False,
                return_output = True,
                ** kwargs
               ):
        """Run `self.infer` over a stream of inputs with caching callbacks."""
        if not isinstance(inputs, (list, tuple, np.ndarray)) and not hasattr(inputs, 'get'):
            inputs = [inputs]

        if callbacks is None:
            predicted, callbacks = self.get_inference_callbacks(** kwargs)
        else:
            predicted = {}

        infer_fn = functools.partial(
            self.infer,
            callbacks = callbacks,
            predicted = predicted,
            overwrite = overwrite,
            return_output = return_output,
            ** kwargs,
        )
        results = list(Stream(infer_fn, inputs, workers = workers if workers == 0 else 1))
        for cb in callbacks:
            if hasattr(cb, 'join'): cb.join()
        return results

    def stream(self, stream, ** kwargs):
        """predict() over a live queue/iterator — results yielded as ready."""
        return self.predict(stream, ** kwargs)

    # -- training (wired in the train package) ---------------------------------

    def fit(self, dataset, ** kwargs):
        from ...train.trainer import fit as _fit
        return _fit(self, dataset, ** kwargs)

    def __repr__(self):
        return '{}(name={!r}, epochs={})'.format(
            self.__class__.__name__, self.name, self.epochs
        )

    def __str__(self):
        lines = [
            '========== {} =========='.format(self.name),
            'class : {}'.format(self.__class__.__name__),
            'epochs trained : {}'.format(self.epochs),
            'directory : {}'.format(self.folder),
        ]
        return '\n'.join(lines) + '\n'


def reset_instances():
    """Clear the singleton cache (tests)."""
    _INSTANCES.clear()
