"""Generic host-side utilities (no JAX imports at module load)."""

from .file_utils import load_data, dump_data, load_json, dump_json, expand_path
from .generic_utils import (
    time_to_string, create_iterable, get_args, get_kwargs, filter_kwargs,
    to_json_serializable,
)
from .sequence_utils import pad_batch, pad_to_multiple, truncate
from .comparison_utils import is_equal, is_diff
from .stream import Stream, AsyncResult, PriorityQueue, STOP, KEEP_ALIVE, IS_RUNNING
from .request_manager import (
    StreamRequestManager, ParentRequestManager, ChildRequestManager,
    END_OF_STREAM,
)


def setup_environment(log_level = None, ** kwargs):
    """One-call environment setup (the reference's ``utils.setup_environment``,
    ``utils/__init__.py:28``): logging level + device configuration.  Extra
    kwargs go to :func:`devices.set_device_config` (platform, default device,
    precision, preallocation)."""
    if log_level:
        from ..loggers import set_level
        set_level(log_level)
    if kwargs:
        from ..devices import set_device_config
        set_device_config(** kwargs)
