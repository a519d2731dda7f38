from .history import History
from .precision import (
    Policy, get_policy, set_global_policy, get_global_policy, cast_floating,
)
from .checkpoint import CheckpointManager, flatten_tree, unflatten_tree, save_tree, load_tree
from .loader import (
    Task, get_dataset, add_dataset, is_custom_dataset, show_datasets,
    set_dataset_dir, get_dataset_dir, summarize_dataset, benchmark_dataset,
)
