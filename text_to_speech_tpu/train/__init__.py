from .history import History
from .checkpoint import CheckpointManager, flatten_tree, unflatten_tree, save_tree, load_tree
