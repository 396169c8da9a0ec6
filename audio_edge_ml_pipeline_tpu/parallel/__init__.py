"""Device mesh, shardings, and collectives.

The reference has no distributed layer at all (SURVEY.md §2c); this package
is its TPU-native replacement: a data(+model) mesh over ICI, NamedSharding
helpers for batch/parameter placement, and sharded end-to-end train steps
(waveform -> mel -> model -> loss -> update) where XLA inserts the
collectives.
"""

from .mesh import (  # noqa: F401
    batch_sharding,
    get_mesh,
    make_sharded_train_step,
    param_shardings,
    replicated,
    shard_batch,
)
