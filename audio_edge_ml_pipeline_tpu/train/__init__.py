"""Training layer: metrics, train/tune/select CLIs, hyperparameter search."""
