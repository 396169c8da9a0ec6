"""Device-batched deep-trial tuning (train/tune_batched.py).

TPE trials trained concurrently as one vmapped program — the deep half of
the tuning-stage parallelization (SURVEY §2c; reference tune.py trains
Keras trials strictly sequentially)."""

from __future__ import annotations

import numpy as np
import pytest

from audio_edge_ml_pipeline_tpu.train import search
from audio_edge_ml_pipeline_tpu.train import tune_batched as tb


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    N, T, F, K = 160, 32, 20, 4
    X = rng.standard_normal((N, T, F)).astype(np.float32)
    y = rng.integers(0, K, N).astype(np.int32)
    for c in range(K):
        X[y == c, :, c * 4:(c + 1) * 4] += 1.5
    return X, y, X[:40], y[:40], K


def test_shape_key_separates_trace_affecting_knobs():
    a = {"filters": [8, 16], "batch_size": 32, "learning_rate": 1e-3, "dropout": 0.1}
    b = {"filters": [8, 16], "batch_size": 32, "learning_rate": 9e-3, "dropout": 0.4}
    c = {"filters": [16, 16], "batch_size": 32, "learning_rate": 1e-3, "dropout": 0.1}
    assert tb.shape_key(a) == tb.shape_key(b)  # lr/dropout are vmapped
    assert tb.shape_key(a) != tb.shape_key(c)  # filters change the trace


def test_train_trial_group_distinct_hypers(data):
    X, y, Xv, yv, K = data
    draws = [
        {"filters": [8, 16], "first_stride": 2, "batch_size": 32,
         "learning_rate": lr, "dropout": dr}
        for lr, dr in [(3e-3, 0.1), (1e-5, 0.5)]  # one sane, one crippled
    ]
    res = tb.train_trial_group("cnn", draws, X, y, Xv, yv, K, sweep_epochs=6, seed=1)
    assert len(res) == 2
    assert len(res[0]["history"]) == 6
    # the sane trial must clearly beat the lr=1e-5 one — proves the
    # vmapped lr/dropout vectors actually apply per trial
    assert res[0]["val_accuracy"] > res[1]["val_accuracy"] + 0.1


def test_sampled_epochs_does_not_collide(data):
    """A search space may sample `epochs` (reference DSL allows any ctor
    knob); the sweep budget is sweep_epochs, so the sampled value must be
    deferred, not passed twice to the trainer ctor (was: TypeError 'multiple
    values for epochs' failed the whole trial group), and must not split
    otherwise-identical draws into separate shape groups."""
    X, y, Xv, yv, K = data
    draws = [{"filters": [8], "batch_size": 32, "learning_rate": 1e-3,
              "dropout": 0.1, "epochs": e} for e in (10, 20)]
    assert tb.shape_key(draws[0]) == tb.shape_key(draws[1])
    res = tb.train_trial_group("cnn", draws, X, y, Xv, yv, K, sweep_epochs=2, seed=1)
    assert len(res) == 2 and all(len(r["history"]) == 2 for r in res)


def test_rnn_and_transformer_groups_batch(data):
    """Round-3 extension: every deep family whose module takes a traced
    dropout_rate batches — including the sequence models. The sane-lr trial
    must beat the crippled-lr one within each vmapped group, proving the
    per-trial lr vector applies through nn.RNN scans and attention blocks."""
    X, y, Xv, yv, K = data
    draws = [{"units": 16, "n_layers": 1, "batch_size": 32,
              "learning_rate": lr, "dropout": 0.1} for lr in (5e-3, 1e-6)]
    res = tb.train_trial_group("rnn", draws, X, y, Xv, yv, K, sweep_epochs=8, seed=1)
    assert len(res) == 2 and len(res[0]["history"]) == 8
    # distinct lr vectors MUST produce distinct epoch curves (identical
    # histories would mean the per-trial vector is not applied); accuracy
    # ordering is asserted without a strict margin to stay seed-robust
    assert res[0]["history"] != res[1]["history"]
    assert res[0]["val_accuracy"] >= res[1]["val_accuracy"]
    assert "rnn" in tb.BATCHABLE_MODELS and "transformer" in tb.BATCHABLE_MODELS

    draws = [{"num_heads": 2, "ff_dim": 32, "n_blocks": 1, "batch_size": 32,
              "learning_rate": lr, "dropout": 0.1} for lr in (5e-3, 1e-6)]
    res = tb.train_trial_group("transformer", draws, X, y, Xv, yv, K, sweep_epochs=8, seed=1)
    assert len(res) == 2
    assert res[0]["history"] != res[1]["history"]
    assert res[0]["val_accuracy"] >= res[1]["val_accuracy"]


def test_runner_cache_reused_across_calls(data):
    X, y, Xv, yv, K = data
    draws = [{"filters": [8], "batch_size": 32, "learning_rate": 1e-3, "dropout": 0.1}]
    tb.train_trial_group("cnn", draws, X, y, Xv, yv, K, sweep_epochs=1, seed=1)
    n0 = len(tb._RUNNER_CACHE)
    draws2 = [{"filters": [8], "batch_size": 32, "learning_rate": 5e-3, "dropout": 0.3},
              {"filters": [8], "batch_size": 32, "learning_rate": 2e-3, "dropout": 0.2}]
    tb.train_trial_group("cnn", draws2, X, y, Xv, yv, K, sweep_epochs=1, seed=2)
    assert len(tb._RUNNER_CACHE) == n0  # same arch -> same cached runner


def test_run_study_batched_ask_tell(data):
    X, y, Xv, yv, K = data
    space = {
        "filters": [[8], [8, 16]],
        "learning_rate": {"type": "loguniform", "low": 1e-4, "high": 1e-2},
        "dropout": {"type": "float", "low": 0.05, "high": 0.4},
    }
    from audio_edge_ml_pipeline_tpu.train.tune import sample_search_space

    study = search.create_study(sampler=search.TPESampler(seed=0),
                                pruner=search.NopPruner())
    results = tb.run_study_batched(
        study, space, {"batch_size": 32}, sample_search_space, "cnn",
        X, y, Xv, yv, K, n_trials=6, sweep_epochs=2, batch_k=3, seed=0,
    )
    states = [t.state for t in study.trials]
    assert states.count(search.TrialState.COMPLETE) == 6
    assert study.best_trial.value is not None
    assert set(results) == {t.number for t in study.trials}
    # per-epoch reports were recorded for the pruner
    assert all(len(t.intermediate) == 2 for t in study.trials)


def test_pruned_trials_marked(data):
    X, y, Xv, yv, K = data

    class PruneAllAfterFirst:
        def should_prune(self, study, record):
            return record.number > 0 and len(record.intermediate) >= 1

    from audio_edge_ml_pipeline_tpu.train.tune import sample_search_space

    study = search.create_study(sampler=search.RandomSampler(seed=0),
                                pruner=PruneAllAfterFirst())
    tb.run_study_batched(
        study, {"learning_rate": {"type": "loguniform", "low": 1e-4, "high": 1e-2}},
        {"filters": [8], "batch_size": 32}, sample_search_space, "cnn",
        X, y, Xv, yv, K, n_trials=3, sweep_epochs=2, batch_k=3, seed=0,
    )
    states = [t.state for t in study.trials]
    assert states[0] == search.TrialState.COMPLETE
    assert states[1] == states[2] == search.TrialState.PRUNED


def test_trial_axis_shards_over_mesh(data):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the 8-virtual-device CPU test config")
    X, y, Xv, yv, K = data
    draws = [{"filters": [8], "batch_size": 32, "learning_rate": 10 ** -(2 + 0.2 * i),
              "dropout": 0.1} for i in range(4)]
    r_plain = tb.train_trial_group("cnn", draws, X, y, Xv, yv, K, sweep_epochs=2,
                                   seed=3, devices=1)
    r_shard = tb.train_trial_group("cnn", draws, X, y, Xv, yv, K, sweep_epochs=2,
                                   seed=3, devices=4)
    for a, b in zip(r_plain, r_shard):
        assert abs(a["val_accuracy"] - b["val_accuracy"]) < 0.06
