"""Corrupt-checkpoint fallback: resume/predict survive a bad newest file.

Our own saves are atomic (tmp + os.replace), but checkpoints copied in
from remote storage can arrive truncated. The trainer's
``restore_latest``, the predictor's ``load_checkpoint_variables`` and
the eval watch loop must fall back / skip rather than crash (reference
analogue: eval.py:205-215 tolerates partially-written checkpoints).
"""

import os

import numpy as np
import pytest

from luminoth_tpu.utils.checkpoint_io import CheckpointManager


def _state(value):
    return {
        "params": {"w": np.full((2, 2), value, np.float32)},
        "step": np.int64(int(value)),
    }


@pytest.fixture
def ckpt_dir(tmp_path):
    d = str(tmp_path / "ckpt")
    manager = CheckpointManager(d, max_to_keep=3)
    manager.save(_state(1.0), step=10)
    manager.save(_state(2.0), step=20)
    # A corrupt newest checkpoint: truncated garbage bytes.
    with open(manager._path(30), "wb") as f:
        f.write(b"\x93\x01not-a-msgpack-state")
    return d


class TestRestoreLatest:
    def test_falls_back_to_older(self, ckpt_dir):
        manager = CheckpointManager(ckpt_dir)
        restored = manager.restore_latest(_state(0.0))
        assert restored is not None
        np.testing.assert_array_equal(
            restored["params"]["w"], np.full((2, 2), 2.0)
        )

    def test_all_corrupt_raises(self, tmp_path):
        d = str(tmp_path / "ckpt")
        manager = CheckpointManager(d)
        with open(manager._path(5), "wb") as f:
            f.write(b"junk")
        with pytest.raises(Exception):
            manager.restore_latest(_state(0.0))

    def test_empty_dir_returns_none(self, tmp_path):
        manager = CheckpointManager(str(tmp_path / "ckpt"))
        assert manager.restore_latest(_state(0.0)) is None

    def test_latest_state_dict_falls_back(self, ckpt_dir):
        state, step = CheckpointManager(ckpt_dir).latest_state_dict()
        assert step == 20
        np.testing.assert_array_equal(
            state["params"]["w"], np.full((2, 2), 2.0)
        )

    def test_latest_state_dict_empty(self, tmp_path):
        manager = CheckpointManager(str(tmp_path / "ckpt"))
        assert manager.latest_state_dict() == (None, None)


def test_predictor_load_falls_back(ckpt_dir, tmp_path):
    from luminoth_tpu.utils.config import Config
    from luminoth_tpu.utils.predicting import load_checkpoint_variables

    # Zoo-bundle layout: job_dir IS the checkpoint dir.
    config = Config({"train": {"job_dir": ckpt_dir, "run_name": None}})
    variables = load_checkpoint_variables(config)
    np.testing.assert_array_equal(
        variables["params"]["w"], np.full((2, 2), 2.0)
    )


def test_eval_watch_skips_corrupt_older(tmp_path, monkeypatch):
    """A corrupt non-newest checkpoint is skipped (last_step advances),
    and the readable ones around it still get evaluated."""
    from luminoth_tpu import eval as eval_module

    run_dir = str(tmp_path / "run")
    manager = CheckpointManager(os.path.join(run_dir, "ckpt"), max_to_keep=5)
    manager.save(_state(1.0), step=10)
    with open(manager._path(20), "wb") as f:
        f.write(b"corrupt")
    manager.save(_state(3.0), step=30)

    evaluated = []

    def fake_evaluate_once(config, model, variables, **kwargs):
        evaluated.append(
            (kwargs.get("global_step"), float(variables["params"]["w"][0, 0]))
        )
        return {}

    monkeypatch.setattr(eval_module, "evaluate_once", fake_evaluate_once)

    eval_module.watch_checkpoints(
        config=None, model=None, run_dir=run_dir, watch=False,
    )
    assert evaluated == [(10, 1.0), (30, 3.0)]


def test_save_async_roundtrip(tmp_path):
    """Async saves land loadable checkpoints, rotate, and serialize
    (one in flight at a time; a new save joins the previous)."""
    import numpy as np

    from luminoth_tpu.utils.checkpoint_io import CheckpointManager

    manager = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    template = {"step": 0, "w": np.zeros(4, np.float32)}
    for step in (1, 2, 3):
        state = {"step": step, "w": np.full(4, step, np.float32)}
        manager.save_async(state, step)
    manager.wait_for_async()
    assert manager.all_steps() == [2, 3]
    restored = manager.restore(template, 3)
    assert restored["step"] == 3
    np.testing.assert_array_equal(
        restored["w"], np.full(4, 3, np.float32)
    )
