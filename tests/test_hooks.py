"""Trainer hook tests: VarVisHook summary levels, SecondOrStepTimer.

reference: luminoth/utils/hooks/var_vis_hook.py + utils/vars.py summary
levels (full logs histogram/stddev/max/min/sparsity, reduced logs mean).
"""

import numpy as np

from luminoth_tpu.utils.hooks import VarVisHook
from luminoth_tpu.utils.hooks.timer import SecondOrStepTimer


class FakeWriter:
    def __init__(self):
        self.scalars = {}
        self.histograms = []

    def add_scalar(self, name, value, step):
        self.scalars[name] = value

    def add_histogram(self, name, value, step):
        self.histograms.append(name)

    def flush(self):
        pass


PARAMS = {"layer": {"kernel": np.asarray([[0.0, 1.0], [2.0, 3.0]])}}


class TestVarVisHook:
    def test_reduced_mode_logs_means_only(self):
        writer = FakeWriter()
        hook = VarVisHook(writer, mode="reduced", every_steps=1)
        hook.after_step(1, PARAMS)
        assert writer.scalars["variables/layer/kernel/mean"] == 1.5
        assert not writer.histograms
        assert "variables/layer/kernel/stddev" not in writer.scalars

    def test_full_mode_logs_reference_statistics(self):
        writer = FakeWriter()
        hook = VarVisHook(writer, mode="full", every_steps=1)
        hook.after_step(1, PARAMS)
        assert writer.histograms == ["variables/layer/kernel"]
        s = writer.scalars
        assert s["variables/layer/kernel/mean"] == 1.5
        assert s["variables/layer/kernel/max"] == 3.0
        assert s["variables/layer/kernel/min"] == 0.0
        assert s["variables/layer/kernel/sparsity"] == 0.25
        np.testing.assert_allclose(
            s["variables/layer/kernel/stddev"], np.std([0, 1, 2, 3])
        )


class TestSecondOrStepTimer:
    def test_step_cadence(self):
        t = SecondOrStepTimer(every_secs=None, every_steps=5)
        assert t.should_trigger(5)
        t.update(5)
        assert not t.should_trigger(7)
        assert t.should_trigger(10)
