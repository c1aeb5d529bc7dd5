"""Tests for the blur-σ schedulers and example-count hooks.

Behavioural parity targets: /root/reference/callbacks.py:12-135.
"""

import numpy as np
import pytest

from blurred_gan_tpu.sched.blur import (
    AdaptiveBlurController,
    BlurDecayController,
    ExponentialDecaySchedule,
)
from blurred_gan_tpu.train.hooks import EveryNExamples, HookList


class TestExponentialDecay:
    def test_matches_tf_formula(self):
        # value(step) = initial * rate^(step/decay_steps), continuous.
        s = ExponentialDecaySchedule(23.5, decay_steps=6000.0, decay_rate=0.96)
        for step in [0, 1, 100, 6000, 60000]:
            assert s(step) == pytest.approx(23.5 * 0.96 ** (step / 6000.0), rel=1e-9)

    def test_staircase(self):
        s = ExponentialDecaySchedule(1.0, decay_steps=10, decay_rate=0.5,
                                     staircase=True)
        assert s(9) == 1.0
        assert s(10) == 0.5
        assert s(19) == 0.5

    def test_decay_controller_floor(self):
        c = BlurDecayController(total_n_training_examples=60_000, max_value=23.5,
                                min_value=0.01)
        assert c.sigma(0) == pytest.approx(23.5)
        # monotone decreasing
        sig = [c.sigma(n) for n in range(0, 100_000, 5000)]
        assert all(a >= b for a, b in zip(sig, sig[1:]))
        # floored far out
        assert c.sigma(10_000_000) == 0.01


class TestAdaptiveController:
    def mk(self, **kw):
        kw.setdefault("warmup_n_batches", 5)
        kw.setdefault("delay_between_modifications", 3)
        kw.setdefault("max_value", 10.0)
        return AdaptiveBlurController(**kw)

    def test_ema_update(self):
        c = self.mk()
        st = c.init()
        st, _ = c.update(st, 0, fake_scores=1.0, real_scores=0.0)  # ratio = 1.0
        assert st.score_ratio == pytest.approx(0.99 * 0.5 + 0.01 * 1.0)

    def test_no_decay_during_warmup(self):
        c = self.mk(warmup_n_batches=100)
        st = c.init()
        for b in range(50):
            st, _ = c.update(st, b, 1.0, 1.0)  # perfectly stable ratio 0.5
        assert st.std == 10.0

    def test_decays_when_stable_with_rate_limit(self):
        c = self.mk(warmup_n_batches=0, delay_between_modifications=3)
        st = c.init()
        stds = []
        for b in range(1, 10):
            st, _ = c.update(st, b, 1.0, 1.0)
            stds.append(st.std)
        # modifications at b=3, 6, 9 only (b=1,2 rate-limited vs last_mod=0)
        assert stds == pytest.approx(
            [10.0, 10.0, 9.9, 9.9, 9.9, 9.9 * 0.99, 9.9 * 0.99, 9.9 * 0.99,
             9.9 * 0.99 * 0.99])

    def test_no_decay_when_unstable(self):
        c = self.mk(warmup_n_batches=0)
        st = c.init()
        # Drive the EMA far from 0.5 first, then confirm no decay happens.
        for b in range(2000):
            st, _ = c.update(st, b, 1.0, 0.0)  # ratio 1.0
        assert st.score_ratio > 0.9
        before = st.std
        st, tele = c.update(st, 2000, 1.0, 0.0)
        assert st.std == before
        assert tele["blur_controller/stable"] == 0.0

    def test_stop_training_at_min(self):
        c = self.mk(warmup_n_batches=0, delay_between_modifications=0,
                    min_value=9.95)
        st = c.init()
        st, _ = c.update(st, 1, 1.0, 1.0)  # one decay: 10 -> 9.9 < 9.95
        assert st.stop_training

    def test_log_only_mode_matches_reference_quirk(self):
        # callbacks.py:103 — the reference never applied the decayed σ.
        c = self.mk(warmup_n_batches=0, apply_changes=False)
        st = c.init()
        for b in range(1, 50):
            st, _ = c.update(st, b, 1.0, 1.0)
        assert st.std == 10.0

    def test_state_roundtrip(self):
        c = self.mk()
        st = c.init()
        st, _ = c.update(st, 0, 1.0, 1.0)
        d = c.state_to_dict(st)
        assert c.state_from_dict(d) == st

    def test_zero_scores_no_nan(self):
        c = self.mk(warmup_n_batches=0)
        st = c.init()
        st, tele = c.update(st, 1, 0.0, 0.0)
        assert np.isfinite(st.score_ratio)


class TestEveryNExamples:
    def test_fires_every_n(self):
        fired = []
        h = EveryNExamples(100, lambda s, logs: fired.append(s))
        for _ in range(20):
            h.after_step(32, {})
        # reference semantics: fires on the first batch (i=0 >= 0), then every 100.
        assert fired == [32, 128, 224, 320, 416, 512, 608]

    def test_starting_from_offset(self):
        fired = []
        h = EveryNExamples(100, lambda s, logs: fired.append(s), starting_from=200)
        for _ in range(10):
            h.after_step(50, {})
        assert fired[0] == 200

    def test_negative_starting_from_prearms(self):
        # The metric feeders use starting_from=-num_samples (callbacks.py:143).
        fired = []
        h = EveryNExamples(1000, lambda s, logs: fired.append(s),
                           starting_from=-100)
        h.after_step(32, {})
        assert fired == [32]

    def test_restore_resumes_phase(self):
        fired = []
        h = EveryNExamples(100, lambda s, logs: fired.append(s))
        h.restore(350)  # as if 350 examples were already seen pre-resume
        h.after_step(32, {})  # 382 -> i=3, num_invocations=4 -> no fire
        h.after_step(32, {})  # 414 -> i=4 -> fire
        assert fired == [414]

    def test_hook_list(self):
        a, b = [], []
        hooks = HookList([
            EveryNExamples(50, lambda s, logs: a.append(s)),
            EveryNExamples(100, lambda s, logs: b.append(s)),
        ])
        for _ in range(4):
            hooks.after_step(25, {})
        assert a == [25, 50, 100]
        assert b == [25, 100]
