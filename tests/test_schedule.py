"""Chunk-planning and schedule arithmetic (neuron_gan_tpu/schedule.py)."""

import pytest

from neuron_gan_tpu.schedule import TrainSchedule


SCHED = TrainSchedule(transit_sch=(100, 200), alpha_step=0.02, n_epochs=300,
                      checkpointing_period=50, lr0=1e-4)
# fade_len = 50


def test_phase_and_alpha():
    assert SCHED.fade_len == 50
    assert SCHED.phase_at(99) == 0
    assert SCHED.phase_at(100) == 1      # transition applies at its epoch
    assert SCHED.phase_at(200) == 2
    assert SCHED.alpha_at(99) == 1.0
    assert SCHED.alpha_at(100) == 0.0
    assert SCHED.alpha_at(125) == pytest.approx(0.5)
    assert SCHED.alpha_at(149) == pytest.approx(0.98)
    assert SCHED.alpha_at(150) == 1.0    # fade complete
    assert SCHED.fading_at(150) == (False, 0)


def test_chunks_cover_without_crossing_boundaries():
    chunks = list(SCHED.plan_chunks(1, 301))
    # full coverage, no gaps/overlaps
    assert chunks[0][0] == 1 and chunks[-1][1] == 300
    for (s1, e1), (s2, _) in zip(chunks, chunks[1:]):
        assert s2 == e1 + 1
    for s, e in chunks:
        # a chunk never spans a transition start
        for t in SCHED.transit_sch:
            assert not (s < t <= e), (s, e, t)
            # nor a fade-completion boundary
            assert not (s <= t + SCHED.fade_len - 1 < e
                        and s > t), (s, e, t)
        # static attributes constant within the chunk
        assert SCHED.phase_at(s) == SCHED.phase_at(e)
        assert SCHED.fading_at(s)[0] == SCHED.fading_at(e)[0]


def test_chunk_ends_at_checkpoints():
    for s, e in SCHED.plan_chunks(1, 301):
        # a checkpoint epoch is always a chunk end (never strictly inside)
        for c in range(50, 301, 50):
            assert not (s <= c < e), (s, e, c)


def test_adapt_period_aligns_chunks():
    # adapt_critic chunks stop at multiples of the adaptation window so N_D
    # is recomputed with at most a window of staleness
    chunks = list(SCHED.plan_chunks(1, 301, adapt_period=20))
    for s, e in chunks:
        for c in range(20, 301, 20):
            assert not (s <= c < e), (s, e, c)
    # still covers fully
    assert chunks[0][0] == 1 and chunks[-1][1] == 300


def test_resume_mid_fade():
    # resuming at epoch 130 (mid-fade): first chunk must end at fade end 149
    chunks = list(SCHED.plan_chunks(130, 301))
    assert chunks[0] == (130, 149)
    assert SCHED.fading_at(130) == (True, 100)


def test_traced_lr_matches_host_schedule():
    # property test: the in-graph lr (_traced_lr, fed per-chunk constants
    # derived from TrainSchedule) equals the host lr_at for every epoch of
    # every chunk, across random schedules
    import random

    import numpy as np

    from neuron_gan_tpu.train_step import _traced_lr

    class _Spec:  # only the fields _traced_lr reads
        def __init__(self, **kw):
            self.__dict__.update(kw)

    rng = random.Random(0)
    for _ in range(8):
        n_trans = rng.randint(1, 4)
        ts, t = [], 0
        for _ in range(n_trans):
            t += rng.randint(40, 120)
            ts.append(t)
        n_epochs = ts[-1] + rng.randint(40, 120)
        sched = TrainSchedule(transit_sch=tuple(ts), alpha_step=0.05,
                              n_epochs=n_epochs,
                              checkpointing_period=rng.choice([10, 25, 50]),
                              lr0=10 ** rng.uniform(-5, -3))
        for s, e in sched.plan_chunks(1, n_epochs + 1):
            lrp = sched.lr_phase_of_chunk(s)
            spec = _Spec(lr0=sched.lr0, lr_gamma=sched.gammas[lrp],
                         lr_boundary=sched.boundaries[lrp],
                         lr_cap=sched.phase_lens[lrp] // 2,
                         lr_prev_final=sched.lr_at(s))
            for epoch in range(s, e + 1):
                traced = float(_traced_lr(spec, np.int32(epoch)))
                assert traced == pytest.approx(sched.lr_at(epoch),
                                               rel=2e-5), (ts, s, e, epoch)


def test_lr_phase_of_chunk():
    assert SCHED.lr_phase_of_chunk(99) == 0
    assert SCHED.lr_phase_of_chunk(100) == 1   # chunk starting AT a transition
    assert SCHED.lr_phase_of_chunk(101) == 1


def test_float_transitions_coerced_to_int():
    from neuron_gan_tpu.schedule import TrainSchedule
    sch = TrainSchedule(transit_sch=(5.0, 10.0), alpha_step=0.25,
                        n_epochs=20, checkpointing_period=6, lr0=1e-4)
    assert sch.transit_sch == (5, 10)
    assert all(isinstance(t, int) for t in sch.transit_sch)
    # chunk boundaries stay ints (a float chunk length would break
    # jnp.arange epoch vectors inside the jitted runner)
    assert all(isinstance(v, int)
               for se in sch.plan_chunks(1, 21) for v in se)


def test_non_integer_transition_rejected():
    import pytest
    from neuron_gan_tpu.schedule import TrainSchedule
    with pytest.raises(ValueError, match='not an integer'):
        TrainSchedule(transit_sch=(5.5,), alpha_step=0.25, n_epochs=20,
                      checkpointing_period=6, lr0=1e-4)
