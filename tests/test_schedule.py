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


def test_single_epoch_mode():
    chunks = list(SCHED.plan_chunks(1, 6, single_epoch=True))
    assert chunks == [(1, 1), (2, 2), (3, 3), (4, 4), (5, 5)]


def test_resume_mid_fade():
    # resuming at epoch 130 (mid-fade): first chunk must end at fade end 149
    chunks = list(SCHED.plan_chunks(130, 301))
    assert chunks[0] == (130, 149)
    assert SCHED.fading_at(130) == (True, 100)


def test_lr_matches_train_step_schedule():
    from neuron_gan_tpu.train_step import make_lr_schedule
    ref = make_lr_schedule(1e-4, [100, 200], 300)
    for e in [1, 2, 50, 51, 99, 100, 101, 102, 150, 151, 200, 201, 250, 300]:
        assert SCHED.lr_at(e) == pytest.approx(ref(e)), e


def test_lr_phase_of_chunk():
    assert SCHED.lr_phase_of_chunk(99) == 0
    assert SCHED.lr_phase_of_chunk(100) == 1   # chunk starting AT a transition
    assert SCHED.lr_phase_of_chunk(101) == 1
