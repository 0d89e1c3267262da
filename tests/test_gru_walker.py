"""GRU4Rec session-parallel walker schedule: exact reference semantics
(GRU4Rec.py:174-207) — consecutive-pair coverage, state resets at session
switches, session replacement order — and the ON-DEVICE walker (round 5:
the schedule is derived inside the epoch scan from a carried cursor state,
so only the session permutation crosses the host boundary per epoch) must
emit the identical stream."""
import numpy as np
import pytest

from skrx.models.GRU4Rec import (build_walker_schedule,
                                 device_walker_schedule, walker_num_steps)


def _sessions_to_flat(sessions):
    items = np.concatenate(sessions).astype(np.int32)
    offsets = np.zeros(len(sessions) + 1, dtype=np.int64)
    for i, s in enumerate(sessions):
        offsets[i + 1] = offsets[i] + len(s)
    return items, offsets


def test_walker_covers_consecutive_pairs():
    sessions = [[1, 2, 3, 4], [5, 6], [7, 8, 9], [10, 11, 12, 13, 14]]
    items, offsets = _sessions_to_flat(sessions)
    perm = np.arange(len(sessions))
    in_s, out_s, resets = build_walker_schedule(items, offsets, perm,
                                                batch_size=2)
    # every emitted (in, out) must be a consecutive pair of some session
    pairs = set()
    for s in sessions:
        pairs.update(zip(s[:-1], s[1:]))
    for t in range(len(in_s)):
        for b in range(2):
            assert (in_s[t, b], out_s[t, b]) in pairs

    # column streams: each column walks sessions in replacement order with a
    # reset at the start of each new session
    assert resets[0].all()
    # when a reset occurs mid-schedule, the in-item must be a session head's
    # first item
    heads = {s[0] for s in sessions}
    for t in range(1, len(in_s)):
        for b in range(2):
            if resets[t, b]:
                assert in_s[t, b] in heads


def test_walker_respects_permutation():
    sessions = [[1, 2, 3], [4, 5, 6]]
    items, offsets = _sessions_to_flat(sessions)
    in_s, _, _ = build_walker_schedule(items, offsets, np.array([1, 0]), 1)
    # permuted: session 1 first
    assert in_s[0, 0] == 4


def _random_sessions(rng, n_sessions, max_len):
    return [list(rng.integers(0, 50, size=rng.integers(1, max_len + 1)))
            for _ in range(n_sessions)]


@pytest.mark.parametrize("n_sessions,max_len,b,seed", [
    (7, 5, 2, 0), (12, 6, 4, 1), (5, 1, 3, 2), (9, 4, 16, 3),
    (1, 6, 2, 4), (20, 8, 3, 5),
])
def test_device_walker_matches_host(n_sessions, max_len, b, seed):
    """The on-device walker's valid-filtered stream equals the host-built
    schedule exactly, and walker_num_steps sizes the scan exactly."""
    rng = np.random.default_rng(seed)
    sessions = _random_sessions(rng, n_sessions, max_len)
    items, offsets = _sessions_to_flat(sessions)
    perm = rng.permutation(n_sessions)
    in_h, out_h, reset_h = build_walker_schedule(items, offsets, perm, b)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    slots, emitted = walker_num_steps(lengths, perm, b)
    assert emitted == len(in_h)
    in_d, out_d, reset_d, valid_d = device_walker_schedule(
        items, offsets, perm, b, slots + 3)  # extra slots must stay invalid
    assert int(valid_d.sum()) == emitted
    assert not valid_d[slots:].any()
    keep = valid_d.astype(bool)
    np.testing.assert_array_equal(in_d[keep], in_h)
    np.testing.assert_array_equal(out_d[keep], out_h)
    np.testing.assert_array_equal(reset_d[keep] > 0, reset_h)


def test_walker_single_length_sessions():
    sessions = [[1], [2, 3], [4]]
    items, offsets = _sessions_to_flat(sessions)
    in_s, out_s, resets = build_walker_schedule(items, offsets,
                                                np.arange(3), 1)
    # only the length-2 session yields a step
    assert len(in_s) == 1
    assert (in_s[0, 0], out_s[0, 0]) == (2, 3)
