"""GRU4Rec session-parallel walker schedule: exact reference semantics
(GRU4Rec.py:174-207) — consecutive-pair coverage, state resets at session
switches, session replacement order."""
import numpy as np

from skrx.models.GRU4Rec import build_walker_schedule


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


def test_walker_single_length_sessions():
    sessions = [[1], [2, 3], [4]]
    items, offsets = _sessions_to_flat(sessions)
    in_s, out_s, resets = build_walker_schedule(items, offsets,
                                                np.arange(3), 1)
    # only the length-2 session yields a step
    assert len(in_s) == 1
    assert (in_s[0, 0], out_s[0, 0]) == (2, 3)
