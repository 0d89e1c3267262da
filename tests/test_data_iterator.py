import numpy as np
import pytest

from skrx.io import (InteractionIterator, PointwiseIterator, PairwiseIterator,
                     SequentialPointwiseIterator, SequentialPairwiseIterator,
                     UserVecIterator, ItemVecIterator, BatchIterator)


def _first(it):
    return next(iter(it))


def test_batch_iterator_shapes():
    a = np.arange(10)
    b = np.arange(10) * 2
    it = BatchIterator(a, b, batch_size=4, shuffle=False)
    batches = list(it)
    assert len(batches) == 3
    assert len(batches[-1][0]) == 2
    it2 = BatchIterator(a, b, batch_size=4, shuffle=True, drop_last=True,
                        rng=np.random.default_rng(0))
    batches2 = list(it2)
    assert len(batches2) == 2
    # shuffled but aligned
    for ba, bb in batches2:
        np.testing.assert_array_equal(bb, ba * 2)
    with pytest.raises(ValueError):
        BatchIterator(a, np.arange(5))


def test_interaction_iterator(synth_dataset):
    it = InteractionIterator(synth_dataset.train_data, batch_size=32)
    users, items = _first(it)
    assert users.shape == (32,) and items.shape == (32,)
    assert len(it) == (len(synth_dataset.train_data) + 31) // 32


@pytest.mark.parametrize("num_neg", [1, 3])
def test_pointwise_iterator(synth_dataset, num_neg):
    it = PointwiseIterator(synth_dataset.train_data, num_neg=num_neg,
                           batch_size=64)
    users, items, labels = _first(it)
    assert users.shape == items.shape == labels.shape == (64,)
    assert set(np.unique(labels)).issubset({0.0, 1.0})


@pytest.mark.parametrize("num_neg", [1, 2])
def test_pairwise_iterator(synth_dataset, num_neg):
    train = synth_dataset.train_data
    it = PairwiseIterator(train, num_neg=num_neg, batch_size=64, shuffle=False)
    users, pos, neg = _first(it)
    assert users.shape == (64,) and pos.shape == (64,)
    if num_neg == 1:
        assert neg.shape == (64,)
    else:
        assert neg.shape == (64, num_neg)
    # negatives exclude the user's positives
    ud = train.to_user_dict()
    for u, n in zip(users, np.atleast_2d(neg.T).T.reshape(len(users), -1)):
        assert not np.isin(n, ud[int(u)]).any()


@pytest.mark.parametrize("num_prev,num_next", [(1, 1), (3, 1), (3, 2)])
@pytest.mark.parametrize("pad", [None, 0])
def test_sequential_pairwise_iterator(synth_dataset, num_prev, num_next, pad):
    train = synth_dataset.train_data
    it = SequentialPairwiseIterator(train, num_previous=num_prev,
                                    num_next=num_next, pad=pad, batch_size=32,
                                    shuffle=False)
    users, seqs, pos, neg = _first(it)
    assert users.shape == (32,)
    if num_prev > 1:
        assert seqs.shape == (32, num_prev)
    else:
        assert seqs.shape == (32,)
    if num_next > 1:
        assert pos.shape == (32, num_next)
        assert neg.shape == (32, num_next)


def test_sequential_pointwise_iterator(synth_dataset):
    it = SequentialPointwiseIterator(synth_dataset.train_data, num_previous=3,
                                     num_next=1, num_neg=2, pad=0,
                                     batch_size=32, shuffle=False)
    users, seqs, nxt, labels = _first(it)
    assert users.shape == (32,)
    assert seqs.shape == (32, 3)
    assert nxt.shape == (32,)
    assert labels.shape == (32,)


def test_vec_iterators(synth_dataset):
    train = synth_dataset.train_data
    uit = UserVecIterator(train, batch_size=16, shuffle=False)
    vec = _first(uit)
    assert vec.shape == (16, train.num_items)
    iit = ItemVecIterator(train, batch_size=16, shuffle=False)
    ivec = _first(iit)
    assert ivec.shape == (16, train.num_users)
