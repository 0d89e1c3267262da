"""Epoch iterators over training instances, with per-epoch negative resampling.

Capability parity with reference skrec/io/data_iterator.py:4-451 (all eight
iterator classes, same batch tuple shapes and per-epoch resampling-in-
``__iter__`` semantics). These are the *host-side* iterators kept for API
parity and for models whose batching is inherently host-driven; the TPU hot
path instead uses the fully on-device epoch pipeline
(:mod:`skrx.models.pipeline`), which samples negatives with
:func:`skrx.ops.sampling.sample_negatives` inside jit and never touches the
host per batch.
"""
from collections import OrderedDict
from typing import Dict, Optional

import numpy as np

from ..utils.generic import OrderedDefaultDict, pad_sequences
from ..utils.random import randint_choice
from .batch_iterator import BatchIterator
from .dataset import ImplicitFeedback, KnowledgeGraph

__all__ = ["InteractionIterator", "PointwiseIterator", "PairwiseIterator",
           "SequentialPointwiseIterator", "SequentialPairwiseIterator",
           "UserVecIterator", "ItemVecIterator", "KGPairwiseIterator"]


class _Iterator:
    def __iter__(self):
        raise NotImplementedError

    def __len__(self):
        raise NotImplementedError

    def _num_batches(self, n_sample: int) -> int:
        if self.drop_last:
            return n_sample // self.batch_size
        return (n_sample + self.batch_size - 1) // self.batch_size


def _generate_positive_items(user_pos_dict: Dict[int, np.ndarray]):
    """Flatten {user: items} into aligned (users, items) arrays plus the
    per-user positive count map (insertion order preserved)."""
    assert user_pos_dict, "'user_pos_dict' cannot be empty."
    user_n_pos = OrderedDict()
    users_list, items_list = [], []
    for user, items in user_pos_dict.items():
        users_list.append(np.full(len(items), user, dtype=np.int32))
        items_list.append(np.asarray(items, dtype=np.int32))
        user_n_pos[user] = len(items)
    return user_n_pos, np.concatenate(users_list), np.concatenate(items_list)


def _generate_time_order_positive_items(user_pos_dict: Dict[int, np.ndarray],
                                        num_previous: int = 1, num_next: int = 1,
                                        pad: Optional[int] = None):
    """Expand each user's chronological sequence into (prefix, next) training
    instances: for each cut position take the last ``num_previous`` items as
    context and the following ``num_next`` as targets. Without padding, only
    full-length windows are kept; with padding, windows with at least one
    real context item are kept and pre-padded."""
    assert user_pos_dict, "'user_pos_dict' cannot be empty."
    assert num_previous >= 1 and num_next >= 1
    tot_len = num_previous + num_next
    users_list, seqs_list = [], []
    user_n_pos = OrderedDefaultDict(int)
    for user, seq in user_pos_dict.items():
        for idx in range(len(seq), 0, -1):
            cur = seq[:idx]
            if len(cur) >= tot_len or (pad is not None and len(cur) > num_next):
                seqs_list.append(cur[-tot_len:])
                users_list.append(user)
                user_n_pos[user] += 1
            else:
                break
    if pad is not None and tot_len > 2:
        seqs = pad_sequences(seqs_list, value=pad, max_len=tot_len,
                             padding="pre", truncating="pre", dtype=np.int32)
    else:
        seqs = np.asarray(seqs_list, dtype=np.int32)
    prev_items, next_items = np.split(seqs, [num_previous], axis=-1)
    return user_n_pos, np.asarray(users_list, dtype=np.int32), prev_items, next_items


def _sampling_negative_items(user_n_pos: "OrderedDict[int, int]", num_neg: int,
                             num_items: int,
                             user_pos_dict: Dict[int, np.ndarray]) -> np.ndarray:
    """Per-user uniform negatives excluding *all* of that user's positives,
    resampled on every call (i.e. every epoch)."""
    assert num_neg > 0, "'num_neg' must be a positive integer."
    out = []
    for user, n_pos in user_n_pos.items():
        neg = randint_choice(num_items, size=n_pos * num_neg,
                             exclusion=user_pos_dict[user])
        neg = np.atleast_1d(np.asarray(neg, dtype=np.int32))
        if num_neg > 1:
            neg = neg.reshape([n_pos, num_neg])
        out.append(neg)
    return np.concatenate(out)


class InteractionIterator(_Iterator):
    """Yields (users, items) — no negatives (reference :97-122)."""

    def __init__(self, dataset: ImplicitFeedback, batch_size: int = 1024,
                 shuffle: bool = True, drop_last: bool = False):
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        ui_pairs = dataset.to_user_item_pairs()
        self.users = ui_pairs[:, 0]
        self.pos_items = ui_pairs[:, 1]

    def __len__(self):
        return self._num_batches(len(self.users))

    def __iter__(self):
        it = BatchIterator(self.users, self.pos_items, batch_size=self.batch_size,
                           shuffle=self.shuffle, drop_last=self.drop_last)
        for users, items in it:
            yield np.asarray(users), np.asarray(items)


class PointwiseIterator(_Iterator):
    """Yields (users, items, labels) with 1/0 labels (reference :125-188)."""

    def __init__(self, dataset: ImplicitFeedback, num_neg: int = 1,
                 batch_size: int = 1024, shuffle: bool = True,
                 drop_last: bool = False):
        assert num_neg > 0, "'num_neg' must be a positive integer."
        self.num_neg = num_neg
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_items = dataset.num_items
        self.user_pos_dict = dataset.to_user_dict()
        self.user_n_pos, users_ary, self.pos_items = \
            _generate_positive_items(self.user_pos_dict)
        self.all_users = np.tile(users_ary, num_neg + 1)
        n_pos = len(self.pos_items)
        self.all_labels = np.concatenate([
            np.ones(n_pos, dtype=np.float32),
            np.zeros(n_pos * num_neg, dtype=np.float32)])

    def __len__(self):
        return self._num_batches(len(self.all_users))

    def __iter__(self):
        neg = _sampling_negative_items(self.user_n_pos, self.num_neg,
                                       self.num_items, self.user_pos_dict)
        neg = neg.reshape([-1, self.num_neg]).transpose().reshape([-1])
        all_items = np.concatenate([self.pos_items, neg])
        it = BatchIterator(self.all_users, all_items, self.all_labels,
                           batch_size=self.batch_size, shuffle=self.shuffle,
                           drop_last=self.drop_last)
        for users, items, labels in it:
            yield np.asarray(users), np.asarray(items), np.asarray(labels)


class PairwiseIterator(_Iterator):
    """Yields (users, pos_items, neg_items) (reference :191-234)."""

    def __init__(self, dataset: ImplicitFeedback, num_neg: int = 1,
                 batch_size: int = 1024, shuffle: bool = True,
                 drop_last: bool = False):
        if num_neg <= 0:
            raise ValueError("'num_neg' must be a positive integer.")
        self.num_neg = num_neg
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_items = dataset.num_items
        self.user_pos_dict = dataset.to_user_dict()
        self.user_n_pos, self.all_users, self.pos_items = \
            _generate_positive_items(self.user_pos_dict)

    def __len__(self):
        return self._num_batches(len(self.all_users))

    def __iter__(self):
        neg = _sampling_negative_items(self.user_n_pos, self.num_neg,
                                       self.num_items, self.user_pos_dict)
        it = BatchIterator(self.all_users, self.pos_items, neg,
                           batch_size=self.batch_size, shuffle=self.shuffle,
                           drop_last=self.drop_last)
        for users, pos, negb in it:
            yield np.asarray(users), np.asarray(pos), np.asarray(negb)


class SequentialPointwiseIterator(_Iterator):
    """Yields (users, item_seqs, next_items, labels) (reference :237-290)."""

    def __init__(self, dataset: ImplicitFeedback, num_previous: int = 1,
                 num_next: int = 1, num_neg: int = 1, pad: Optional[int] = None,
                 batch_size: int = 1024, shuffle: bool = True,
                 drop_last: bool = False):
        assert num_previous >= 1 and num_next >= 1 and num_neg >= 1
        self.num_previous = num_previous
        self.num_next = num_next
        self.num_neg = num_neg
        self.pad = pad
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_items = dataset.num_items
        self.user_pos_dict = dataset.to_user_dict_by_time()
        self.user_n_pos, users_ary, item_seqs, self.pos_next_items = \
            _generate_time_order_positive_items(self.user_pos_dict,
                                                num_previous, num_next, pad)
        self.all_users = np.tile(users_ary, num_neg + 1)
        self.all_item_seqs = np.tile(item_seqs, [num_neg + 1, 1]).squeeze()
        len_pos = len(self.pos_next_items)
        pos_labels = np.ones([len_pos, num_next], dtype=np.float32)
        neg_labels = np.zeros([len_pos * num_neg, num_next], dtype=np.float32)
        self.all_labels = np.concatenate([pos_labels, neg_labels]).squeeze()

    def __len__(self):
        return self._num_batches(len(self.all_users))

    def __iter__(self):
        neg = _sampling_negative_items(self.user_n_pos,
                                       self.num_neg * self.num_next,
                                       self.num_items, self.user_pos_dict)
        neg = neg.reshape([-1, self.num_neg * self.num_next])
        neg = np.concatenate(np.split(neg, self.num_neg, axis=-1), axis=0)
        all_next = np.concatenate([self.pos_next_items, neg]).squeeze()
        it = BatchIterator(self.all_users, self.all_item_seqs, all_next,
                           self.all_labels, batch_size=self.batch_size,
                           shuffle=self.shuffle, drop_last=self.drop_last)
        for users, seqs, nxt, labels in it:
            yield (np.asarray(users), np.asarray(seqs), np.asarray(nxt),
                   np.asarray(labels))


class SequentialPairwiseIterator(_Iterator):
    """Yields (users, item_seqs, pos_next, neg_next) (reference :293-335)."""

    def __init__(self, dataset: ImplicitFeedback, num_previous: int = 1,
                 num_next: int = 1, pad: Optional[int] = None,
                 batch_size: int = 1024, shuffle: bool = True,
                 drop_last: bool = False):
        assert num_previous >= 1 and num_next >= 1
        self.num_previous = num_previous
        self.num_next = num_next
        self.pad = pad
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_items = dataset.num_items
        self.user_pos_dict = dataset.to_user_dict_by_time()
        self.user_n_pos, self.all_users, item_seqs, pos_next = \
            _generate_time_order_positive_items(self.user_pos_dict,
                                                num_previous, num_next, pad)
        self.all_item_seqs = item_seqs.squeeze()
        self.pos_next_items = pos_next.squeeze()

    def __len__(self):
        return self._num_batches(len(self.all_users))

    def __iter__(self):
        neg = _sampling_negative_items(self.user_n_pos, self.num_next,
                                       self.num_items, self.user_pos_dict)
        if self.num_next > 1:
            neg = neg.reshape([-1, self.num_next])
        neg = neg.squeeze()
        it = BatchIterator(self.all_users, self.all_item_seqs,
                           self.pos_next_items, neg,
                           batch_size=self.batch_size, shuffle=self.shuffle,
                           drop_last=self.drop_last)
        for users, seqs, pos, negb in it:
            yield (np.asarray(users), np.asarray(seqs), np.asarray(pos),
                   np.asarray(negb))


class UserVecIterator(_Iterator):
    """Yields dense user interaction rows (reference :338-356)."""

    def __init__(self, dataset: ImplicitFeedback, batch_size: int = 1024,
                 shuffle: bool = True, drop_last: bool = False):
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.user_csr_matrix = dataset.to_csr_matrix()
        all_users = np.arange(dataset.num_users, dtype=np.int32)
        self.user_iter = BatchIterator(all_users, batch_size=batch_size,
                                       shuffle=shuffle, drop_last=drop_last)

    def __len__(self):
        return len(self.user_iter)

    def __iter__(self):
        for users in self.user_iter:
            yield self.user_csr_matrix[users].toarray()


class ItemVecIterator(_Iterator):
    """Yields dense item interaction rows (reference :359-377)."""

    def __init__(self, dataset: ImplicitFeedback, batch_size: int = 1024,
                 shuffle: bool = True, drop_last: bool = False):
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.item_csr_matrix = dataset.to_csr_matrix().transpose().tocsr()
        all_items = np.arange(dataset.num_items, dtype=np.int32)
        self.item_iter = BatchIterator(all_items, batch_size=batch_size,
                                       shuffle=shuffle, drop_last=drop_last)

    def __len__(self):
        return len(self.item_iter)

    def __iter__(self):
        for items in self.item_iter:
            yield self.item_csr_matrix[items].toarray()


class KGPairwiseIterator(_Iterator):
    """Yields (heads, relations, pos_tails, neg_tails) (reference :417-451)."""

    def __init__(self, dataset: KnowledgeGraph, num_neg: int = 1,
                 batch_size: int = 1024, shuffle: bool = True,
                 drop_last: bool = False):
        if num_neg <= 0:
            raise ValueError("'num_neg' must be a positive integer.")
        self.num_neg = num_neg
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_entities = dataset.num_entities
        self.head_pos_dict = dataset.to_head_dict()

        head_n_pos = OrderedDict()
        heads_list, rel_list, tails_list = [], [], []
        for head, rel_tail in self.head_pos_dict.items():
            tails = rel_tail["tail"]
            heads_list.append(np.full(len(tails), head, dtype=np.int32))
            rel_list.append(rel_tail["relation"])
            tails_list.append(tails)
            head_n_pos[head] = len(tails)
        self.head_n_pos = head_n_pos
        self.all_heads = np.concatenate(heads_list)
        self.relations = np.concatenate(rel_list)
        self.pos_tails = np.concatenate(tails_list)

    def __len__(self):
        return self._num_batches(len(self.all_heads))

    def __iter__(self):
        neg_list = []
        for head, n_pos in self.head_n_pos.items():
            neg = randint_choice(self.num_entities, size=n_pos * self.num_neg,
                                 exclusion=self.head_pos_dict[head]["tail"])
            neg = np.atleast_1d(np.asarray(neg, dtype=np.int32))
            if self.num_neg > 1:
                neg = neg.reshape([n_pos, self.num_neg])
            neg_list.append(neg)
        neg_tails = np.concatenate(neg_list)
        it = BatchIterator(self.all_heads, self.relations, self.pos_tails,
                           neg_tails, batch_size=self.batch_size,
                           shuffle=self.shuffle, drop_last=self.drop_last)
        for heads, rels, pos, neg in it:
            yield (np.asarray(heads), np.asarray(rels), np.asarray(pos),
                   np.asarray(neg))
