"""Dataset layer: CF interactions, knowledge graph, multimodal features.

Capability parity with reference skrec/io/dataset.py (ImplicitFeedback views
:94-196, KnowledgeGraph :199-269, CFData :365-489, KGData :492-541, MMData
:544-575, RSDataset facade :582-695, user activity groups :698-765), with a
fresh design:

* Views are memoized in-memory and optionally persisted to
  ``<data_dir>/_data_cache/<name>_cf.pkl`` with file-mtime invalidation
  (same cache contract as the reference's ``CacheOpt``; saving happens at
  interpreter exit).
* New TPU-specific views: :meth:`ImplicitFeedback.to_padded_positive_table`
  and :meth:`to_padded_seq_tensor` produce static-shape int32 arrays that go
  straight to device HBM — the contract consumed by the on-device negative
  sampler (skrx/ops/sampling.py) and ranking evaluator (skrx/eval).
"""
import atexit
import os
import pickle
import warnings
from collections import OrderedDict, defaultdict
from typing import Callable, Dict, List, Optional, Set, Tuple

import numpy as np
import pandas as pd
import scipy.sparse as sp

from ..utils.generic import pad_sequences

__all__ = ["ImplicitFeedback", "KnowledgeGraph", "CFData", "KGData", "MMData",
           "RSDataset", "UserGroup", "group_users_by_interactions",
           "PaddedPositives", "SocialNetwork", "SocialData"]

_USER, _ITEM, _RATING, _TIME = "user", "item", "rating", "time"
_HEAD, _RELATION, _TAIL = "head", "relation", "tail"

_COLUMN_SETS = {"UI": [_USER, _ITEM],
                "UIR": [_USER, _ITEM, _RATING],
                "UIT": [_USER, _ITEM, _TIME],
                "UIRT": [_USER, _ITEM, _RATING, _TIME]}


def _read_csv(path: str, sep: str, names: List[str],
              on_missing: Callable[[str], pd.DataFrame]) -> pd.DataFrame:
    if not os.path.isfile(path):
        return on_missing(path)
    return pd.read_csv(path, sep=sep, header=None, names=names)


def _memo(method):
    """Memoize a view method on the instance, keyed by (name, args)."""
    name = method.__name__

    def wrapper(self, *args, **kwargs):
        key = (name,) + tuple(args) + tuple(sorted(kwargs.items()))
        cache = self._view_cache
        if key not in cache:
            cache[key] = method(self, *args, **kwargs)
            self._cache_dirty = True
        return cache[key]

    wrapper.__name__ = name
    return wrapper


class PaddedPositives:
    """Device-ready per-user positive sets.

    ``table``: (num_users, max_pos) int32, each row the user's positive items
    sorted ascending, padded with ``pad_id`` (= num_items). ``lengths``:
    (num_users,) int32. Sorted rows allow O(log n) membership via
    searchsorted inside jit (used for exclusion in negative sampling and
    -inf train-item masking in evaluation).
    """

    def __init__(self, table: np.ndarray, lengths: np.ndarray, pad_id: int):
        self.table = table
        self.lengths = lengths
        self.pad_id = pad_id

    @property
    def max_pos(self) -> int:
        return self.table.shape[1]


class ImplicitFeedback:
    """Immutable view container over one split of (user, item[, rating, time])."""

    def __init__(self, data: Optional[pd.DataFrame] = None,
                 num_users: Optional[int] = None, num_items: Optional[int] = None):
        self._view_cache: Dict = {}
        self._cache_dirty = False
        if data is None or data.empty:
            self._data = pd.DataFrame()
            self.num_users = num_users or 0
            self.num_items = num_items or 0
            self.num_ratings = 0
        else:
            self._data = data
            self.num_users = num_users if num_users is not None else int(data[_USER].max()) + 1
            self.num_items = num_items if num_items is not None else int(data[_ITEM].max()) + 1
            self.num_ratings = len(data)

    def is_empty(self) -> bool:
        return self._data is None or self._data.empty

    def __len__(self):
        return len(self._data)

    # ---- classic views (parity with reference dataset.py:114-196) ----

    @_memo
    def to_user_item_pairs(self) -> np.ndarray:
        return self._data[[_USER, _ITEM]].to_numpy(copy=True, dtype=np.int32)

    @_memo
    def to_set_of_users(self) -> Set[int]:
        return set(self._data[_USER].unique())

    @_memo
    def to_user_item_pairs_by_time(self) -> np.ndarray:
        if _TIME not in self._data:
            raise ValueError("This dataset does not contain timestamps.")
        sorted_df = self._data.sort_values(by=[_USER, _TIME], kind="stable")
        return sorted_df[[_USER, _ITEM]].to_numpy(copy=True, dtype=np.int32)

    @_memo
    def to_csr_matrix(self) -> sp.csr_matrix:
        users = self._data[_USER].to_numpy()
        items = self._data[_ITEM].to_numpy()
        ones = np.ones(len(users), dtype=np.float32)
        return sp.csr_matrix((ones, (users, items)),
                             shape=(self.num_users, self.num_items))

    def to_csc_matrix(self) -> sp.csc_matrix:
        return self.to_csr_matrix().tocsc()

    def to_dok_matrix(self) -> sp.dok_matrix:
        return self.to_csr_matrix().todok()

    def to_coo_matrix(self) -> sp.coo_matrix:
        return self.to_csr_matrix().tocoo()

    @_memo
    def to_user_dict(self) -> "OrderedDict[int, np.ndarray]":
        out: "OrderedDict[int, np.ndarray]" = OrderedDict()
        for user, group in self._data.groupby(_USER, sort=True):
            out[int(user)] = group[_ITEM].to_numpy(dtype=np.int32)
        return out

    @_memo
    def to_user_dict_by_time(self) -> "OrderedDict[int, np.ndarray]":
        if _TIME not in self._data:
            raise ValueError("This dataset does not contain timestamps.")
        out: "OrderedDict[int, np.ndarray]" = OrderedDict()
        for user, group in self._data.groupby(_USER, sort=True):
            out[int(user)] = group.sort_values(by=[_TIME], kind="stable")[_ITEM] \
                .to_numpy(dtype=np.int32)
        return out

    @_memo
    def to_item_dict(self) -> "OrderedDict[int, np.ndarray]":
        out: "OrderedDict[int, np.ndarray]" = OrderedDict()
        for item, group in self._data.groupby(_ITEM, sort=True):
            out[int(item)] = group[_USER].to_numpy(dtype=np.int32)
        return out

    def to_truncated_seq_dict(self, max_len: Optional[int], pad_value: int = 0,
                              padding: str = "pre", truncating: str = "pre"
                              ) -> "OrderedDict[int, np.ndarray]":
        seq_dict = self.to_user_dict_by_time()
        if max_len is None:
            max_len = max((len(s) for s in seq_dict.values()), default=0)
        seqs = [s[-max_len:] for s in seq_dict.values()]
        padded = pad_sequences(seqs, value=pad_value, max_len=max_len,
                               padding=padding, truncating=truncating,
                               dtype=np.int32)
        return OrderedDict(zip(seq_dict.keys(), padded))

    # ---- TPU-specific device-ready views (no reference counterpart) ----

    @_memo
    def to_padded_positive_table(self, bucket: int = 32,
                                 max_pos_cap: Optional[int] = None
                                 ) -> PaddedPositives:
        """Build (num_users, max_pos) sorted positive-item table.

        max_pos is rounded up to a multiple of ``bucket`` to limit
        recompilation across datasets with similar profiles. At production
        scale a handful of ultra-heavy users can blow the table up
        (U x max_interactions); ``max_pos_cap`` truncates their exclusion
        sets (a random subsample) — negatives may then rarely collide with
        one of their positives, which is far below metric noise.
        """
        user_dict = self.to_user_dict()
        lengths = np.zeros(self.num_users, dtype=np.int32)
        max_pos = 1
        for u, items in user_dict.items():
            lengths[u] = min(len(items),
                             max_pos_cap or len(items) or 1)
            max_pos = max(max_pos, lengths[u])
        max_pos = ((max_pos + bucket - 1) // bucket) * bucket
        table = np.full((self.num_users, max_pos), self.num_items, dtype=np.int32)
        rng = np.random.default_rng(0)
        for u, items in user_dict.items():
            if max_pos_cap is not None and len(items) > max_pos_cap:
                items = rng.choice(items, max_pos_cap, replace=False)
            table[u, : len(items)] = np.sort(items)
        return PaddedPositives(table, lengths, pad_id=self.num_items)

    @_memo
    def to_padded_seq_tensor(self, max_len: int, pad_value: Optional[int] = None
                             ) -> Tuple[np.ndarray, np.ndarray]:
        """(num_users, max_len) pre-padded chronological item sequences plus
        (num_users,) true lengths — the static-shape input for sequential
        models. ``pad_value`` defaults to num_items (reference convention:
        pad index = num_items, SASRec.py:328-332)."""
        if pad_value is None:
            pad_value = self.num_items
        seq_dict = self.to_user_dict_by_time()
        table = np.full((self.num_users, max_len), pad_value, dtype=np.int32)
        lengths = np.zeros(self.num_users, dtype=np.int32)
        for u, seq in seq_dict.items():
            tail = seq[-max_len:]
            table[u, max_len - len(tail):] = tail
            lengths[u] = min(len(seq), max_len)
        return table, lengths


class KnowledgeGraph:
    """Triplet views over (head, relation, tail)
    (parity: reference dataset.py:199-269)."""

    def __init__(self, data: Optional[pd.DataFrame] = None,
                 num_entities: Optional[int] = None,
                 num_relations: Optional[int] = None):
        self._view_cache: Dict = {}
        self._cache_dirty = False
        if data is None or data.empty:
            self._data = pd.DataFrame()
            self.num_entities = num_entities or 0
            self.num_relations = num_relations or 0
            self.num_triplets = 0
        else:
            self._data = data
            max_entity = int(max(data[_HEAD].max(), data[_TAIL].max()))
            self.num_entities = num_entities if num_entities is not None else max_entity + 1
            self.num_relations = num_relations if num_relations is not None else int(data[_RELATION].max()) + 1
            self.num_triplets = len(data)

    def is_empty(self) -> bool:
        return self._data is None or self._data.empty

    def __len__(self):
        return len(self._data)

    @_memo
    def to_triplets(self) -> np.ndarray:
        return self._data[[_HEAD, _RELATION, _TAIL]].to_numpy(copy=True, dtype=np.int32)

    def _grouped_dict(self, by: str, c1: str, c2: str) -> "OrderedDict[int, Dict[str, np.ndarray]]":
        out: "OrderedDict[int, Dict[str, np.ndarray]]" = OrderedDict()
        for key, group in self._data.groupby(by, sort=True):
            out[int(key)] = {c1: group[c1].to_numpy(dtype=np.int32),
                             c2: group[c2].to_numpy(dtype=np.int32)}
        return out

    @_memo
    def to_head_dict(self):
        return self._grouped_dict(_HEAD, _RELATION, _TAIL)

    @_memo
    def to_tail_dict(self):
        return self._grouped_dict(_TAIL, _RELATION, _HEAD)

    @_memo
    def to_relation_dict(self):
        return self._grouped_dict(_RELATION, _HEAD, _TAIL)

    @_memo
    def to_csr_matrix_dict(self) -> Dict[int, sp.csr_matrix]:
        out = {}
        n = self.num_entities
        for rel, group in self._data.groupby(_RELATION, sort=True):
            heads = group[_HEAD].to_numpy()
            tails = group[_TAIL].to_numpy()
            ones = np.ones(len(heads), dtype=np.float32)
            out[int(rel)] = sp.csr_matrix((ones, (heads, tails)), shape=(n, n))
        return out

    def to_coo_matrix_dict(self) -> Dict[int, sp.coo_matrix]:
        return {rel: mat.tocoo() for rel, mat in self.to_csr_matrix_dict().items()}


class _PersistentCache:
    """Pickle the per-split view caches to ``_data_cache/``, invalidated by
    source-file mtimes (same contract as reference CacheOpt,
    dataset.py:300-362)."""

    def __init__(self, cache_file: str, source_files: List[str]):
        self.cache_file = cache_file
        self.source_files = [f for f in source_files if os.path.exists(f)]

    def _stale(self) -> bool:
        if not os.path.exists(self.cache_file):
            return True
        cached_time = os.path.getmtime(self.cache_file)
        return any(os.path.getmtime(f) > cached_time for f in self.source_files)

    def load_into(self, holders: Dict[str, object]) -> None:
        if self._stale():
            return
        try:
            with open(self.cache_file, "rb") as f:
                blobs = pickle.load(f)
            for name, holder in holders.items():
                if name in blobs:
                    holder._view_cache.update(blobs[name])
        except Exception as err:  # corrupt cache is not fatal
            warnings.warn(f"failed to restore data cache: {err}")

    def save_from(self, holders: Dict[str, object]) -> None:
        if not any(h._cache_dirty for h in holders.values()):
            return
        try:
            os.makedirs(os.path.dirname(self.cache_file), exist_ok=True)
            blobs = {name: holder._view_cache for name, holder in holders.items()}
            tmp = self.cache_file + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump(blobs, f, protocol=pickle.HIGHEST_PROTOCOL)
            os.replace(tmp, self.cache_file)
        except Exception as err:
            warnings.warn(f"failed to persist data cache: {err}")


_ATEXIT_CACHES: Dict[str, tuple] = {}
_ATEXIT_REGISTERED: set = set()


class CFData:
    """Load ``<prefix>.{train,valid,test}`` + id maps
    (parity: reference dataset.py:365-489)."""

    def __init__(self, data_dir: str, sep: str, columns: str,
                 use_cache: bool = True):
        if columns not in _COLUMN_SETS:
            raise ValueError(f"'columns' must be one of {list(_COLUMN_SETS)}")
        names = _COLUMN_SETS[columns]
        self.data_dir = data_dir
        self.data_name = os.path.basename(os.path.normpath(data_dir))
        prefix = os.path.join(data_dir, self.data_name)

        def missing_ok(_path):
            return pd.DataFrame()

        def missing_fatal(path):
            raise FileNotFoundError(path)

        train = _read_csv(prefix + ".train", sep, names, missing_fatal)
        valid = _read_csv(prefix + ".valid", sep, names, missing_ok)
        test = _read_csv(prefix + ".test", sep, names, missing_fatal)
        for split_name, df in [("train", train), ("valid", valid), ("test", test)]:
            if not df.empty and df.isnull().values.any():
                warnings.warn(f"{split_name} data has null values; check the "
                              f"file or the separator.")

        self.user2id, self.id2user = self._read_map_file(prefix + ".user2id", sep)
        self.item2id, self.id2item = self._read_map_file(prefix + ".item2id", sep)

        # num_users/items from max id over all splits (reference quirk kept,
        # dataset.py:416-419 / SURVEY §7.4).
        infos = [(int(df[_USER].max()), int(df[_ITEM].max()), len(df))
                 for df in (train, valid, test) if not df.empty]
        self.num_users = max(i[0] for i in infos) + 1
        self.num_items = max(i[1] for i in infos) + 1
        self.num_ratings = sum(i[2] for i in infos)

        self.train_data = ImplicitFeedback(train, self.num_users, self.num_items)
        self.valid_data = ImplicitFeedback(valid, self.num_users, self.num_items)
        self.test_data = ImplicitFeedback(test, self.num_users, self.num_items)

        if use_cache:
            cache_file = os.path.join(data_dir, "_data_cache",
                                      self.data_name + "_cf.pkl")
            sources = [prefix + s for s in (".train", ".valid", ".test")]
            self._cache = _PersistentCache(cache_file, sources)
            holders = {"train": self.train_data, "valid": self.valid_data,
                       "test": self.test_data}
            self._cache.load_into(holders)
            # ONE atexit hook per cache file, pinning only the newest
            # dataset copy — per-instance registration would pin every
            # trial's DataFrames for process lifetime during a search
            _ATEXIT_CACHES[cache_file] = (self._cache, holders)
            if cache_file not in _ATEXIT_REGISTERED:
                _ATEXIT_REGISTERED.add(cache_file)
                atexit.register(
                    lambda cf=cache_file: _ATEXIT_CACHES[cf][0].save_from(
                        _ATEXIT_CACHES[cf][1]))

    @staticmethod
    def _read_map_file(path: str, sep: str):
        if not os.path.isfile(path):
            return None, None
        df = pd.read_csv(path, sep=sep, header=None)
        fwd = OrderedDict(zip(df[0], df[1]))
        bwd = OrderedDict(zip(df[1], df[0]))
        return fwd, bwd

    @property
    def statistic_info(self) -> str:
        if 0 in (self.num_users, self.num_items, self.num_ratings):
            return ""
        sparsity = 1.0 - self.num_ratings / (self.num_users * self.num_items)
        lines = ["Dataset statistic information:",
                 f"Name: {self.data_name}",
                 f"Path: {os.path.abspath(self.data_dir)}",
                 f"The number of users: {self.num_users}",
                 f"The number of items: {self.num_items}",
                 f"The number of ratings: {self.num_ratings}",
                 f"Average actions of users: {self.num_ratings / self.num_users:.2f}",
                 f"Average actions of items: {self.num_ratings / self.num_items:.2f}",
                 f"The sparsity of the dataset: {sparsity * 100:.6f}%",
                 "",
                 f"The number of training: {len(self.train_data)}",
                 f"The number of validation: {len(self.valid_data)}",
                 f"The number of testing: {len(self.test_data)}"]
        return "\n".join(lines)


class KGData:
    """Load ``<prefix>.kg`` triplets (parity: reference dataset.py:492-541)."""

    def __init__(self, data_dir: str, sep: str):
        data_name = os.path.basename(os.path.normpath(data_dir))
        path = os.path.join(data_dir, data_name + ".kg")
        if not os.path.isfile(path):
            raise FileNotFoundError(path)
        df = pd.read_csv(path, sep=sep, header=None,
                         names=[_HEAD, _RELATION, _TAIL]).drop_duplicates()
        if df.isnull().values.any():
            warnings.warn("knowledge graph data has null values; check the "
                          "file or the separator.")
        self.kg_data = KnowledgeGraph(df)

    @property
    def statistic_info(self) -> str:
        kg = self.kg_data
        return "\n".join(["",
                          f"The number of entities: {kg.num_entities}",
                          f"The number of relations: {kg.num_relations}",
                          f"The number of triplets: {kg.num_triplets}"])


class MMData:
    """Load ``<prefix>.{img,txt,audio}.npz`` feature matrices
    (parity: reference dataset.py:544-575)."""

    def __init__(self, data_dir: str):
        data_name = os.path.basename(os.path.normpath(data_dir))
        prefix = os.path.join(data_dir, data_name)
        self.img_features, self.img_dim = self._load_npz(prefix + ".img.npz")
        self.txt_features, self.txt_dim = self._load_npz(prefix + ".txt.npz")
        self.audio_features, self.audio_dim = self._load_npz(prefix + ".audio.npz")

    @staticmethod
    def _load_npz(path: str):
        if not os.path.exists(path):
            return None, None
        obj = np.load(path, allow_pickle=True)
        features = obj[obj.files[0]]
        return features, features.shape[-1]

    @property
    def statistic_info(self) -> str:
        lines = [""]
        for name, feats in [("image", self.img_features),
                            ("txt", self.txt_features),
                            ("audio", self.audio_features)]:
            if feats is not None:
                lines.append(f"The shape of {name} features: {feats.shape}")
        return "\n".join(lines)


class SocialNetwork:
    """Placeholder for social-graph views — an empty TODO stub in the
    reference as well (dataset.py:272-274)."""
    pass


class SocialData:
    """Placeholder loader for social data (reference dataset.py:578-579)."""
    pass


class RSDataset:
    """Facade lazily exposing CF / KG / MM data
    (parity: reference dataset.py:582-695)."""

    def __init__(self, data_dir: str, sep: str, columns: str):
        self.data_dir = data_dir
        self.sep = sep
        self.columns = columns
        self.data_name = os.path.basename(os.path.normpath(data_dir))
        self._log_print = print

    def set_logger(self, logger):
        self._log_print = logger.info

    @property
    def cf_data(self) -> CFData:
        if not hasattr(self, "_cf_data"):
            self._cf_data = CFData(self.data_dir, self.sep, self.columns)
            self._log_print(self._cf_data.statistic_info)
        return self._cf_data

    train_data = property(lambda self: self.cf_data.train_data)
    valid_data = property(lambda self: self.cf_data.valid_data)
    test_data = property(lambda self: self.cf_data.test_data)
    num_users = property(lambda self: self.cf_data.num_users)
    num_items = property(lambda self: self.cf_data.num_items)
    num_ratings = property(lambda self: self.cf_data.num_ratings)

    @property
    def kg_data(self) -> KnowledgeGraph:
        if not hasattr(self, "_kg_data"):
            self._kg_data = KGData(self.data_dir, self.sep)
            self._log_print(self._kg_data.statistic_info)
        return self._kg_data.kg_data

    num_entities = property(lambda self: self.kg_data.num_entities)
    num_relations = property(lambda self: self.kg_data.num_relations)
    num_triplets = property(lambda self: self.kg_data.num_triplets)

    @property
    def mm_data(self) -> MMData:
        if not hasattr(self, "_mm_data"):
            self._mm_data = MMData(self.data_dir)
            self._log_print(self._mm_data.statistic_info)
        return self._mm_data

    img_features = property(lambda self: self.mm_data.img_features)
    img_dim = property(lambda self: self.mm_data.img_dim)
    txt_features = property(lambda self: self.mm_data.txt_features)
    txt_dim = property(lambda self: self.mm_data.txt_dim)
    audio_features = property(lambda self: self.mm_data.audio_features)
    audio_dim = property(lambda self: self.mm_data.audio_dim)

    @property
    def social_data(self):
        raise NotImplementedError  # TODO stub, as in the reference

    @property
    def statistic_info(self) -> str:
        parts = []
        for attr in ("_cf_data", "_kg_data", "_mm_data"):
            if hasattr(self, attr):
                parts.append(getattr(self, attr).statistic_info)
        return "\n\n".join(parts)


class UserGroup:
    def __init__(self, users: np.ndarray, num_interactions: int,
                 activities: np.ndarray, label: str):
        self.label = label
        self.users = users
        self.num_users = len(users)
        self.num_interactions = num_interactions
        self.activities = activities


def group_users_by_interactions(dataset: RSDataset, num_groups: int = 4) -> List[UserGroup]:
    """Split users into ``num_groups`` buckets of ~equal total interactions,
    ordered by user activity (parity: reference dataset.py:707-765)."""
    users_by_activity = defaultdict(list)
    for user, items in dataset.train_data.to_user_dict().items():
        users_by_activity[len(items)].append(user)

    activities = np.array(sorted(users_by_activity.keys()))
    if len(activities) == 0:
        return []
    n_users = np.array([len(users_by_activity[a]) for a in activities])
    interactions = activities * n_users

    # Greedy balanced split: repeatedly cut at ~1/remaining of the leftover mass.
    split_points: List[int] = []
    start = 0
    for g in range(num_groups - 1):
        rest = interactions[start:]
        if len(rest) <= 1:
            break
        target = rest.sum() / (num_groups - g)
        cum = np.cumsum(rest)
        idx = max(int(np.searchsorted(cum, target)), 1)
        if idx < len(cum) and target - cum[idx - 1] >= cum[idx] - target:
            idx += 1
        split_points.append(start + idx)
        start += idx

    boundaries = activities[split_points] if split_points else np.array([], dtype=activities.dtype)
    labels = []
    if len(boundaries):
        labels.append(f"< {boundaries[0]}")
        for lo, hi in zip(boundaries[:-1], boundaries[1:]):
            labels.append(f"[{lo}, {hi})")
        labels.append(f">= {boundaries[-1]}")
    else:
        labels.append("all")

    groups = []
    chunks = np.split(np.arange(len(activities)), split_points)
    for label, chunk in zip(labels, chunks):
        users: List[int] = []
        for a in activities[chunk]:
            users.extend(users_by_activity[a])
        groups.append(UserGroup(np.array(users), int(interactions[chunk].sum()),
                                activities[chunk], label))
    return groups
