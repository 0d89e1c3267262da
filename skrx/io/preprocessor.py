"""Offline dataset preprocessing: load → filter → remap → split → save.

Capability parity with reference skrec/io/preprocessor.py:15-334 (same
output directory/file naming contract:
``<name>_<split_manner>_u<user_min>_i<item_min>/<...>.{all,train,valid,test,
user2id,item2id}`` + ``.info``), re-designed: the per-user ratio /
leave-out splits are fully vectorized with groupby-cumcount arithmetic
instead of a Python loop over users — orders of magnitude faster on large
logs, which matters because this feeds multi-host TPU jobs with big datasets.
"""
import math
import os
from collections import OrderedDict
from typing import Optional

import numpy as np
import pandas as pd

from ..utils.logger import Logger

__all__ = ["Preprocessor"]

_USER, _ITEM, _RATING, _TIME = "user", "item", "rating", "time"

_COLUMN_DICT = {"UI": [_USER, _ITEM],
                "UIR": [_USER, _ITEM, _RATING],
                "UIT": [_USER, _ITEM, _TIME],
                "UIRT": [_USER, _ITEM, _RATING, _TIME]}


class Preprocessor:
    def __init__(self):
        self._config: "OrderedDict[str, str]" = OrderedDict()
        self._column_name = None
        self.all_data: Optional[pd.DataFrame] = None
        self.train_data: Optional[pd.DataFrame] = None
        self.valid_data: Optional[pd.DataFrame] = None
        self.test_data: Optional[pd.DataFrame] = None
        self.user2id: Optional[pd.Series] = None
        self.item2id: Optional[pd.Series] = None
        self._dir_path: Optional[str] = None
        self._data_name = ""
        self._split_manner = ""
        self._user_min = 0
        self._item_min = 0

    # ---- load ----

    def load_data(self, filename: str, sep: str = ",", columns: str = None):
        if not os.path.isfile(filename):
            raise FileNotFoundError(f"There is no file named '{filename}'.")
        if columns not in _COLUMN_DICT:
            raise ValueError(f"'columns' must be one of {list(_COLUMN_DICT)}.")
        self._column_name = _COLUMN_DICT[columns]
        self._config["columns"] = columns
        self._config["filename"] = filename
        self._config["sep"] = sep
        self.all_data = pd.read_csv(filename, sep=sep, header=None,
                                    names=self._column_name)
        self.all_data.dropna(inplace=True)
        self._data_name = os.path.basename(filename).split(".")[0]
        self._dir_path = os.path.dirname(filename)

    def load_dataframe(self, df: pd.DataFrame, columns: str, name: str = "data",
                       dir_path: str = "."):
        """Start from an in-memory DataFrame (used by tests and synthetic
        dataset generation — no reference counterpart)."""
        if columns not in _COLUMN_DICT:
            raise ValueError(f"'columns' must be one of {list(_COLUMN_DICT)}.")
        self._column_name = _COLUMN_DICT[columns]
        self._config["columns"] = columns
        self.all_data = df.copy()
        self.all_data.columns = self._column_name
        self._data_name = name
        self._dir_path = dir_path

    # ---- clean ----

    def drop_duplicates(self, keep: str = "last"):
        if keep not in ("first", "last"):
            raise ValueError(f"'keep' must be 'first' or 'last', got {keep!r}")
        sort_key = [_USER, _TIME] if _TIME in self._column_name else [_USER, _ITEM]
        self.all_data.sort_values(by=sort_key, inplace=True, kind="stable")
        self.all_data.drop_duplicates(subset=[_USER, _ITEM], keep=keep, inplace=True)

    def filter_data(self, user_min: int = 0, item_min: int = 0):
        """Iteratively drop cold users/items until a fixpoint
        (reference: preprocessor.py:100-117)."""
        while True:
            before = len(self.all_data)
            self.filter_item(item_min)
            self.filter_user(user_min)
            if len(self.all_data) == before:
                break

    def filter_user(self, user_min: int = 0):
        self._config["user_min"] = str(user_min)
        self._user_min = user_min
        if user_min > 0:
            counts = self.all_data.groupby(_USER)[_USER].transform("size")
            self.all_data = self.all_data[counts >= user_min]

    def filter_item(self, item_min: int = 0):
        self._config["item_min"] = str(item_min)
        self._item_min = item_min
        if item_min > 0:
            counts = self.all_data.groupby(_ITEM)[_ITEM].transform("size")
            self.all_data = self.all_data[counts >= item_min]

    # ---- remap ----

    def remap_data_id(self):
        self.remap_user_id()
        self.remap_item_id()

    def remap_user_id(self):
        self._config["remap_user_id"] = "True"
        unique_user = self.all_data[_USER].unique()
        self.user2id = pd.Series(data=range(len(unique_user)), index=unique_user)
        self.all_data[_USER] = self.all_data[_USER].map(self.user2id)

    def remap_item_id(self):
        self._config["remap_item_id"] = "True"
        unique_item = self.all_data[_ITEM].unique()
        self.item2id = pd.Series(data=range(len(unique_item)), index=unique_item)
        self.all_data[_ITEM] = self.all_data[_ITEM].map(self.item2id)

    # ---- split (vectorized) ----

    def _sorted_with_rank(self, by_time: bool):
        """Sort per user (time / id / random) and return (df, rank, size)."""
        df = self.all_data
        if by_time and _TIME in self._column_name:
            df = df.sort_values(by=[_USER, _TIME], kind="stable")
        elif by_time:
            df = df.sort_values(by=[_USER, _ITEM], kind="stable")
        else:
            shuffle_key = np.random.permutation(len(df))
            df = df.assign(_shuffle=shuffle_key) \
                   .sort_values(by=[_USER, "_shuffle"], kind="stable") \
                   .drop(columns=["_shuffle"])
        rank = df.groupby(_USER).cumcount().to_numpy()
        size = df.groupby(_USER)[_USER].transform("size").to_numpy()
        return df, rank, size

    def split_data_by_ratio(self, train: float = 0.7, valid: float = 0.1,
                            test: float = 0.2, by_time: bool = True):
        if train <= 0.0:
            raise ValueError("'train' must be a positive value.")
        if not math.isclose(train + valid + test, 1.0, abs_tol=1e-9):
            raise ValueError("The sum of 'train', 'valid' and 'test' must be 1.0.")
        self._config.update(split_by="ratio", train=str(train),
                            valid=str(valid), test=str(test), by_time=str(by_time))
        self._split_manner = "ratio_" + ("by_time" if by_time else "by_random")

        df, rank, size = self._sorted_with_rank(by_time)
        train_end = np.ceil(train * size)
        valid_end = train_end + np.ceil(valid * size)
        self.train_data = df[rank < train_end].reset_index(drop=True)
        if valid != 0:
            self.valid_data = df[(rank >= train_end) & (rank < valid_end)] \
                .reset_index(drop=True)
        else:
            self.valid_data = None  # a re-split must not keep a stale set
        self.test_data = df[rank >= valid_end].reset_index(drop=True)

    def split_data_by_leave_out(self, valid: int = 1, test: int = 1,
                                by_time: bool = True):
        self._config.update(split_by="leave_out", valid=str(valid),
                            test=str(test), by_time=str(by_time))
        self._split_manner = "leave_" + ("by_time" if by_time else "by_random")

        df, rank, size = self._sorted_with_rank(by_time)
        train_end = size - (valid + test)
        valid_end = train_end + valid
        self.train_data = df[rank < train_end].reset_index(drop=True)
        if valid != 0:
            self.valid_data = df[(rank >= train_end) & (rank < valid_end)] \
                .reset_index(drop=True)
        else:
            self.valid_data = None  # a re-split must not keep a stale set
        self.test_data = df[rank >= valid_end].reset_index(drop=True)

    # ---- save ----

    def save_data(self, save_dir: Optional[str] = None) -> str:
        dir_path = save_dir if save_dir is not None else self._dir_path
        name = f"{self._data_name}_{self._split_manner}_u{self._user_min}_i{self._item_min}"
        dir_path = os.path.join(dir_path, name)
        os.makedirs(dir_path, exist_ok=True)
        prefix = os.path.join(dir_path, name)
        sep = "\t"

        for suffix, df in [(".all", self.all_data), (".train", self.train_data),
                           (".valid", self.valid_data), (".test", self.test_data)]:
            if df is not None:
                df.to_csv(prefix + suffix, header=False, index=False, sep=sep)
        if self.user2id is not None:
            self.user2id.to_csv(prefix + ".user2id", header=False, index=True, sep=sep)
        if self.item2id is not None:
            self.item2id.to_csv(prefix + ".item2id", header=False, index=True, sep=sep)

        user_num = self.all_data[_USER].nunique()
        item_num = self.all_data[_ITEM].nunique()
        rating_num = len(self.all_data)
        sparsity = 1.0 - rating_num / (user_num * item_num)

        logger = Logger(prefix + ".info")
        logger.info("\n" + "\n".join(f"{k} = {v}" for k, v in self._config.items()))
        logger.info("Dataset statistic information:")
        logger.info(f"The number of users: {user_num}")
        logger.info(f"The number of items: {item_num}")
        logger.info(f"The number of ratings: {rating_num}")
        logger.info(f"Average actions of users: {rating_num / user_num:.2f}")
        logger.info(f"Average actions of items: {rating_num / item_num:.2f}")
        logger.info(f"The sparsity of the dataset: {sparsity * 100:.6f}%")
        return dir_path
